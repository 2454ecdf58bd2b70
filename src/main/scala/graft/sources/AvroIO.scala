package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file read/write on the Hadoop avro-mapred input/output
  * formats bundled with Spark's distribution — no spark-avro connector
  * required (ref: shared/spark.py:12-23 bundles spark-avro for the same
  * surface; the container format itself is the public Avro spec).
  *
  * Scale shape: reads are a plain `newAPIHadoopFile` — one task per HDFS
  * split, records converted to Rows inside the scan stage (object reuse
  * safe: each record is converted before `next()`); writes go through
  * `saveAsNewAPIHadoopFile`, so task-commit/abort semantics match every
  * other Hadoop sink. The writer schema is read ONCE on the driver from
  * the first file footer — no data scan to infer types.
  *
  * Type coverage is the engine's table surface: boolean/int/long/float/
  * double/string/binary, date (int+date), timestamp (long+timestamp-micros),
  * each optionally nullable via the [null, T] union. Anything else fails
  * loudly rather than writing a lossy encoding.
  */
object AvroIO {

  // ---- schema mapping ----

  private[sources] def toAvroSchema(schema: StructType, recordName: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other =>
          throw new IllegalArgumentException(
            s"avro write: unsupported Spark type $other for field ${f.name}")
      }
      val t = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, t, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.toList.asJava)
  }

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
        throw new IllegalArgumentException("avro read: union with only null branch"))
    else s

  private[sources] def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"avro read: top level must be a record, got $schema")
    StructType(schema.getFields.asScala.map { f =>
      val nullable = f.schema().getType == Schema.Type.UNION &&
        f.schema().getTypes.asScala.exists(_.getType == Schema.Type.NULL)
      val b = nonNullBranch(f.schema())
      val dt = (b.getType, Option(b.getLogicalType).map(_.getName).orNull) match {
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.INT, "date") => DateType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.LONG, "timestamp-micros") => TimestampType
        case (Schema.Type.LONG, "timestamp-millis") => TimestampType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.STRING, _) => StringType
        case (Schema.Type.ENUM, _) => StringType
        case (Schema.Type.BYTES, _) => BinaryType
        case (t, _) =>
          throw new IllegalArgumentException(
            s"avro read: unsupported avro type $t for field ${f.name}")
      }
      StructField(f.name, dt, nullable)
    }.toArray)
  }

  // ---- value conversion (inside the scan/write stages) ----

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (t: java.sql.Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case (t: java.time.Instant, TimestampType) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (x, _) => x
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (days: Int, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (micros: Long, TimestampType) =>
      // value must already be in MICROS: GenericDatumReader does no
      // logical-type conversion, so timestamp-millis fields are scaled
      // x1000 by the caller (read() below) before reaching here
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000))
    case (s: CharSequence, StringType) => s.toString
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (x, _) => x
  }

  // ---- public surface ----

  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    val avroSchema = toAvroSchema(df.schema, "graft_row")
    val schemaJson = avroSchema.toString
    val sparkSchema = df.schema
    val hconf = spark.sessionState.newHadoopConf()
    val target = new Path(path)
    val fs = target.getFileSystem(hconf)
    if (fs.exists(target)) {
      mode match {
        case "overwrite" => fs.delete(target, true)
        case "error" | "errorifexists" =>
          throw new IllegalStateException(s"avro write: $path already exists")
        case m => throw new IllegalArgumentException(s"avro write: unsupported mode $m")
      }
    }
    val job = Job.getInstance(hconf)
    AvroJob.setOutputKeySchema(job, avroSchema)
    job.getConfiguration.set("mapreduce.output.fileoutputformat.compress", "false")
    df.rdd.mapPartitions { rows =>
      // Schema is not serializable pre-avro-1.9-style; re-parse per task
      val schema = new Schema.Parser().parse(schemaJson)
      val fields = sparkSchema.fields
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fields.length) {
          rec.put(i, toAvroValue(row.get(i), fields(i).dataType))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val first = {
      val stat = if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
          .sortBy(_.getPath.getName).headOption
          .getOrElse(throw new IllegalArgumentException(s"avro read: no .avro files under $path"))
      else fs.getFileStatus(p)
      stat.getPath
    }
    // writer schema from ONE footer on the driver — no executor work
    val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
      new FsInput(first, hconf), new GenericDatumReader[GenericRecord]())
    val avroSchema = try reader.getSchema finally reader.close()
    val struct = toStructType(avroSchema)
    val fields = struct.fields
    // Foreign files may carry timestamp-millis; the datum reader hands
    // back the raw long unconverted, so scale to micros ourselves (our
    // own writer always emits timestamp-micros, multiplier 1).
    val millisField: Array[Boolean] = struct.fields.map { f =>
      val b = nonNullBranch(avroSchema.getField(f.name).schema())
      b.getType == Schema.Type.LONG &&
        Option(b.getLogicalType).exists(_.getName == "timestamp-millis")
    }
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      hconf
    ).mapPartitions(_.map { case (k, _) =>
      // convert BEFORE the reader reuses the record object
      val rec = k.datum()
      val vals = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        val raw = rec.get(fields(i).name) match {
          case l: java.lang.Long if millisField(i) => java.lang.Long.valueOf(l * 1000L)
          case x => x
        }
        vals(i) = fromAvroValue(raw, fields(i).dataType)
        i += 1
      }
      Row.fromSeq(vals.toIndexedSeq)
    })
    spark.createDataFrame(rdd, struct)
  }
}
