package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads plus a typed metadata struct.
  *
  * The Spark-side plumbing — schema, partition-wise batch iteration,
  * output shapes — is real and tested. The actual media decoding is
  * STUBBED with a deterministic fake (this container has no image/audio
  * codecs): `fakeDecode` derives pseudo-features from the payload bytes.
  * Swap `decodeBatch` for a JNI/FFI codec (or Arrow hand-off to a Python
  * worker) in production; everything around it stays unchanged.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a binary column with inferred metadata into the canonical
    * (payload, meta) pair.
    */
  def asMediaColumn(df: DataFrame, binaryCol: String, mime: String): DataFrame =
    df.withColumn("meta", struct(
      lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")))

  /** STUB — deterministic fake "decode": feature vector derived from
    * payload bytes (length, byte histogram moments). Replace with a real
    * codec; the signature (bytes → fixed-dim float features) is the
    * production contract.
    */
  def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    val n = math.max(1, payload.length / dim)
    (0 until dim).foreach(j => out(j) /= n.toFloat)
    out
  }

  /** Partition-wise batched feature extraction — the mapInPandas analog:
    * one iterator pass per partition, no per-row task overhead, output
    * schema declared up front. At 100 TB this is a map-only stage whose
    * parallelism is the input partitioning.
    */
  def extractFeatures(
      df: DataFrame,
      keyCol: String,
      binaryCol: String,
      dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(keyCol, df.schema(keyCol).dataType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType))))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row(r.get(keyIdx),
          if (payload == null) 0L else payload.length.toLong,
          fakeDecode(payload, dim))
      }
    }(enc)
  }

  /** STUB resize: passthrough that rewrites metadata dims — the real
    * implementation decodes, resamples, re-encodes inside the same
    * partition-wise pass.
    */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      lit(width).as("width"),
      lit(height).as("height"),
      col("meta.duration_ms").as("duration_ms")))

  /** STUB frame sampling for video payloads: deterministic byte-slice
    * "frames" (every k-th chunk), exploded to one row per frame — the
    * real implementation demuxes keyframes in the same shape.
    */
  def frameSampleStub(df: DataFrame, binaryCol: String, frames: Int = 4): DataFrame = {
    val sliceUdf = udf { (payload: Array[Byte], n: Int) =>
      if (payload == null || payload.isEmpty) Seq.empty[Array[Byte]]
      else {
        val step = math.max(1, payload.length / n)
        (0 until n).map(i => payload.slice(i * step, math.min(payload.length, i * step + step)))
      }
    }
    df.select(col("*"), posexplode(sliceUdf(col(binaryCol), lit(frames)))
      .as(Seq("frame_idx", "frame")))
  }
}
