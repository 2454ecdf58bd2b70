package graft

import graft.sources.{Ingest, Sampling}
import graft.functions.DatetimeOps
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("concatenate by name reorders columns; by index is positional") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id")
    assert(Ingest.concatenateDataset(Seq(a, b), "name").collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    val c = Seq((3, "z")).toDF("id2", "v2")
    assert(Ingest.concatenateDataset(Seq(a, c), "index").count() == 2)
  }

  test("n-ary join on shared key") {
    val a = Seq((1, "a")).toDF("k", "x")
    val b = Seq((1, "b")).toDF("k", "y")
    val c = Seq((1, "c")).toDF("k", "z")
    val j = Ingest.joinDataset(Seq(a, b, c), Seq("k"))
    assert(j.columns.toSeq == Seq("k", "x", "y", "z") && j.count() == 1)
    assert(Ingest.joinDataset(Seq(a, Seq((2, "b")).toDF("k", "y")), Seq("k"), "left_anti").count() == 1)
  }

  test("rename and recast are single projections") {
    val d = Seq((1, "2.5")).toDF("a", "b")
    val renamed = Ingest.renameColumn(d, Map("a" -> "id"))
    assert(renamed.columns.toSeq == Seq("id", "b"))
    val recast = Ingest.recastColumn(d, Map("b" -> "double"))
    assert(recast.schema("b").dataType.typeName == "double")
  }

  test("recommendType flags low-cardinality numeric as categorical") {
    // threshold = min(0.01*200, 100) = 2
    val d = (1 to 200).map(i => (i, i % 2, s"v$i", i.toString)).toDF("id", "flag", "name", "digits")
    val recs = Ingest.recommendType(d).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(recs("id") == "numerical")
    assert(recs("flag") == "categorical")  // 2 uniques <= 2
    assert(recs("name") == "categorical")  // not castable
    assert(recs("digits") == "numerical")  // castable, 200 uniques > 2
  }

  test("stratified population sampling respects strata") {
    val d = (1 to 1000).map(i => (i, if (i % 10 == 0) "rare" else "common")).toDF("id", "s")
    val sampled = Sampling.dataSample(d, 0.5, "stratified", Seq("s"), "population", seed = 1)
    val counts = sampled.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("common", 0L) > 300 && counts.getOrElse("common", 0L) < 600)
    val balanced = Sampling.dataSample(d, 1.0, "stratified", Seq("s"), "balanced", seed = 1)
    val bc = balanced.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bc("common") < 200) // equalized toward smallest stratum (100)
  }

  test("deterministic sample is partition-invariant and near the fraction") {
    val d = (1 to 2000).map(i => (i, s"row$i")).toDF("id", "v")
    val kept = Sampling.deterministicSample(d, 0.3, Seq("id"))
    val n = kept.count()
    assert(n > 480 && n < 720, s"expected ~600 of 2000, got $n") // md5 is uniform
    val keptIds = kept.select("id").collect().map(_.getInt(0)).toSet
    val repartitioned = Sampling.deterministicSample(d.repartition(7), 0.3, Seq("id"))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(keptIds == repartitioned, "sample must not depend on partition layout")
    // monotone: a smaller fraction's sample is a subset of a larger one's
    val smaller = Sampling.deterministicSample(d, 0.1, Seq("id"))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(smaller.subsetOf(keptIds))
  }

  test("range-clustered write enables file skipping on the cluster key") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    val d = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    graft.sources.Ingest.writeClustered(d, s"$dir/t", Seq("k"), numFiles = 8)
    val back = spark.read.parquet(s"$dir/t")
    // correctness: nothing lost
    assert(back.count() == 10000)
    // each parquet file covers a narrow disjoint k-range, so a
    // selective range filter must touch a strict subset of the files
    import org.apache.spark.sql.functions.input_file_name
    val allFiles = back.select(input_file_name()).distinct().count()
    val hitFiles = back.filter(col("k").between(100, 200))
      .select(input_file_name()).distinct().count()
    assert(allFiles == 8, s"expected 8 clustered files, got $allFiles")
    assert(hitFiles == 1, s"range filter should touch 1 of 8 files, touched $hitFiles")
  }

  test("z-ordered write enables file skipping on EVERY cluster dimension") {
    // 100×100 grid: x and y are independent, so a linear sort on x packs
    // every y-value into every file — a y-filter touches all of them. The
    // z-curve tiles the plane instead: a selective filter on EITHER
    // dimension fixes that dimension's top bin bits, which are
    // interleaved into the file-splitting top z-bits.
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val d = (0 until 10000).map(i => (i / 100, i % 100, i.toLong)).toDF("x", "y", "id")
    graft.sources.Ingest.writeZOrdered(d, s"$dir/z", Seq("x", "y"), numFiles = 8)
    graft.sources.Ingest.writeClustered(d, s"$dir/lin", Seq("x"), numFiles = 8)
    val z = spark.read.parquet(s"$dir/z")
    val lin = spark.read.parquet(s"$dir/lin")
    assert(z.count() == 10000 && lin.count() == 10000)
    import org.apache.spark.sql.functions.input_file_name
    def filesHit(df: org.apache.spark.sql.DataFrame, f: org.apache.spark.sql.Column): Long =
      df.filter(f).select(input_file_name()).distinct().count()
    // repartitionByRange SAMPLES its boundaries, so exact tile counts
    // jitter by ±1 between runs — assert the skipping INVARIANTS (strict
    // subsets, and the 2-D box much tighter than either slice), not a
    // lucky boundary placement
    // y-slice (bottom quarter): the x-sorted layout must read every file;
    // the z-layout skips (y's MSB = 0 confines the curve)
    val ySlice = col("y") < 25
    assert(filesHit(lin, ySlice) == 8, "x-linear layout should spread y everywhere")
    assert(filesHit(z, ySlice) <= 5,
      s"z-layout should skip files on a y-filter, hit ${filesHit(z, ySlice)} of 8")
    // x-slice: both layouts skip (x leads the linear sort; x is also
    // interleaved into z)
    val xSlice = col("x") < 25
    assert(filesHit(lin, xSlice) <= 2)
    assert(filesHit(z, xSlice) <= 5,
      s"z-layout should skip files on an x-filter too, hit ${filesHit(z, xSlice)} of 8")
    // a 2-D box is where the tiling wins outright
    val box = col("x") < 25 && col("y") < 25
    assert(filesHit(z, box) <= 3,
      s"z-layout should read a 2-D box from few tiles, hit ${filesHit(z, box)}")
    // and the layout pass is lossless
    val ids: Seq[Long] = z.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 10000L).toSeq)
  }

  test("z-order degenerate inputs: constant and null-bearing columns bin to zero") {
    val dir = java.nio.file.Files.createTempDirectory("zorderdeg").toString
    val d = (0 until 1000).map { i =>
      (i.toLong, 7.5, if (i % 10 == 0) None else Some(i.toDouble))
    }.toDF("id", "konst", "x")
    // constant column: mx == mn hits zorderValue's lit(0) branch; nulls
    // hit the coalesce — the write must survive both and stay lossless
    graft.sources.Ingest.writeZOrdered(d, s"$dir/t", Seq("konst", "x"), numFiles = 4)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 1000)
    assert(back.filter(col("x").isNull).count() === 100)
    // with one dimension constant, the z-value degenerates to the live
    // column's interleaved bits — ordering by it still clusters x
    import org.apache.spark.sql.functions.input_file_name
    val hit = back.filter(col("x").between(500, 700))
      .select(input_file_name()).distinct().count()
    assert(hit <= 2, s"live-dimension filter should still skip files, hit $hit of 4")
  }

  test("deterministic stratified sample hits exact per-stratum targets") {
    // strata sizes 100 / 300 / 600
    val d = ((1 to 100).map(i => (i, "small")) ++ (101 to 400).map(i => (i, "mid")) ++
      (401 to 1000).map(i => (i, "big"))).toDF("id", "s")
    val bal = Sampling.deterministicStratifiedSample(
      d, 0.5, Seq("s"), Seq("id"), "balanced")
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum keeps exactly floor(0.5 * 100) = 50 rows
    assert(bal == Map("small" -> 50L, "mid" -> 50L, "big" -> 50L), s"balanced: $bal")
    val pop = Sampling.deterministicStratifiedSample(
      d, 0.5, Seq("s"), Seq("id"), "population")
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pop == Map("small" -> 50L, "mid" -> 150L, "big" -> 300L), s"population: $pop")
    // both modes must keep the pre-shuffle per-stratum group limit: the
    // rank filter is against a literal, so the exchange carries at most
    // target rows per stratum per map task even for a hot stratum
    Seq("population", "balanced").foreach { mode =>
      val plan = Sampling.deterministicStratifiedSample(d, 0.5, Seq("s"), Seq("id"), mode)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), s"$mode plan lost WindowGroupLimit:\n$plan")
    }
    // partition-layout invariance of the kept ids
    val a = Sampling.deterministicStratifiedSample(d, 0.3, Seq("s"), Seq("id"), "balanced")
      .select("id").collect().map(_.getInt(0)).toSet
    val b = Sampling.deterministicStratifiedSample(
      d.repartition(7), 0.3, Seq("s"), Seq("id"), "balanced")
      .select("id").collect().map(_.getInt(0)).toSet
    assert(a == b)
  }

  test("deterministic stratified sample edge cases: full fraction, null strata") {
    val d = ((1 to 40).map(i => (i, Option("a"))) ++ (41 to 140).map(i => (i, Option("b"))) ++
      (141 to 160).map(i => (i, Option.empty[String]))).toDF("id", "s")
    // null-strata rows are dropped (ref data_sampling na.drop on strata
    // cols) — they neither form a stratum nor shrink balanced targets,
    // so fraction = 1.0 balanced equalizes to the smallest REAL stratum
    val bal = Sampling.deterministicStratifiedSample(d, 1.0, Seq("s"), Seq("id"), "balanced")
      .groupBy("s").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("∅") -> r.getLong(1)).toMap
    assert(bal == Map("a" -> 40L, "b" -> 40L), s"balanced full fraction: $bal")
    // fraction = 1.0 population → identity minus the null-strata rows
    val pop = Sampling.deterministicStratifiedSample(d, 1.0, Seq("s"), Seq("id"), "population")
    assert(pop.count() == 140)
    assert(pop.filter(col("s").isNull).count() == 0)
  }

  test("mixture sampling covers per-source token targets deterministically") {
    val d = (1 to 900).map { i =>
      (i.toLong, s"s${i % 3}", 10 + i % 7) // token counts 10..16
    }.toDF("id", "src", "tok")
    val targets = Sampling.mixtureTargets(Map("s0" -> 2.0, "s1" -> 1.0, "s2" -> 0.0), 3000L)
    assert(targets == Map("s0" -> 2000L, "s1" -> 1000L, "s2" -> 0L))
    val kept = Sampling.mixtureSample(d, "src", col("tok"), Seq("id"), targets)
    val sums = kept.groupBy("src").agg(sum("tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!sums.contains("s2"), "weight-0 source must be dropped")
    for ((s, t) <- Seq("s0" -> 2000L, "s1" -> 1000L)) {
      // covered: kept tokens reach the target; tight: dropping the
      // costliest kept doc (≤16 tokens) falls below it
      assert(sums(s) >= t, s"$s under target: ${sums(s)} < $t")
      assert(sums(s) - 16 < t, s"$s overshot: ${sums(s)}")
    }
    val keptIds = kept.select("id").collect().map(_.getLong(0)).toSet
    val pre = Sampling.mixtureSample(d, "src", col("tok"), Seq("id"), targets,
      prefilterMargin = Some(2.0))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pre == keptIds, "prefiltered scale path must equal the exact path")
    val rep = Sampling.mixtureSample(d.repartition(7), "src", col("tok"), Seq("id"), targets)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rep == keptIds, "mixture sample must not depend on partition layout")
  }

  test("temperature targets upweight small sources with portable integer math") {
    val d = ((1 to 100).map(i => (i.toLong, "small", 10)) ++
      (101 to 1000).map(i => (i.toLong, "big", 10))).toDF("id", "src", "tok")
    val t = Sampling.temperatureTargets(d, "src", col("tok"), 1000L, temperature = 0.5)
    // proportional would give small 100 of 1000; sqrt weights give
    // ~1000·√1000/(√1000+√9000) = 250, minus one for the ⌊·10⁶⌋ floor
    assert(t("small") == 249L, s"small target: ${t("small")}")
    assert(t("big") == 750L, s"big target: ${t("big")}")
    assert(t.values.sum <= 1000L)
  }

  test("deterministic split is exhaustive, disjoint, and stable") {
    val d = (1 to 3000).map(i => (i, i % 7)).toDF("id", "g")
    val split = Sampling.deterministicSplit(
      d, Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), Seq("id"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 3000, "every row gets exactly one split")
    assert(counts("train") > 2250 && counts("train") < 2550)
    assert(counts("valid") > 180 && counts("valid") < 420)
    // stability: same assignment on rerun over a differently-ordered frame
    val again = Sampling.deterministicSplit(
      d.orderBy(org.apache.spark.sql.functions.desc("id")),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), Seq("id"))
    val a = split.collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    val b = again.collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("csv/json/parquet/orc round-trips preserve data") {
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val d = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    for (fmt <- Seq("csv", "json", "parquet", "orc")) {
      val opts = if (fmt == "csv") Map("header" -> "true", "inferSchema" -> "true") else Map.empty[String, String]
      Ingest.writeDataset(d, s"$dir/$fmt", fmt, options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      val back = Ingest.readDataset(spark, s"$dir/$fmt", fmt, opts)
      assert(back.count() == 2, s"$fmt round-trip lost rows")
      assert(back.columns.sorted.toSeq == Seq("id", "name", "score"), s"$fmt columns")
    }
  }

  test("avro round-trip across all engine types (connector or fallback)") {
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456")
    val dt = java.sql.Date.valueOf("2024-03-01")
    val d = Seq(
      (1L, 7, 1.5, 2.5f, "a", true, Some("opt"), ts, dt),
      (2L, 8, -0.25, 0f, "b", false, None, ts, dt))
      .toDF("id", "n", "d", "f", "name", "flag", "opt", "ts", "day")
    Ingest.writeDataset(d, s"$dir/avro", "avro")
    val back = Ingest.readDataset(spark, s"$dir/avro", "avro")
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("ts").dataType.typeName == "timestamp")
    assert(back.schema("day").dataType.typeName == "date")
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(4) == "a")
    assert(rows(0).getAs[java.sql.Timestamp]("ts") == ts)
    assert(rows(0).getAs[java.sql.Date]("day") == dt)
    assert(rows(0).getString(6) == "opt" && rows(1).isNullAt(6))
    // overwrite mode replaces, errorifexists refuses
    Ingest.writeDataset(d.limit(1), s"$dir/avro", "avro")
    assert(Ingest.readDataset(spark, s"$dir/avro", "avro").count() == 1)
    intercept[Exception] {
      Ingest.writeDataset(d, s"$dir/avro", "avro", mode = "errorifexists")
    }
  }

  test("avro fallback reads files written by plain avro tooling") {
    // a file produced by the stock DataFileWriter (what any non-Spark
    // producer emits) — proves the reader handles foreign footers, not
    // just its own output
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = java.nio.file.Files.createTempDirectory("avroext").toString
    val schema: Schema = SchemaBuilder.record("ext").fields()
      .requiredLong("k").optionalString("v").endRecord()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/part-00000.avro"))
    (1 to 5).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("k", i.toLong); r.put("v", if (i % 2 == 0) null else s"v$i")
      w.append(r)
    }
    w.close()
    val back = graft.sources.AvroIO.read(spark, dir)
    assert(back.count() == 5)
    assert(back.where(col("v").isNull).count() == 2)
    assert(back.agg(sum("k")).first().getLong(0) == 15L)
  }

  test("avro fallback scales foreign timestamp-millis to real timestamps") {
    // timestamp-millis is what most non-Spark producers write; the datum
    // reader hands back the raw long with no logical-type conversion, so
    // the reader must apply the x1000 millis->micros scale itself
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = java.nio.file.Files.createTempDirectory("avroms").toString
    val tsMillis = LogicalTypes.timestampMillis()
      .addToSchema(Schema.create(Schema.Type.LONG))
    val optTs = Schema.createUnion(Schema.create(Schema.Type.NULL), tsMillis)
    val schema: Schema = SchemaBuilder.record("extms").fields()
      .requiredLong("k")
      .name("at").`type`(tsMillis).noDefault()
      .name("maybe").`type`(optTs).withDefault(null)
      .endRecord()
    val epochMs = 1709288430123L // 2024-03-01T10:20:30.123Z
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/part-00000.avro"))
    (0 until 3).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("k", i.toLong)
      r.put("at", epochMs + i * 1000L)
      r.put("maybe", if (i == 1) null else java.lang.Long.valueOf(epochMs))
      w.append(r)
    }
    w.close()
    val back = graft.sources.AvroIO.read(spark, dir)
    assert(back.schema("at").dataType.typeName == "timestamp")
    val rows = back.orderBy("k").collect()
    val expect = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(epochMs))
    assert(rows(0).getAs[java.sql.Timestamp]("at") == expect,
      s"timestamp-millis misscaled: ${rows(0).getAs[java.sql.Timestamp]("at")} vs $expect")
    assert(rows(2).getAs[java.sql.Timestamp]("at") ==
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(epochMs + 2000L)))
    assert(rows(1).isNullAt(rows(1).fieldIndex("maybe")))
    assert(rows(0).getAs[java.sql.Timestamp]("maybe") == expect)
  }

  test("partitioned writes enable partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("partw").toString
    val d = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "par")
    Ingest.writeDataset(d, s"$dir/t", "parquet", partitionBy = Seq("par"))
    assert(new java.io.File(s"$dir/t/par=even").exists())
    val read = spark.read.parquet(s"$dir/t").filter(col("par") === "even")
    assert(read.count() == 50)
    // pruned scan reads only the one partition directory
    val scanDesc = read.queryExecution.executedPlan.toString
    assert(!scanDesc.contains("par=odd"))
  }

  test("bucketed tables sort-merge join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Ingest.writeBucketedTable(a, "bk_a", Seq("k"), 4, sortCols = Seq("k"))
    Ingest.writeBucketedTable(b, "bk_b", Seq("k"), 4, sortCols = Seq("k"))
    // force SMJ (tiny tables would broadcast) to prove bucket co-location
    val joined = spark.table("bk_a").hint("merge").join(spark.table("bk_b"), "k")
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"))
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
  }

  test("datetime wrappers: diff, add, flags") {
    val d = Seq((
      java.sql.Timestamp.valueOf("2024-01-06 00:00:00"), // a Saturday
      java.sql.Timestamp.valueOf("2024-01-07 12:00:00")
    )).toDF("t1", "t2")
    val r = d.select(
      DatetimeOps.timeDiff(col("t1"), col("t2"), "hours"),
      DatetimeOps.isWeekend(col("t1")),
      DatetimeOps.isLeapYear(col("t1")),
      DatetimeOps.isMonthStart(col("t1"))).first()
    assert(r.getDouble(0) == 36.0 && r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 0)
  }

  test("timezone conversion shifts wall-clock correctly") {
    val d = Seq(java.sql.Timestamp.valueOf("2024-06-15 12:00:00")).toDF("t") // UTC session
    val r = d.select(
      date_format(DatetimeOps.timezoneConversion(col("t"), "UTC", "Asia/Tokyo"),
        "yyyy-MM-dd HH:mm").as("tokyo"),
      date_format(DatetimeOps.timezoneConversion(col("t"), "UTC", "America/New_York"),
        "yyyy-MM-dd HH:mm").as("nyc")).first()
    assert(r.getString(0) == "2024-06-15 21:00") // UTC+9
    assert(r.getString(1) == "2024-06-15 08:00") // EDT, UTC-4
  }

  test("workflow writes stats tables when save_stats_path set") {
    val out = java.nio.file.Files.createTempDirectory("stats").toString
    val yaml = s"""
input_dataset:
  read_dataset:
    file_path: "/root/testdata/sf0.001/customer.parquet"
    file_type: parquet
stats_generator:
  list_of_cols: all
  save_stats_path: "$out"
"""
    graft.workflow.Workflow.run(spark, yaml)
    val counts = spark.read.parquet(s"$out/measures_of_counts")
    assert(counts.count() == 5) // one row per customer column
    assert(spark.read.parquet(s"$out/global_summary").count() == 8)
  }

  test("datetime comparisons, selected hours, unit additions") {
    val d = Seq((
      java.sql.Timestamp.valueOf("2024-03-10 22:30:00"),
      java.sql.Timestamp.valueOf("2024-03-11 02:00:00")
    )).toDF("t1", "t2")
    val r = d.select(
      DatetimeOps.timestampComparison(col("t1"), col("t2"), "lesser"),
      DatetimeOps.isSelectedHour(col("t1"), 21, 3),  // wrap-around window
      DatetimeOps.isSelectedHour(col("t2"), 21, 3),
      DatetimeOps.isSelectedHour(col("t1"), 9, 17),
      date_format(DatetimeOps.addingTimeUnits(col("t1"), 90, "minutes"), "HH:mm"),
      date_format(DatetimeOps.addingTimeUnits(col("t1"), 2, "hours"), "HH:mm")).first()
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 0)
    assert(r.getString(4) == "00:00" && r.getString(5) == "00:30")
    // time_elapsed is non-negative for past timestamps
    val el = d.select(DatetimeOps.timeElapsed(col("t1"), "days")).first().getDouble(0)
    assert(el > 0)
  }

  test("window aggregator rolling/expanding frames") {
    val d = Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0))
      .toDF("user", "seq", "v")
    val rolled = DatetimeOps.windowAggregator(d, "v", Seq("seq"), Seq("user"),
      "rolling", windowSize = 2, aggs = Seq("sum"))
    val m = rolled.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(m((1, 3)) == 50.0 && m((1, 1)) == 10.0 && m((2, 1)) == 5.0)
    val lagged = DatetimeOps.laggedTs(d, "v", Seq("seq"), Seq("user"), 1)
    val lm = lagged.collect().map(r => (r.getInt(0), r.getInt(1)) -> Option(r.get(3))).toMap
    assert(lm((1, 2)).contains(10.0) && lm((1, 1)).isEmpty)
  }

  test("forward fill carries last observation, leaves leading nulls") {
    val d = Seq(
      (1L, 100L, Option.empty[Double]), // leading null stays null
      (2L, 100L, Some(5.0)),
      (3L, 100L, None),                 // filled with 5.0
      (4L, 100L, Some(7.0)),
      (5L, 200L, None)                  // other key, leading null
    ).toDF("seq", "k", "v")
    val out = DatetimeOps.forwardFill(d, Seq("v"), Seq("k"), Seq("seq"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L).isEmpty && out(3L).contains(5.0) && out(4L).contains(7.0) && out(5L).isEmpty)
  }

  test("batch sessionization splits on gaps per user") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val d = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(5)),   // session 0 of user 100
      (3L, 100L, ts(50)),                     // 45-min gap → session 1
      (4L, 200L, ts(10))                      // other user, own session 0
    ).toDF("event_id", "user_id", "ts")
    val out = DatetimeOps.sessionize(d, "user_id", "ts")
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("as-of join picks the latest prior right row, inclusive at ties") {
    val left = Seq((1L, 100L, 5L), (2L, 100L, 8L), (3L, 100L, 3L), (4L, 200L, 9L))
      .toDF("id", "k", "ts")
    val right = Seq((100L, 4L, 1.0), (100L, 8L, 2.0), (200L, 10L, 3.0))
      .toDF("k", "ts", "v")
    val out = graft.functions.AsofJoin
      .asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L).contains(1.0))      // ts=5 sees right ts=4
    assert(out(2L).contains(2.0))      // ts=8 sees right ts=8 (inclusive)
    assert(out(3L).isEmpty)            // ts=3 has no prior right row
    assert(out(4L).isEmpty)            // right ts=10 is in the future
  }

  test("filters and projections push down to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("pushdown").toString
    (1 to 1000).map(i => (i.toLong, s"v$i", i * 2.0, s"pad$i"))
      .toDF("k", "v", "x", "pad").write.parquet(s"$dir/t")
    val plan = spark.read.parquet(s"$dir/t")
      .filter(col("k") > 500L)
      .select((col("x") * 2).as("y"))
      .queryExecution.executedPlan.toString
    // the predicate must reach the scan (row-group skipping at scale)…
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,500)"), plan)
    // …and the scan must read ONLY the two referenced columns
    assert(plan.contains("ReadSchema: struct<k:bigint,x:double>"), plan)
  }

  test("write_dataset column_order reorders, validates, and rejects bad repartition") {
    // ref test_data_ingest_unit.py:97-137 contract
    val dir = java.nio.file.Files.createTempDirectory("worder").toString
    val d = Seq((1, "x", 2.0)).toDF("A", "B", "C")
    graft.sources.Ingest.writeDataset(d, s"$dir/t", "parquet",
      columnOrder = Seq("B", "C", "A"))
    assert(spark.read.parquet(s"$dir/t").columns.toSeq == Seq("B", "C", "A"))
    intercept[IllegalArgumentException] {
      graft.sources.Ingest.writeDataset(d, s"$dir/t2", "parquet",
        columnOrder = Seq("A", "B", "C", "D"))
    }
    intercept[IllegalArgumentException] {
      graft.sources.Ingest.writeDataset(d, s"$dir/t3", "parquet",
        repartitionTo = Some(-5))
    }
  }

  test("snapshot diff is null-safe and O(churn)-sized") {
    val oldS = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
      (4L, Option("d"))).toDF("k", "v")
    val newS = Seq((1L, Option("a")), (2L, Option("z")), (3L, Option("c")),
      (5L, Option("e"))).toDF("k", "v")
    val diff = graft.sources.Ingest.snapshotDiff(oldS, newS, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged (absent), 2 changed, 3 null→value = changed,
    // 4 removed, 5 added
    assert(diff == Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 5L -> "added"),
      s"$diff")
  }

  test("scd2 intervals collapse runs, null values form runs too") {
    val e = Seq(
      (1L, 10L, Option("on")), (1L, 20L, Option("on")),   // run 1
      (1L, 30L, Option.empty[String]),                    // null run
      (1L, 40L, Option("off")), (1L, 50L, Option("off")), // current run
      (2L, 15L, Option("x"))
    ).toDF("k", "t", "v")
    val iv = graft.functions.DatetimeOps.scd2Intervals(e, Seq("k"), "v", Seq("t"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
    assert(iv == Set(
      (1L, Some("on"), 10L, Some(30L), false),
      (1L, None, 30L, Some(40L), false),
      (1L, Some("off"), 40L, None, true),
      (2L, Some("x"), 15L, None, true)), s"$iv")
  }

  test("as-of join forward and nearest directions") {
    val left = Seq((1L, 100L, 5L), (2L, 100L, 8L), (3L, 100L, 30L), (4L, 100L, 6L))
      .toDF("id", "k", "ts")
    val right = Seq((100L, 4L, 1.0), (100L, 8L, 2.0), (200L, 10L, 3.0))
      .toDF("k", "ts", "v")
    def run(dir: String) = graft.functions.AsofJoin
      .asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), direction = dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val fwd = run("forward")
    assert(fwd(1L).contains(2.0))      // ts=5 → next right ts=8
    assert(fwd(2L).contains(2.0))      // ts=8 → right ts=8 (inclusive)
    assert(fwd(3L).isEmpty)            // nothing at/after ts=30
    val near = run("nearest")
    assert(near(1L).contains(1.0))     // |5-4|=1 beats |8-5|=3
    assert(near(2L).contains(2.0))     // exact hit
    assert(near(3L).contains(2.0))     // only prior rows remain
    assert(near(4L).contains(1.0))     // |6-4|=2 ties |8-6|=2 → backward

    // pandas merge_asof tolerance: matches beyond the bound null out, the
    // left rows stay (still a LEFT join)
    def runTol(dir: String, tol: Double) = graft.functions.AsofJoin
      .asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
        direction = dir, tolerance = Some(tol))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val backTol = runTol("backward", 2.0)
    assert(backTol(1L).contains(1.0))  // 5−4=1 ≤ 2
    assert(backTol(2L).contains(2.0))  // exact hit, distance 0
    assert(backTol(3L).isEmpty)        // 30−8=22 > 2 → discarded
    assert(backTol.size == 4)          // every left row kept
    val nearTol = runTol("nearest", 1.0)
    assert(nearTol(1L).contains(1.0))  // distance 1 ≤ 1
    assert(nearTol(4L).isEmpty)        // nearest distance 2 > 1

    // allow_exact_matches=false: equal-ts rights become invisible
    def runStrict(dir: String) = graft.functions.AsofJoin
      .asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
        direction = dir, allowExactMatches = false)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val backStrict = runStrict("backward")
    assert(backStrict(2L).contains(1.0)) // ts=8 skips right AT 8 → prior 4
    assert(backStrict(1L).contains(1.0)) // unaffected away from ties
    val fwdStrict = runStrict("forward")
    assert(fwdStrict(2L).isEmpty)        // ts=8 skips right AT 8; none later
    assert(fwdStrict(1L).contains(2.0))  // unaffected away from ties
    intercept[IllegalArgumentException] {
      runStrict("nearest")               // documented one-pass limitation
    }
  }

  test("interval join matches points to covering [start,end) windows") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 25L)).toDF("id", "t")
    val ivs = Seq((100L, 0L, 10L), (200L, 8L, 20L)).toDF("w", "s", "e")
    val out = graft.functions.AsofJoin.intervalJoin(pts, ivs, "t", "s", "e", chunk = 7L)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // t=5 → [0,10); t=10 → [8,20) only (end-exclusive); t=19 → [8,20); t=25 → none
    assert(out == Set((1L, 100L), (2L, 200L), (3L, 200L)))
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    // fact partitioned by day; a filtered dim join must prune fact
    // partitions at RUNTIME (DPP) — at 100 TB this is the difference
    // between scanning one day and scanning the table
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    val fact = (1 to 2000).map(i => (i.toLong, i % 20, i * 1.0))
      .toDF("id", "day", "v")
    fact.write.partitionBy("day").parquet(s"$dir/fact")
    val dim = (0 until 20).map(d => (d, if (d == 7) "keep" else "drop"))
      .toDF("day", "tag")
    dim.write.parquet(s"$dir/dim")
    val f = spark.read.parquet(s"$dir/fact")
    val d = spark.read.parquet(s"$dir/dim").filter(col("tag") === "keep")
    val joined = f.join(d, "day")
    assert(joined.count() == 100) // 2000 / 20 rows in day 7
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a dynamic partition pruning filter in:\n$plan")
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // one hot key dominates the fact side; with a low skew threshold AQE
    // must mark the sort-merge join skew=true and split the reducer
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // enough reducers that the median partition is a non-hot one
      conf.set("spark.sql.shuffle.partitions", "8")
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // incompressible payload so the hot reducer exceeds the byte threshold
      val fact = ((1 to 20000).map(_ => 1) ++ (1 to 200).map(i => i % 50 + 2))
        .zipWithIndex.map { case (k, i) => (k, f"${i * 2654435761L}%016x" * 4) }
        .toDF("k", "pad")
      val dim = (1 to 60).map(k => (k, s"d$k")).toDF("k", "dv")
      val joined = fact.join(dim, "k")
      // materialize THIS QueryExecution (count() would plan separately and
      // leave joined's adaptive plan unexecuted / isFinalPlan=false)
      assert(joined.collect().length == 20200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew handling in:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("row ids: contiguous under total order, unique under monotonic") {
    val d = Seq(30, 10, 20).toDF("k").repartition(3)
    val ordered = Ingest.withRowId(d, Seq("k")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ordered == Map(10 -> 0L, 20 -> 1L, 30 -> 2L))
    val mono = Ingest.monotonicId(d).collect().map(_.getLong(1))
    assert(mono.distinct.length == 3)
  }
}
