package graft

import graft.operators.QualityChecker
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("duplicateDetection metrics") {
    val d = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val m = QualityChecker.duplicateDetection(d, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("rows_count") == 3.0 && m("unique_rows_count") == 2.0 && m("duplicate_rows") == 1.0)
    assert(QualityChecker.dropDuplicatesOn(d, Seq("k", "v")).count() == 2)
  }

  test("nullRows histogram and treatment") {
    val d = Seq(
      (Some(1), Some("a")),
      (None: Option[Int], None: Option[String]),
      (Some(3), None: Option[String])
    ).toDF("a", "b")
    val h = QualityChecker.nullRowsDetection(d, Seq("a", "b"), threshold = 0.5).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h == Map(0 -> 1L, 1 -> 1L, 2 -> 1L))
    assert(QualityChecker.nullRowsTreatment(d, Seq("a", "b"), 0.5).count() == 2)
  }

  test("invalid entries: null words, special chars, repeats") {
    val d = Seq("ok", "NA", "###", "aaa", "fine", " null ").toDF("s")
    val r = QualityChecker.invalidEntriesDetection(d, Seq("s")).collect()(0)
    assert(r.getLong(r.fieldIndex("invalid_count")) == 4)
    assert(r.getLong(r.fieldIndex("null_word_count")) == 2)
    assert(r.getLong(r.fieldIndex("special_char_count")) == 1)
    assert(r.getLong(r.fieldIndex("repeated_char_count")) == 2) // aaa and ### (overlapping categories)
    val treated = QualityChecker.invalidEntriesTreatment(d, Seq("s"))
    assert(treated.filter(col("s").isNull).count() == 4)
  }

  test("invalid entries honours user regexes and whitelist") {
    val d = Seq("ok", "XX-1", "XX-2", "NA", "keepme").toDF("s")
    val r = QualityChecker.invalidEntriesDetection(d, Seq("s"),
      userRegexes = Seq("^xx-\\d$", "^keepme$"), whitelist = Seq("keepme")).collect()(0)
    assert(r.getLong(r.fieldIndex("invalid_count")) == 3) // XX-1, XX-2, NA; keepme whitelisted
  }

  test("outlier bounds combine methods via order statistic; clamp treatment") {
    val d = ((1 to 100).map(_.toDouble) :+ 1000.0).toDF("x")
    val bounds = QualityChecker.outlierBounds(d, Seq("x"))
    val b = bounds.head
    assert(b.upper < 1000.0 && b.lower <= 6.0)
    val clamped = QualityChecker.outlierTreatment(d, bounds, "value")
    assert(clamped.agg(max(col("x"))).first().getDouble(0) == b.upper)
    val dropped = QualityChecker.outlierTreatment(d, bounds, "row_removal")
    assert(dropped.count() < 101)
  }

  test("nullColumns treatment dispatcher") {
    val d = Seq(
      (Some(1.0), Some("a")),
      (None: Option[Double], Some("b")),
      (Some(3.0), None: Option[String])
    ).toDF("num", "cat")
    assert(QualityChecker.nullColumnsDetection(d, Seq("num", "cat"), "row_removal").count() == 1)
    val mmm = QualityChecker.nullColumnsDetection(d, Seq("num", "cat"), "MMM")
    assert(mmm.filter(col("num").isNull || col("cat").isNull).count() == 0)
    // 1/3 ≈ 0.3333 missing per column: kept at 0.5, dropped at 0.2
    assert(QualityChecker.nullColumnsDetection(d, Seq("num", "cat"),
      "column_removal", threshold = 0.5).columns.toSeq == Seq("num", "cat"))
    assert(QualityChecker.nullColumnsDetection(d, Seq("num", "cat"),
      "column_removal", threshold = 0.2).columns.isEmpty)
  }

  test("golden parity: reference IDness scenario") {
    // ref: test_quality_checker.py test_IDness_detection — education has
    // 4 uniques over 4 non-nulls → IDness 1.0, flagged at threshold 1.0;
    // income 3/3 → 1.0; age 4/4 → 1.0.
    val d = Seq(
      ("27520a", 51, Some(9000), "HS-grad"),
      ("10a", 42, Some(7000), "Postgrad"),
      ("11a", 35, None, "graduate"),
      ("1100b", 23, Some(6000), "matric")
    ).toDF("ifa", "age", "income", "education")
    val r = QualityChecker.idnessDetection(d, Seq("age", "income", "education"), 1.0)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getInt(x.fieldIndex("flagged")))).toMap
    assert(r("education") == ((4L, 1.0, 1)))
    assert(r("income") == ((3L, 1.0, 1)))
    assert(r("age") == ((4L, 1.0, 1)))
  }

  test("golden parity: reference imputation_MMM null counts on the income fixture") {
    // ref: src/test/anovos/data_transformer/test_transformers.py:424-458 —
    // pre-imputation null counts (age 30, fnlwgt 8, hours-per-week 59,
    // race 162, relationship 4); after MMM those hit 0 while untouched
    // columns keep logfnl 10214 / education 258 nulls.
    val fixture = "/root/reference/data/test_dataset/" +
      "part-00001-3eb0f7bb-05c2-46ec-8913-23ba231d2734-c000.snappy.parquet"
    assume(new java.io.File(fixture).exists())
    val df = spark.read.parquet(fixture)
    def nulls(d: org.apache.spark.sql.DataFrame, c: String) =
      d.filter(col(c).isNull).count()
    assert(nulls(df, "age") == 30 && nulls(df, "fnlwgt") == 8 &&
      nulls(df, "hours-per-week") == 59 && nulls(df, "race") == 162 &&
      nulls(df, "relationship") == 4)
    val imputed = graft.operators.Transformers.imputationMMM(df,
      numCols = Seq("age", "fnlwgt", "hours-per-week"),
      catCols = Seq("relationship", "race"))
    Seq("age", "fnlwgt", "hours-per-week", "race", "relationship")
      .foreach(c => assert(nulls(imputed, c) == 0, c))
    assert(nulls(imputed, "logfnl") == 10214)
    assert(nulls(imputed, "education") == 258)
  }

  test("basic report emits all stats sections") {
    val d = Seq((1L, 2.5, "x"), (2L, 3.5, "y")).toDF("id", "v", "c")
    val report = graft.operators.BasicReport.generate(d)
    assert(report.keySet.contains("global_summary"))
    assert(report.keySet.contains("measures_of_percentiles"))
    assert(report.keySet.contains("mode_computation"))
    assert(report("global_summary").count() == 8)
  }

  test("sampleCapped leaves small frames untouched and caps big ones") {
    val d = (1 to 1000).map(_.toDouble).toDF("x")
    assert(QualityChecker.sampleCapped(d, Some(5000L)).count() == 1000)
    val capped = QualityChecker.sampleCapped(d, Some(100L)).count()
    assert(capped > 50 && capped < 200)
  }

  test("outlier detection sides and skewness exclusion") {
    val d = ((1 to 100).map(_.toDouble) :+ 1000.0 :+ -1000.0).toDF("x")
    val upper = QualityChecker.outlierBounds(d, Seq("x"), detectionSide = "upper").head
    assert(upper.lower.isNegInfinity && upper.upper < 1000.0)
    val lower = QualityChecker.outlierBounds(d, Seq("x"), detectionSide = "lower").head
    assert(lower.upper.isPosInfinity && lower.lower > -1000.0)
    // point-mass column is excluded
    val pm = Seq.fill(50)(7.0).toDF("x")
    val b = QualityChecker.outlierBounds(pm, Seq("x")).head
    assert(b.excluded)
    val metrics = QualityChecker.outlierDetection(pm, Seq("x")).collect()(0)
    assert(metrics.getInt(metrics.fieldIndex("excluded_due_to_skewness")) == 1)
    assert(metrics.getLong(metrics.fieldIndex("upper_outliers")) == 0)
  }

  test("idness and biasedness flags") {
    val d = Seq(("a", "x"), ("b", "x"), ("c", "x"), ("d", "y")).toDF("id", "biased")
    val idn = QualityChecker.idnessDetection(d, Seq("id"), 0.8).collect()(0)
    assert(idn.getInt(idn.fieldIndex("flagged")) == 1)
    val bia = QualityChecker.biasednessDetection(d, Seq("biased"), 0.7).collect()(0)
    assert(bia.getInt(bia.fieldIndex("flagged")) == 1)
  }

  test("golden parity: reference nullRows_detection histogram and treatment") {
    // ref test_quality_checker.py:55-129 — threshold 0.4: the row with 2/4
    // null columns is treated; histogram rows: 0-null→3 rows (0.75 pct)
    val d = Seq(
      ("27520a", Some(51), Some(9000), Some("HS-grad")),
      ("10a", Some(42), Some(7000), Some("Postgrad")),
      ("11a", Some(35), None: Option[Int], None: Option[String]),
      ("1100b", Some(23), Some(6000), Some("HS-grad"))
    ).toDF("ifa", "age", "income", "education")
    val cols = Seq("ifa", "age", "income", "education")
    val h = QualityChecker.nullRowsDetection(d, cols, threshold = 0.4).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    assert(h(0) == ((3L, 0.75, 0)))
    assert(h(2) == ((1L, 0.25, 1))) // 2/4 = 0.5 > 0.4 → flagged
    assert(QualityChecker.nullRowsTreatment(d, cols, 0.4).count() == 3)
  }

  test("golden parity: reference biasedness_detection mode values") {
    // ref test_quality_checker.py:341-421 — education mode HS-grad at 0.8
    val d = Seq(
      ("27520a", 51, Some(9000), "HS-grad"),
      ("10a", 42, Some(7000), "HS-grad"),
      ("11a", 35, None: Option[Int], "HS-grad"),
      ("11d", 45, Some(9500), "HS-grad"),
      ("1100b", 23, Some(6000), "matric")
    ).toDF("ifa", "age", "income", "education")
    val r = QualityChecker.biasednessDetection(d, Seq("education"), threshold = 0.8)
      .collect()(0)
    assert(r.getAs[String]("mode") == "HS-grad")
    assert(r.getAs[Double]("mode_pct") == 0.8)
    assert(r.getAs[Int]("flagged") == 1)
  }

  test("golden parity: reference invalidEntries_detection counts") {
    // ref test_quality_checker.py:192-249 — age 9999 (repeated chars) and
    // education ":" (special char) are the only invalids: count 1 / pct
    // 0.2 for both columns
    val d = Seq(
      ("27520a", 51, Some(9000), "HS-grad"),
      ("10a", 42, Some(7000), "Postgrad"),
      ("10a", 9999, Some(7000), "Postgrad"),
      ("11a", 35, None, ":"),
      ("1100b", 23, Some(6000), "HS-grad")
    ).toDF("ifa", "age", "income", "education")
    val r = QualityChecker.invalidEntriesDetection(d, Seq("age", "education"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(x.fieldIndex("invalid_count")),
          x.getDouble(x.fieldIndex("invalid_pct")))).toMap
    assert(r("age") == ((1L, 0.2)))
    assert(r("education") == ((1L, 0.2)))
    // treatment keeps all 5 rows, nulling the invalid cells (ref odf)
    val treated = QualityChecker.invalidEntriesTreatment(d, Seq("age", "education"))
    assert(treated.count() == 5)
    assert(treated.filter(col("age").isNull).count() == 1)
    assert(treated.filter(col("education").isNull).count() == 1)
  }

  test("approx (GK sketch) outlier bounds track the exact bounds") {
    val rnd = new scala.util.Random(3)
    val d = (1 to 20000).map(_ => rnd.nextGaussian() * 10 + 50).toDF("x")
    val exact = QualityChecker.outlierBounds(d, Seq("x")).head
    val approx = QualityChecker.outlierBounds(d, Seq("x"), approx = true).head
    // 0.01 relative rank error on a smooth distribution → bounds close
    assert(math.abs(exact.upper - approx.upper) < 3.0,
      s"approx upper ${approx.upper} vs exact ${exact.upper}")
    assert(math.abs(exact.lower - approx.lower) < 3.0)
  }

  test("invalid entries MMM and column-removal treatments") {
    val d = Seq(
      ("ok", 1.0), ("NA", 2.0), ("###", 3.0), ("fine", 4.0), ("good", 5.0)
    ).toDF("s", "x")
    // MMM: the two invalid strings become the mode of the valid ones
    val mmm = QualityChecker.invalidEntriesTreatment(d, Seq("s"), method = "MMM")
    assert(mmm.filter(col("s").isNull).count() == 0)
    val filled = mmm.filter(col("x") === 2.0 || col("x") === 3.0)
      .select("s").collect().map(_.getString(0)).toSet
    assert(filled.subsetOf(Set("fine", "good", "ok")))
    // column_removal with threshold: s has 2/5 = 40% invalid → dropped
    // above 0.3, kept above 0.5
    val dropped = QualityChecker.invalidEntriesTreatment(
      d, Seq("s"), method = "column_removal", treatmentThreshold = Some(0.3))
    assert(!dropped.columns.contains("s"))
    val kept = QualityChecker.invalidEntriesTreatment(
      d, Seq("s"), method = "column_removal", treatmentThreshold = Some(0.5))
    assert(kept.columns.contains("s"))
    // threshold also gates null_replacement
    val untouched = QualityChecker.invalidEntriesTreatment(
      d, Seq("s"), treatmentThreshold = Some(0.5))
    assert(untouched.filter(col("s").isNull).count() == 0)
  }

  test("all-null column is excluded from outlier bounds, not an NPE") {
    val d = Seq((1.0, None: Option[Double]), (2.0, None), (3.0, None))
      .toDF("x", "y")
    val bounds = QualityChecker.outlierBounds(d, Seq("x", "y"))
    assert(!bounds.find(_.attribute == "x").get.excluded)
    assert(bounds.find(_.attribute == "y").get.excluded)
    val metrics = QualityChecker.outlierDetection(d, Seq("y")).collect()(0)
    assert(metrics.getInt(metrics.fieldIndex("excluded_due_to_skewness")) == 1)
  }

  test("k-anonymity audit: class histogram, shares, and the k floor") {
    // QI classes: (a,1)×4, (a,2)×1, (b,1)×1 → sizes {4:1 class, 1:2 classes}
    val d = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1))
      .toDF("seg", "nat")
    val h = QualityChecker.kAnonymityAudit(d, Seq("seg", "nat"), k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(h(4L) == ((1L, 4L, 0.6667, false)))
    assert(h(1L) == ((2L, 2L, 0.3333, true)))
    // NULL QI values form their own class rather than exploding
    val withNull = d.union(Seq((null.asInstanceOf[String], 9)).toDF("seg", "nat"))
    val h2 = QualityChecker.kAnonymityAudit(withNull, Seq("seg", "nat"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h2(1L) == 3L)
    intercept[IllegalArgumentException] {
      QualityChecker.kAnonymityAudit(d, Seq.empty, k = 3)
    }
  }
}
