package graft.operators

import graft.core.ColumnRole
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stats-table side of the reference's report generation
  * (ref: data_report/basic_report_generation.py + report_preprocessing.py
  * — the datapane HTML/chart layer is out of engine scope per SURVEY.md;
  * the numbers that feed it are exactly these tables).
  */
object BasicReport {

  /** All descriptive/quality metric tables for a frame, keyed by section
    * name — the engine-side content of the reference's "basic report".
    */
  def generate(df: DataFrame, threshold: Double = 0.8): Map[String, DataFrame] = {
    val (num, cat, _) = ColumnRole.segregate(df.schema)
    val all = num ++ cat
    val base = Map(
      "global_summary" -> StatsGenerator.globalSummary(df),
      "measures_of_counts" -> StatsGenerator.measuresOfCounts(df, all),
      "measures_of_cardinality" -> StatsGenerator.measuresOfCardinality(df, all),
      "duplicate_detection" -> QualityChecker.duplicateDetection(df, all),
      "nullRows_detection" -> QualityChecker.nullRowsDetection(df, all),
      "IDness_detection" -> QualityChecker.idnessDetection(df, all, threshold),
      "biasedness_detection" -> QualityChecker.biasednessDetection(df, all, threshold))
    val numeric =
      if (num.isEmpty) Map.empty[String, DataFrame]
      else Map(
        "measures_of_centralTendency" -> StatsGenerator.centralTendency(df, num),
        "measures_of_dispersion" -> StatsGenerator.measuresOfDispersion(df, num),
        "measures_of_percentiles" -> StatsGenerator.measuresOfPercentiles(df, num),
        "measures_of_shape" -> StatsGenerator.measuresOfShape(df, num),
        "outlier_detection" -> QualityChecker.outlierDetection(df, num))
    val categorical =
      if (cat.isEmpty) Map.empty[String, DataFrame]
      else Map(
        "mode_computation" -> StatsGenerator.modeComputation(df, cat),
        "invalidEntries_detection" -> QualityChecker.invalidEntriesDetection(df, cat))
    base ++ numeric ++ categorical
  }

  // ------------------------------------------------------------------
  // Chart-DATA precompute (ref: report_preprocessing.py:200-469 —
  // plot_frequency / plot_eventRate / plot_comparative_drift compute a
  // small binned frame in Spark and only then hand it to plotly; the
  // frames below ARE that engine-side computation, the figure layer
  // stays out of scope per SURVEY.md). All of them aggregate FIRST, so
  // the grand-total window / joins run over chart-cardinality frames
  // (≤ #bins rows), never the corpus — 100 TB-safe by construction.
  // ------------------------------------------------------------------

  /** ref: report_preprocessing.py:130-155 `edit_binRange` (a Python UDF
    * there) — a "lo-hi" range label whose two sides are equal collapses
    * to the single value. Pure codegen'd expression here, no UDF.
    *
    * Deliberate deviation: the reference splits on '-' and dedups via an
    * unordered set(), which misfires on negative cutoffs (the label
    * "-5.0000--2.0000" splits into duplicate empty tokens and collapses
    * to garbage) and returns a nondeterministic side. Here the collapse
    * fires ONLY for a well-formed numeric "a-b" label whose two full
    * sides (signs included) are equal — the actual intent — so negative
    * ranges pass through untouched, and the oracle replays the same rule.
    */
  private val rangePat = "^(-?[0-9]+\\.[0-9]+)-(-?[0-9]+\\.[0-9]+)$"
  def editBinRange(c: Column): Column = {
    val lhs = regexp_extract(c, rangePat, 1)
    val rhs = regexp_extract(c, rangePat, 2)
    when(c.isNull, lit(null))
      .when(lhs =!= lit("") && lhs === rhs, lhs)
      .otherwise(c)
  }

  /** ref: report_preprocessing.py:158-197 `binRange_to_binIdx` — interior
    * cutoffs → (bin_idx, label) mapping frame: "<= c1", "c1-c2", …,
    * "> ck". Labels render cutoffs as DECIMAL(18,4) strings (fixed
    * 4-decimal form on every engine) instead of the reference's
    * str(round(x,4)) — same information, deterministic cross-engine.
    */
  def binRangeToBinIdx(spark: SparkSession, labelCol: String, cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty, "need at least one interior cutoff")
    def fmt(d: Double): String =
      java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
    val labels = (0 to cuts.size).map { idx =>
      if (idx == 0) "<= " + fmt(cuts.head)
      else if (idx < cuts.size) fmt(cuts(idx - 1)) + "-" + fmt(cuts(idx))
      else "> " + fmt(cuts.last)
    }
    import spark.implicits._
    labels.zipWithIndex.map { case (l, i) => (i + 1, l) }
      .toDF("bin_idx", labelCol)
  }

  /** ref: report_preprocessing.py:200-259 `plot_frequency` (data part) —
    * per-value counts with a percentage-of-total column. For numeric
    * columns pass the binning model's interior `cuts`: values are bucketed
    * with Transformers.binExpr (same rule the binning stage used), joined
    * to the range-label mapping, and ordered by bin_idx; categorical
    * columns get NULL→'Missing' and the outlier-categories 'others'
    * marker. The grand-total window runs on the POST-aggregation frame
    * (≤ bins rows, one partition is fine at that size).
    */
  def frequencyChartData(df: DataFrame, c: String, cuts: Option[Seq[Double]] = None): DataFrame =
    cuts match {
      case Some(cs) =>
        val binned = df.select(Transformers.binExpr(col(c), cs).as("bin_idx"))
          .groupBy("bin_idx").agg(count(lit(1)).as("count"))
          .withColumn("count_pct",
            round(lit(100) * col("count") / sum("count").over(Window.partitionBy()), 4))
        binned.join(broadcast(binRangeToBinIdx(df.sparkSession, c, cs)), Seq("bin_idx"), "left")
          .select(col("bin_idx"), editBinRange(col(c)).as(c), col("count"), col("count_pct"))
      case None =>
        df.groupBy(coalesce(col(c).cast("string"), lit("Missing")).as(c))
          .agg(count(lit(1)).as("count"))
          .withColumn("count_pct",
            round(lit(100) * col("count") / sum("count").over(Window.partitionBy()), 4))
          .withColumn(c, when(col(c) === "others", "others*").otherwise(editBinRange(col(c))))
    }

  /** ref: report_preprocessing.py:305-368 `plot_eventRate` (data part) —
    * binarize the label against `eventLabel`, count events/non-events per
    * value (the reference's pivot on the 0/1 label), event_rate =
    * 100·events/total. One shuffle on the analysis column.
    */
  def eventRateChartData(
      df: DataFrame,
      c: String,
      labelCol: String,
      eventLabel: String,
      cuts: Option[Seq[Double]] = None): DataFrame = {
    val ev = when(col(labelCol).cast("string") === eventLabel, 1L).otherwise(0L)
    val keyed = cuts match {
      case Some(cs) => df.select(Transformers.binExpr(col(c), cs).as("bin_idx"), ev.as("ev"))
      case None => df.select(coalesce(col(c).cast("string"), lit("Missing")).as(c), ev.as("ev"))
    }
    val keyCol = if (cuts.isDefined) "bin_idx" else c
    val agged = keyed.groupBy(keyCol)
      .agg(sum(when(col("ev") === 0, 1L).otherwise(0L)).as("non_event_count"),
        sum(col("ev")).as("event_count"))
      .withColumn("event_rate",
        round(lit(100) * col("event_count") /
          (col("event_count") + col("non_event_count")).cast("double"), 4))
      .withColumn("attribute_name", lit(c))
    cuts match {
      case Some(cs) =>
        agged.join(broadcast(binRangeToBinIdx(df.sparkSession, c, cs)), Seq("bin_idx"), "left")
          .select(col("bin_idx"), editBinRange(col(c)).as(c), col("non_event_count"),
            col("event_count"), col("event_rate"), col("attribute_name"))
      case None => agged
    }
  }

  /** ref: report_preprocessing.py:371-430 `plot_comparative_drift` (data
    * part) — target per-value frequency share vs a source share frame
    * (columns [c, p], e.g. the drift stage's source histogram), full-outer
    * joined with 0-fills and the reference's %_diff =
    * (target/source − 1)·100 (NULL where the source share is 0, rather
    * than the pandas ±inf).
    */
  def comparativeDriftChartData(target: DataFrame, source: DataFrame, c: String): DataFrame = {
    val tot = target.groupBy(coalesce(col(c).cast("string"), lit("Missing")).as(c))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("countpct_target",
        round(col("cnt") / sum("cnt").over(Window.partitionBy()), 4))
      .drop("cnt")
    val src = source.select(coalesce(col(c).cast("string"), lit("Missing")).as(c),
      col("p").cast("double").as("countpct_source"))
    tot.join(src, Seq(c), "full_outer")
      .select(col(c),
        coalesce(col("countpct_source"), lit(0.0)).as("countpct_source"),
        coalesce(col("countpct_target"), lit(0.0)).as("countpct_target"))
      .withColumn("pct_diff",
        when(col("countpct_source") =!= 0.0,
          round((col("countpct_target") / col("countpct_source") - 1) * 100, 4)))
  }

  /** ref: report_preprocessing.py:260-302 `plot_outlier` (data part) —
    * the violin chart's DATA frame: the analysis column sampled down to
    * ~`sampleSize` rows and run through imputation_MMM, exactly the
    * frame the reference hands to px.violin. The reference's seed-0
    * Bernoulli sample is replaced by the md5-threshold deterministic
    * sample at the SAME fraction min(1, sampleSize/count) — reproducible
    * across engines/reruns (the RNG path stays available through
    * Sampling.dataSample for callers who want the reference's exact
    * sampler).
    *
    * Scale: one count, a map-only hash filter, then MMM's O(1)-driver
    * fill — the chart frame is bounded by sampleSize rows end to end.
    */
  def outlierChartData(
      df: DataFrame,
      c: String,
      keyCols: Seq[String],
      sampleSize: Long = 500000L,
      splitVar: Option[String] = None,
      numMethod: String = "median"): DataFrame = {
    val n = df.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(n, 1L))
    val cols = (keyCols ++ (c +: splitVar.toList)).distinct
    val keep = df.select(cols.map(col): _*)
    val sampled =
      if (fraction >= 1.0) keep
      else graft.sources.Sampling.deterministicSample(keep, fraction, keyCols)
    Transformers.imputationMMM(sampled, Seq(c), Nil, numMethod)
      .withColumn("attribute_name", lit(c))
  }
}
