package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted-sketch incremental distinct counting — the 100 TB pattern
  * where history is NEVER rescanned: each ingest batch (day, source,
  * shard) aggregates its values into a mergeable Datasketches HLL
  * sketch (Spark's `hll_sketch_agg`), the binary sketches are saved
  * like any other table, and any later question ("distinct users last
  * 90 days", "distinct tokens across sources A+B") is answered by
  * unioning kilobyte sketches instead of re-reading terabytes of rows.
  * Sketch union is EXACT over the sketch state (not an estimate of an
  * estimate): union-of-parts equals the sketch of the whole, which
  * SketchSpec pins bit-for-bit.
  */
object SketchStore {

  /** One HLL sketch per group — the batch-ingest side. `lgK` trades
    * size for accuracy (2^lgK registers; 12 → ~1.6 KB, ~2% rsd).
    */
  def hllSketches(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "sketch groups required")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg(`$valueCol`, $lgK)").as("sketch"))
  }

  /** Union saved sketches (optionally re-grouped on a coarser key) and
    * estimate the distinct count. Kilobytes per group move, not rows.
    */
  def unionEstimate(
      sketches: DataFrame,
      groupCols: Seq[String] = Nil): DataFrame = {
    if (groupCols.isEmpty)
      sketches.agg(
        expr("cast(hll_sketch_estimate(hll_union_agg(sketch)) as long)")
          .as("distinct_estimate"))
    else
      sketches.groupBy(groupCols.map(col): _*)
        .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sketch)) as long)")
          .as("distinct_estimate"))
  }

  /** Mergeable moment "sketches" — the exact little sibling of the HLL
    * store for mean/variance questions: each ingest batch reduces to
    * (n, Σx, Σx²) per group in EXACT decimal arithmetic (a 4-dp value
    * fits DECIMAL(18,4); its square is exact in DECIMAL(37,8)), the
    * three-number rows are saved like any table, and any later rollup
    * ("mean and stddev per source over all history") merges rows by
    * addition — history never rescanned, and unlike a sketch the answer
    * is exact to the last decimal.
    */
  def momentSketches(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(groupCols.nonEmpty, "sketch groups required")
    val x = col(valueCol).cast(DecimalType(18, 4))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        // count the CAST value: a value the decimal cast nulls (possible
        // in a non-ANSI session) must drop from n exactly as it drops
        // from the sums, or the merged mean silently skews
        count(x).as("n"),
        sum(x).as("sum_x"),
        sum(x * x).as("sum_x2"))
  }

  /** Merge saved moment rows (optionally regrouped on a coarser key) and
    * derive mean / sample variance / stddev. The merge is pure addition
    * of exact decimals; only the final mean/variance divisions are
    * doubles, and each is a single deterministic expression — so the
    * merged answer equals a from-scratch scan bit-for-bit.
    */
  def mergeMoments(
      moments: DataFrame,
      groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val merged =
      if (groupCols.isEmpty)
        moments.agg(sum(col("n")).as("n"), sum(col("sum_x")).as("sum_x"),
          sum(col("sum_x2")).as("sum_x2"))
      else
        moments.groupBy(groupCols.map(col): _*)
          .agg(sum(col("n")).as("n"), sum(col("sum_x")).as("sum_x"),
            sum(col("sum_x2")).as("sum_x2"))
    val n = col("n").cast(DoubleType)
    val s = col("sum_x").cast(DoubleType)
    val s2 = col("sum_x2").cast(DoubleType)
    merged.select(
      (groupCols.map(col) ++ Seq(
        col("n"),
        round(s / n, 4).as("mean"),
        // sample variance needs n ≥ 2 — a single-row group yields null,
        // not an ANSI DIVIDE_BY_ZERO that kills the whole rollup
        when(col("n") > 1, round((s2 - s * s / n) / (n - 1), 4)).as("variance"),
        when(col("n") > 1, round(sqrt((s2 - s * s / n) / (n - 1)), 4)).as("stddev"))): _*)
  }

  /** Overlap between two saved key sets by inclusion–exclusion:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B). HLL can't intersect directly,
    * but its union is EXACT over sketch state, so the three operands
    * come from the same kilobyte-sized frames a distinct-count question
    * reads — history is still never rescanned. In the sketch's exact
    * (list-mode) regime all three estimates are exact integers and so
    * is the intersection; in the estimating regime the error compounds
    * (sum of three rsd's — fine for "how much do sources A and B
    * overlap", not for tiny intersections of huge sets; the spec pins
    * both regimes).
    */
  def intersectionEstimate(
      sketches: DataFrame,
      keyCol: String,
      groupA: Seq[String],
      groupB: Seq[String]): DataFrame = {
    require(groupA.nonEmpty && groupB.nonEmpty, "both groups need keys")
    // three tagged union-estimates folded by one pivot aggregation —
    // a crossJoin of the 1-row frames would be equivalent but plans as
    // a BroadcastNestedLoopJoin, which the plan gate (rightly) rejects
    // on sight rather than proving the inputs are scalar
    def est(keys: Seq[String], tag: String) =
      unionEstimate(sketches.filter(col(keyCol).isin(keys.map(x => x: Any): _*)))
        .withColumn("__t", lit(tag))
    val tagged = est(groupA, "a")
      .unionByName(est(groupB, "b"))
      .unionByName(est((groupA ++ groupB).distinct, "u"))
    tagged.agg(
      max(when(col("__t") === "a", col("distinct_estimate"))).as("a_estimate"),
      max(when(col("__t") === "b", col("distinct_estimate"))).as("b_estimate"),
      max(when(col("__t") === "u", col("distinct_estimate"))).as("union_estimate"))
      // in the estimating regime two near-disjoint sets can land a hair
      // below zero — clamp; a negative cardinality is never the answer
      .withColumn("intersection_estimate",
        greatest(col("a_estimate") + col("b_estimate") - col("union_estimate"), lit(0L)))
  }

  /** Mergeable fixed-grid quantile sketch — the quantile member of the
    * sketch store family (HLL for distinct, moments for mean/variance,
    * this for percentiles). The grid anchors [lo, hi] are CALLER-PINNED
    * (the streaming z-order idiom): every independently-built batch
    * histograms onto the same `bins` cells, so stores merge by pure
    * count addition and merged-then-queried equals built-once —
    * history is never rescanned. Bin 0 catches v < lo and bin bins+1
    * catches v ≥ hi, so no value is ever dropped by a mis-pinned grid.
    * Unlike GK/KLL summaries the state is deterministic and
    * engine-portable: the same IEEE-754 expression computes the cell in
    * any engine, which is what makes the store DuckDB-replayable.
    * Resolution: a quantile answers as its cell's RIGHT edge, so the
    * error is ≤ (hi−lo)/bins — pick bins for the precision the
    * question needs (state is O(groups · bins), kilobytes at 4096).
    */
  def quantileSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(groupCols.nonEmpty, "sketch groups required")
    require(bins > 0, "bins must be positive")
    require(lo < hi, "need lo < hi grid anchors")
    val v = col(valueCol).cast("double")
    val cell = least(greatest(
      floor((v - lit(lo)) / lit(hi - lo) * lit(bins)), lit(-1L)), lit(bins.toLong)) + 1L
    df.filter(v.isNotNull)
      .groupBy((groupCols.map(col) :+ cell.as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge saved quantile-sketch rows (optionally regrouped on a coarser
    * key): pure count addition on (group, bin).
    */
  def mergeQuantileSketches(
      sketches: DataFrame,
      groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Answer quantiles from a (merged) store: per group and requested q,
    * the right edge of the first cell whose cumulative count reaches
    * ⌈q·n⌉. The cumulative window runs over the STORE — an O(groups ·
    * bins) aggregate, never the data — so the partitionless total is
    * bounded by construction. Output: [group…, q, est].
    */
  def sketchQuantiles(
      store: DataFrame,
      groupCols: Seq[String],
      lo: Double,
      hi: Double,
      bins: Int,
      qs: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "sketch groups required")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val g = Window.partitionBy(groupCols.map(col): _*)
    val cum = store
      .withColumn("__cum", sum(col("cnt")).over(g.orderBy(col("bin"))))
      .withColumn("__n", sum(col("cnt")).over(g))
      .withColumn("q", explode(array(qs.map(lit): _*)))
    cum.filter(col("__cum") >= ceil(col("q") * col("__n")))
      .groupBy((groupCols.map(col) :+ col("q")): _*)
      .agg(min(col("bin")).as("__qbin"))
      .withColumn("est",
        when(col("__qbin") <= 0, lit(lo))
          .when(col("__qbin") >= bins + 1, lit(hi))
          .otherwise(lit(lo) + lit(hi - lo) * col("__qbin") / lit(bins)))
      .drop("__qbin")
  }
}
