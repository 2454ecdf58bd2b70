package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ref: data_ingest/data_sampling.py:8-149 `data_sample`.
  * Random or stratified sampling; stratified modes:
  *  - "population": proportional (same fraction in every stratum),
  *  - "balanced": equalize strata to fraction * smallest-stratum size.
  * Strata key is the concat of the strata columns (ref :128-146); strata
  * counts are one distributed agg, the fractions map is O(#strata) driver
  * state, and the sample itself is a single `sampleBy` pass (no shuffle).
  */
object Sampling {

  private val sep = ""

  def dataSample(
      df: DataFrame,
      fraction: Double = 0.1,
      method: String = "random",
      strataCols: Seq[String] = Nil,
      stratifiedType: String = "population",
      seed: Long = 42L,
      maxStrata: Int = 10000): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    method match {
      case "random" => df.sample(withReplacement = false, fraction, seed)
      case "stratified" =>
        require(strataCols.nonEmpty, "stratified sampling needs strata columns")
        // ref data_sampling: strata columns whose cardinality would blow
        // up the fraction map are skipped from the key (high-cardinality
        // strata skipped); if none survive, degrade to random sampling
        val perColCap = math.max(2, maxStrata / strataCols.size)
        val cardExprs = strataCols.map(c => countDistinct(col(c)).as(c))
        val cardRow = df.agg(cardExprs.head, cardExprs.tail: _*).collect()(0)
        val usable = strataCols.filter(c => cardRow.getAs[Long](c) <= perColCap)
        if (usable.isEmpty)
          return df.sample(withReplacement = false, fraction, seed)
        val keyed = df.withColumn(
          "__stratum",
          concat_ws(sep, usable.map(c => col(c).cast("string")): _*))
        val counts = keyed.groupBy("__stratum").count().collect()
        require(counts.length <= maxStrata,
          s"too many strata (${counts.length} > $maxStrata) — refusing driver-side fraction map")
        val fractions: Map[String, Double] = stratifiedType match {
          case "population" => counts.map(r => r.getString(0) -> fraction).toMap
          case "balanced" =>
            val minCount = counts.map(_.getLong(1)).min.toDouble
            counts.map { r =>
              r.getString(0) -> math.min(1.0, fraction * minCount / r.getLong(1))
            }.toMap
          case t => throw new IllegalArgumentException(s"unknown stratified type: $t")
        }
        keyed.stat.sampleBy("__stratum", fractions, seed).drop("__stratum")
      case m => throw new IllegalArgumentException(s"unknown sampling method: $m")
    }
  }

  /** 60-bit hex threshold encoding `fraction`: a row whose
    * `substring(md5(key.cast("binary")), 1, 15)` sorts strictly below it is kept.
    * md5 is bit-identical across engines and languages, so the kept set
    * is exactly reproducible anywhere — this is what makes the sample
    * oracle-verifiable AND stable under repartitioning, retries, and
    * cluster size, none of which holds for seeded-RNG `sample()` (whose
    * output depends on partition layout).
    */
  def hashThresholdHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    if (fraction >= 1.0) "g" // sorts above every hex digest prefix
    else {
      val thr = math.floor(fraction * (1L << 60)).toLong
      f"$thr%015x"
    }
  }

  /** Same threshold as a long on the 60-bit hash space — the numeric
    * twin of [[hashThresholdHex]] for the native `md5_prefix60`
    * expression (fixed-width lowercase-hex string order ≡ numeric
    * order, so both comparisons keep the identical row set).
    */
  def hashThresholdLong(fraction: Double): Long = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    if (fraction >= 1.0) 1L << 60
    else math.floor(fraction * (1L << 60)).toLong
  }

  /** md5-prefix hash of the concatenated key columns via the fused
    * native `md5_prefix60` expression (no 32-char hex string built and
    * re-parsed per row; stays in whole-stage codegen).
    */
  private def keyHash(df: DataFrame, keyCols: Seq[String]): org.apache.spark.sql.Column = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val parts = keyCols.map(c => s"cast(`$c` as string)").mkString(", ")
    expr(s"md5_prefix60(cast(concat_ws('', $parts) as binary))")
  }

  /** Deterministic content-hash sampling: keep rows whose md5(key-expr)
    * prefix falls below [[hashThresholdHex]](fraction). Map-only — no
    * shuffle, no driver state, no RNG; the same document is kept or
    * dropped identically at any scale and on any engine, which is the
    * sampling primitive a 100 TB training-data pipeline actually wants
    * (stable holdout sets, reproducible subsampling across reruns).
    * The key columns should identify the entity being sampled (a doc id,
    * a user id for leakage-safe user-level splits, …).
    */
  def deterministicSample(df: DataFrame, fraction: Double, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "deterministic sampling needs key columns")
    df.filter(keyHash(df, keyCols) < lit(hashThresholdLong(fraction)))
  }

  /** Deterministic stratified sampling with EXACT per-stratum sizes:
    * rows rank by md5-prefix hash inside their stratum and the lowest
    * `target` ranks are kept —
    *  - "population": target = ⌊fraction · stratum size⌋ (proportional),
    *  - "balanced":   target = ⌊fraction · smallest-stratum size⌋ for
    *    every stratum (equalized — the ref's balanced contract,
    *    data_sampling.py:128-146, but exact instead of Bernoulli).
    * No RNG anywhere: the kept set is a pure function of the key
    * columns, so it is reproducible across engines (DuckDB replays it
    * row-for-row), reruns, and cluster layouts.
    *
    * Scale: one shuffle by stratum for the rank window, and in BOTH
    * modes the rank filter compares against a LITERAL so Spark's
    * WindowGroupLimit pushes a per-stratum top-k below the exchange —
    * each map task ships at most target rows per stratum, never a hot
    * stratum's full sort. Population mode gets its exact per-stratum
    * targets from a first-pass aggregate (strata cols only — column-
    * pruned scan, map-side combined) broadcast-joined back; the literal
    * pre-filter uses the LARGEST stratum's target, which every
    * per-stratum target is ≤ to, so the exact filter only tightens it.
    * Driver state is O(1) (one max/min count) in both modes. For
    * heavily skewed strata where even ⌊fraction·hottest⌋ rows per map
    * task is too much, prefer the threshold-based
    * [[deterministicSample]] per stratum (approximate sizes).
    *
    * Rows with a NULL in any strata column are dropped, matching the
    * reference's stratified sampler (data_sampling.py na.drop on the
    * strata columns); this also keeps genuinely-empty-string strata
    * from colliding with nulls in the concat key.
    */
  def deterministicStratifiedSample(
      df: DataFrame,
      fraction: Double,
      strataCols: Seq[String],
      keyCols: Seq[String],
      stratifiedType: String = "population"): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    require(strataCols.nonEmpty && keyCols.nonEmpty, "strata and key columns required")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.na.drop("any", strataCols).withColumn("__stratum",
      concat_ws(sep, strataCols.map(c => col(c).cast("string")): _*))
    val h = keyHash(df, keyCols)
    // tie-break through every remaining column: rows sharing the key
    // columns still rank deterministically (fully identical rows are
    // interchangeable, so the kept MULTISET stays a pure function of the
    // data even when keyCols aren't unique)
    val tieCols = keyCols ++ df.columns.filterNot(keyCols.contains)
    val w = Window.partitionBy(col("__stratum"))
      .orderBy((h.asc +: tieCols.map(c => col(c).asc)): _*)
    val ranked = keyed.withColumn("__rn", row_number().over(w))
    stratifiedType match {
      case "population" =>
        val counts = keyed.groupBy("__stratum").agg(count(lit(1)).as("__cnt"))
        val maxRow = counts.agg(max("__cnt")).first()
        if (maxRow.isNullAt(0)) return df.limit(0) // empty input
        val capLit = math.floor(fraction * maxRow.getLong(0)).toLong
        val targets = counts
          .select(col("__stratum"), floor(lit(fraction) * col("__cnt")).as("__t"))
        ranked
          .filter(col("__rn") <= lit(capLit)) // literal → WindowGroupLimit
          .join(broadcast(targets), Seq("__stratum"))
          .filter(col("__rn") <= col("__t")) // exact proportional target
          .drop("__stratum", "__rn", "__t")
      case "balanced" =>
        val minRow = keyed.groupBy("__stratum").count().agg(min("count")).first()
        if (minRow.isNullAt(0)) return df.limit(0) // empty input
        val target = math.floor(fraction * minRow.getLong(0)).toLong
        ranked
          .filter(col("__rn") <= lit(target))
          .drop("__stratum", "__rn")
      case t => throw new IllegalArgumentException(s"unknown stratified type: $t")
    }
  }

  /** Deterministic train/validation/test split: assigns each row a split
    * label from cumulative md5-prefix thresholds. One map-only pass, the
    * same row lands in the same split forever (append-safe at 100 TB).
    * `weights` need not sum to 1; they are normalized.
    */
  def deterministicSplit(
      df: DataFrame,
      weights: Seq[(String, Double)],
      keyCols: Seq[String]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0)(_ + _._2 / total).tail
    val h = keyHash(df, keyCols)
    val labeled = weights.zip(cum).init.foldRight(lit(weights.last._1)) {
      case (((name, _), cumW), elseCol) =>
        when(h < lit(hashThresholdLong(cumW)), lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", labeled)
  }
}
