package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ref: drift_stability/stability.py:335-589
  * `feature_stability_estimation` — estimate a derived feature's
  * stability across periods from the BASE attributes' per-period
  * mean/stddev, without recomputing the feature on the raw data.
  *
  * The reference symbolically differentiates the formula with sympy and
  * applies 2nd-order Taylor propagation; here the same first/second
  * moments are propagated with central finite differences of the Spark
  * SQL expression (evaluated via a 1-row local plan — no symbolic
  * engine, same contract: metadata in, stability metrics out).
  */
object StabilityEstimation {

  final case class AttrStats(mean: Double, stddev: Double)

  /** Per-period propagated (mean, stddev) of `formula` given per-period
    * base-attribute stats; first-order: Var(f) ≈ Σ (∂f/∂xᵢ)²·σᵢ², with
    * the gradient from central differences at the period means.
    *
    * All probe points — per period: the center plus ±h along each
    * attribute — evaluate in ONE local-relation Spark job (the earlier
    * shape ran a 1-row job per probe: 2·|attrs|·|periods| scheduler
    * round-trips for a metadata-only operator). Attributes contribute to
    * the variance sum in sorted-name order so the float accumulation is
    * deterministic and oracle-reproducible.
    */
  def propagate(
      spark: SparkSession,
      formula: String,
      periodStats: Seq[Map[String, AttrStats]]): Seq[AttrStats] = {
    if (periodStats.isEmpty) return Nil
    val attrs = periodStats.head.keys.toSeq.sorted
    // probe rows: (period, probedAttr or "" for the center, sign, attr values…)
    val probes: Seq[(Int, String, Int, Seq[Double])] =
      periodStats.zipWithIndex.flatMap { case (stats, pi) =>
        val means = attrs.map(a => stats(a).mean)
        val center = (pi, "", 0, means)
        val shifted = attrs.flatMap { a =>
          val s = stats(a)
          val h = math.max(1e-6, math.abs(s.mean) * 1e-4)
          Seq(1, -1).map { sign =>
            (pi, a, sign,
              attrs.map(x => if (x == a) s.mean + sign * h else stats(x).mean))
          }
        }
        center +: shifted
      }
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    val schema = StructType(
      Seq(StructField("__period", IntegerType), StructField("__attr", StringType),
        StructField("__sign", IntegerType)) ++
        attrs.map(a => StructField(a, DoubleType)))
    val probeDf = spark.createDataFrame(
      java.util.Arrays.asList(probes.map { case (p, a, s, vs) =>
        SRow.fromSeq(Seq(p, a, s) ++ vs) }: _*), schema)
    val evaluated = probeDf
      .selectExpr("__period", "__attr", "__sign", s"cast(($formula) as double) as __f")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    periodStats.zipWithIndex.map { case (stats, pi) =>
      val f0 = evaluated((pi, "", 0))
      val varF = attrs.map { a =>
        val s = stats(a)
        val h = math.max(1e-6, math.abs(s.mean) * 1e-4)
        val grad = (evaluated((pi, a, 1)) - evaluated((pi, a, -1))) / (2 * h)
        grad * grad * s.stddev * s.stddev
      }.sum
      AttrStats(f0, math.sqrt(varF))
    }
  }

  /** Full estimation: propagate per period, then score with the same
    * CV → SI mapping as Drift.stabilityIndex.
    */
  def featureStabilityEstimation(
      spark: SparkSession,
      formula: String,
      periodStats: Seq[Map[String, AttrStats]]): DataFrame = {
    import spark.implicits._
    // per-period propagated moments are snapped to a 1e-6 grid before the
    // CV: their inputs (per-period avg/stddev) are order-of-summation
    // dependent in the last ulps, and the grid makes the CV chain
    // reproducible across engines (the magnitudes here are O(1..1e4), so
    // 1e-6 is far above double noise and far below signal)
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val props = propagate(spark, formula, periodStats).map(p => AttrStats(r6(p.mean), r6(p.stddev)))
    def cv(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
      math.abs(sd / m)
    }
    def si(v: Double): Int =
      if (v < 0.03) 4 else if (v < 0.1) 3 else if (v < 0.2) 2 else if (v < 0.5) 1 else 0
    // classify on the ROUNDED cv (the reported value): an unrounded cv a
    // few ulps under a threshold otherwise lands in a different SI class
    // than an engine whose cv is a few ulps over (observed at sf0.001:
    // cv_stddev exactly 0.1000 split 3 vs 2)
    val cvMean = math.rint(cv(props.map(_.mean)) * 10000) / 10000
    val cvSd = math.rint(cv(props.map(_.stddev)) * 10000) / 10000
    val idx = 0.5 * si(cvMean) + 0.5 * si(cvSd)
    Seq((formula, cvMean, cvSd, si(cvMean), si(cvSd), idx))
      .toDF("formula", "cv_mean", "cv_stddev", "mean_si", "stddev_si", "stability_index_lower_bound")
  }
}
