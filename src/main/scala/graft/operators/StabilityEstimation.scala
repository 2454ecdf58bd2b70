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

  /** Evaluate a SQL expression at a driver-side point. */
  private def evalAt(spark: SparkSession, exprStr: String, point: Map[String, Double]): Double = {
    import spark.implicits._
    val row = Seq(1).toDF("__one")
    val withVars = point.foldLeft(row) { case (d, (k, v)) =>
      d.withColumn(k, org.apache.spark.sql.functions.lit(v))
    }
    val r = withVars.selectExpr(s"cast(($exprStr) as double) as __r").first()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** Per-period propagated (mean, stddev) of `formula` given per-period
    * base-attribute stats; first-order: Var(f) ≈ Σ (∂f/∂xᵢ)²·σᵢ², with
    * the gradient from central differences at the period means.
    */
  def propagate(
      spark: SparkSession,
      formula: String,
      periodStats: Seq[Map[String, AttrStats]]): Seq[AttrStats] =
    periodStats.map { stats =>
      val means = stats.map { case (k, v) => k -> v.mean }
      val f0 = evalAt(spark, formula, means)
      val varF = stats.map { case (k, s) =>
        val h = math.max(1e-6, math.abs(s.mean) * 1e-4)
        val up = evalAt(spark, formula, means.updated(k, s.mean + h))
        val dn = evalAt(spark, formula, means.updated(k, s.mean - h))
        val grad = (up - dn) / (2 * h)
        grad * grad * s.stddev * s.stddev
      }.sum
      AttrStats(f0, math.sqrt(varF))
    }

  /** Full estimation: propagate per period, then score with the same
    * CV → SI mapping as Drift.stabilityIndex.
    */
  def featureStabilityEstimation(
      spark: SparkSession,
      formula: String,
      periodStats: Seq[Map[String, AttrStats]]): DataFrame = {
    import spark.implicits._
    val props = propagate(spark, formula, periodStats)
    def cv(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
      math.abs(sd / m)
    }
    def si(v: Double): Int =
      if (v < 0.03) 4 else if (v < 0.1) 3 else if (v < 0.2) 2 else if (v < 0.5) 1 else 0
    val cvMean = cv(props.map(_.mean))
    val cvSd = cv(props.map(_.stddev))
    val idx = 0.5 * si(cvMean) + 0.5 * si(cvSd)
    Seq((formula,
      math.rint(cvMean * 10000) / 10000, math.rint(cvSd * 10000) / 10000,
      si(cvMean), si(cvSd), idx))
      .toDF("formula", "cv_mean", "cv_stddev", "mean_si", "stddev_si", "stability_index_lower_bound")
  }
}
