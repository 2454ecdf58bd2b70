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
}
