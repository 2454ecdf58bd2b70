package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join utility. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin) is the first line of defence at
  * runtime; explicit salting remains the deterministic tool when a few
  * keys dominate a shuffle join and the small side can absorb an
  * replication factor:
  *
  * - fact side gets a uniform salt in [0, saltFactor),
  * - dim side is exploded saltFactor× with every salt value,
  * - the join key becomes (key, salt): hot keys spread over saltFactor
  *   reducers instead of one.
  */
object SkewJoin {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 2, "saltFactor must be >= 2")
    val salted = fact.withColumn("__salt",
      (rand(42L) * saltFactor).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
