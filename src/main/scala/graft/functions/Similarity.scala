package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  * Baseline: brute-force cosine top-k (block-nested self-join — exact).
  * Scale path: random-hyperplane LSH bucketing so the self-join only
  * happens inside buckets (recall/speed trade controlled by #planes).
  * Dot products use `zip_with` + `aggregate` (codegen'd higher-order
  * functions, no UDF).
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a Catalyst expression over two float arrays; elements are
    * widened to double BEFORE the multiply (float·float would lose
    * precision and diverge from any double-math oracle).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force cosine top-k neighbours for every vector.
    * Norms are precomputed once (no repeated per-pair norm work); the
    * self-join is the O(n²) baseline — correct at any scale but meant
    * for validation and small n. Output: vec_id, neighbor_id, cos (round
    * 4), rank 1..k.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    val withNorm = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val pairs = withNorm.as("a").join(withNorm.as("b"), col("a.id") =!= col("b.id"))
      .select(
        col("a.id").as("vec_id"),
        col("b.id").as("neighbor_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d →
    * a value in [-1, 1) derived from a 64-bit mix of (seed, p, d).
    * Driver-side O(planes × dim), broadcast as literals.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (p, d) =>
      var z = seed + p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }

  /** Sign-bit signature of a vector against the hyperplanes → bucket id.
    * Vectors in the same bucket are likely neighbours (SRP-LSH).
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(vec, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: bucket with `numPlanes` sign bits, self-join
    * within buckets only (hash-partitioned — the 100 TB path), then rank.
    * Multi-probe: each vector also joins buckets at hamming distance 1
    * for recall (probe expansion on the smaller signature side).
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      numPlanes: Int = 8,
      seed: Long = 42L,
      multiProbe: Boolean = true): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(numPlanes, dim, seed)
    val withNorm = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val probes =
      if (!multiProbe) withNorm.withColumn("probe", col("bucket"))
      else {
        val flips = (0 until numPlanes).map(i => col("bucket").bitwiseXOR(shiftleft(lit(1L), i)))
        withNorm.withColumn("probe", explode(array((col("bucket") +: flips): _*)))
      }
    val pairs = probes.as("a")
      .join(withNorm.as("b"), col("a.probe") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .distinct()
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }
}
