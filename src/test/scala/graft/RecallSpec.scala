package graft

import graft.functions.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantified quality gates for the approximate paths that have no SQL
  * oracle (ANN top-k, minhash banding): recall is measured against the
  * exact algorithm on the sf0.001 fixtures, so the "rows-only"
  * correctness rows carry a numeric bound instead of a shrug.
  */
class RecallSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a).cast("long"), col(b).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH top-k recall >= 0.9 against brute force on the embeddings fixture") {
    val k = 10
    val brute = pairSet(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = k),
      "vec_id", "neighbor_id")
    // single-table SRP on 64-dim near-random vectors recalls ~0.24 — the
    // multi-table amplification (union over 8 independent hyperplane
    // sets) is what makes the 0.9 bound reachable at bucketed-join cost
    val lsh = pairSet(
      Similarity.lshTopK(emb, "vec_id", "embedding", k = k,
        numPlanes = 4, numTables = 8),
      "vec_id", "neighbor_id")
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.9, f"SRP-LSH recall@$k too low: $recall%.3f")
  }

  test("IVF top-k recall >= 0.9 against brute force on the embeddings fixture") {
    val k = 10
    val brute = pairSet(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = k),
      "vec_id", "neighbor_id")
    val ivf = pairSet(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = k, cellCount = 8, nprobe = 6),
      "vec_id", "neighbor_id")
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, f"IVF recall@$k too low: $recall%.3f")
  }

  test("minhash near-dup recall >= 0.9 and perfect precision vs exact n-gram jaccard") {
    val threshold = 0.7
    // exact ground truth: every intersecting pair's true jaccard, one
    // block (no stop-shingle cap effects at 500 docs)
    val blocked = docs.withColumn("__all", lit(1))
    val exact = pairSet(
      Dedup.ngramJaccardPairs(blocked, "text", "doc_id", "__all",
        n = 3, threshold = threshold, maxShingleDf = Long.MaxValue),
      "key_1", "key_2")
    assert(exact.nonEmpty, "fixture has no planted near-duplicate pairs")
    val mh = pairSet(
      Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, numHashes = 32, bands = 16, threshold = threshold),
      "key_1", "key_2")
    val recall = (exact intersect mh).size.toDouble / exact.size
    assert(recall >= 0.9, f"minhash banding recall too low: $recall%.3f (${exact.size} true pairs)")
    // verification computes the exact jaccard on the same shingle space,
    // so every reported pair must be a true pair
    assert((mh diff exact).isEmpty, s"minhash reported false pairs: ${(mh diff exact).take(5)}")
  }
}
