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

  test("bench-parameter recall floors: q_ann_recall/q_pq_recall configs can't regress silently") {
    // q_ann_recall and q_pq_recall hash-match whatever recall the bench
    // parameters MEASURE — a parameter or codepath change shipping a
    // low-recall index would still produce a green oracle row. These
    // floors pin the bench configs themselves (nprobe = 3 of 8,
    // quantized 5-iter Lloyd, fitSample 10k — all deterministic paths,
    // so the measured values are exact and reproducible): IVF@3 measures
    // 0.6693 and IVF-PQ@3 0.1013 on the near-random sf0.001 fixture
    // (PQ's honest worst case). A drop below the floors is a real
    // regression, not noise.
    val k = 3
    val bruteCos = pairSet(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = k),
      "vec_id", "neighbor_id")
    val ann = pairSet(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = k, cellCount = 8,
        nprobe = 3, fitSample = 10000, lloydIters = 5, lloydQuantize = 4),
      "vec_id", "neighbor_id")
    val annRecall = (bruteCos intersect ann).size.toDouble / bruteCos.size
    assert(annRecall >= 0.6, f"bench-config IVF recall@$k regressed: $annRecall%.3f")
    val bruteL2 = pairSet(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = k, metric = "l2"),
      "vec_id", "neighbor_id")
    val pq = pairSet(
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = k, cellCount = 8,
        nprobe = 3, m = 4, ksub = 16, fitSample = 10000, lloydIters = 5,
        lloydQuantize = 4),
      "vec_id", "neighbor_id")
    val pqRecall = (bruteL2 intersect pq).size.toDouble / bruteL2.size
    assert(pqRecall >= 0.08, f"bench-config IVF-PQ recall@$k regressed: $pqRecall%.3f")
  }

  test("bench-parameter IVF recall >= 0.8 on a clustered (structured) fixture") {
    // the near-random fixture bounds the worst case; real embedding
    // corpora are clustered, and there the bench nprobe must deliver —
    // 16 well-separated centers, 32 members each, deterministic integer
    // jitter. Every vector's true top-3 lives in its own cluster, so an
    // IVF probe that keeps >= 0.8 recall here proves the cell routing is
    // doing its job (losses are only cluster-straddling cells).
    import spark.implicits._
    val dim = 16
    val clustered = (0 until 512).map { i =>
      val c = i % 16
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c) 10.0f else 0.0f
        base + ((i * 31 + d * 17) % 7 - 3) * 0.05f
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val brute = pairSet(
      Similarity.bruteForceTopK(clustered, "vec_id", "embedding", k = 3),
      "vec_id", "neighbor_id")
    val ann = pairSet(
      Similarity.ivfTopK(clustered, "vec_id", "embedding", k = 3, cellCount = 8,
        nprobe = 3, fitSample = 10000, lloydIters = 5, lloydQuantize = 4),
      "vec_id", "neighbor_id")
    val recall = (brute intersect ann).size.toDouble / brute.size
    assert(recall >= 0.8, f"bench-config IVF recall on clustered fixture: $recall%.3f")
  }

  test("pq codes: complete, in-range, and invariant under partition layout") {
    val m = 4; val ksub = 16
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", m = m, ksub = ksub)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    val n = emb.count()
    assert(codes.size == n * m, s"expected ${n * m} (vector, subspace) codes, got ${codes.size}")
    assert(codes.values.forall(c => c >= 0 && c < ksub))
    val reshuffled = Similarity.pqEncode(emb.repartition(13), "vec_id", "embedding",
      m = m, ksub = ksub)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    assert(reshuffled == codes, "pq codes changed under a different partition layout")
  }

  test("ivf-pq planted exact copies: identical codes, rank-1 at the ADC floor") {
    // an exact copy shares all m codes AND the coarse cell with its
    // source, so its ADC distance equals the query's own reconstruction
    // distance — Σ_s min_c table(s)(c), the minimum ANY code tuple can
    // reach. Distinct vectors can land on the same argmin tuple (4×16
    // centroids is a coarse grid), in which case the id tie-break may
    // rank one of them first — so the sharp invariants are code equality
    // and rank-1 sitting exactly at the floor, not neighbor identity.
    val planted = emb.filter(col("vec_id") % 5 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000)
    val corpus = emb.unionByName(planted)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", m = 4, ksub = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getInt(2)).toSeq }
    val top = Similarity.ivfPqTopK(corpus, "vec_id", "embedding", k = 1,
      cellCount = 8, nprobe = 1, m = 4, ksub = 16)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val plantedIds = planted.select("vec_id").collect().map(_.getLong(0))
    assert(plantedIds.nonEmpty)
    plantedIds.foreach { pid =>
      assert(codes(pid) == codes(pid - 1000000),
        s"copy $pid codes ${codes(pid)} != source codes ${codes(pid - 1000000)}")
      // rank-1 of both the copy and its source must carry the exact code
      // tuple of the pair (tied members are interchangeable at the floor)
      Seq(pid, pid - 1000000).foreach { q =>
        val (nb, _) = top(q)
        assert(codes(nb) == codes(q),
          s"query $q rank-1 $nb has codes ${codes(nb)}, not the floor tuple ${codes(q)}")
      }
    }
  }

  test("ivf-pq ADC recall against exact L2 top-k") {
    val k = 10
    // exact L2 ground truth on the fixture (driver-side O(N²) is fine at
    // this size)
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    val exact = all.flatMap { case (id, v) =>
      all.filter(_._1 != id)
        .map { case (oid, ov) => (oid, l2(v, ov)) }
        .sortBy { case (oid, d) => (d, oid) }
        .take(k).map { case (oid, _) => (id, oid) }
    }.toSet
    // nprobe = all cells isolates the PQ quantization loss from the IVF
    // probe loss. Near-random 64-dim vectors are PQ's worst case (no
    // cluster structure for the codebooks to exploit — 4×4-bit codes
    // measure ~0.17 recall@10 here), so the honest floor is low; the
    // planted-copy test above is the sharp gate, this one guards against
    // the scoring loop regressing into nonsense and pins the
    // finer-codebooks-recover-more monotonicity
    val adc = pairSet(
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = k, cellCount = 8,
        nprobe = 8, m = 4, ksub = 16),
      "vec_id", "neighbor_id")
    val recall = (exact intersect adc).size.toDouble / exact.size
    assert(recall >= 0.1, f"ADC recall@$k too low: $recall%.3f")
    // finer codebooks must not hurt: doubling m and ksub has to recover
    // strictly more of the exact neighbors on this fixture
    val adcFine = pairSet(
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = k, cellCount = 8,
        nprobe = 8, m = 8, ksub = 32),
      "vec_id", "neighbor_id")
    val recallFine = (exact intersect adcFine).size.toDouble / exact.size
    assert(recallFine > recall,
      f"finer PQ codebooks did not improve recall: $recallFine%.3f <= $recall%.3f")
  }

  test("saved ivf-pq index: self-probe at the floor, salt-split invariance, dim guard") {
    val (model, lists) = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      cellCount = 8, m = 4, ksub = 16)
    // probing the corpus against its own index: rank-1 is the query's own
    // stored entry (no self-exclusion in serving) or a code-tuple tie
    // with a lower id — either way the rank-1 ADC distance equals the
    // query's reconstruction distance, which self-probing must reach
    val top = Similarity.annAgainstIndex(emb, "vec_id", "embedding", model, lists,
      k = 1, nprobe = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val selfD = Similarity.annAgainstIndex(emb, "vec_id", "embedding", model, lists,
      k = 200, nprobe = 1)
      .filter(col("query_id") === col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // self-checking coverage: every query's own entry must fall inside
    // the k-window — otherwise the floor assertion silently shrinks its
    // scope as fixtures or cell occupancy grow
    assert(selfD.keySet == top.keySet,
      s"self rows missing for ${(top.keySet diff selfD.keySet).take(5)} — raise k")
    selfD.foreach { case (id, d) =>
      assert(top(id)._2 == d,
        s"query $id rank-1 adist ${top(id)._2} != its reconstruction distance $d")
    }
    // a hot-cell build (cap forces an id-hash salt split) must serve the
    // exact same results — salting only re-shards the cogroup
    val (modelS, listsS) = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      cellCount = 8, m = 4, ksub = 16, memberCapPerCell = 5)
    assert(listsS.agg(org.apache.spark.sql.functions.max(col("salt"))).head().getInt(0) > 0,
      "cap of 5 should force multiple salts")
    val topS = Similarity.annAgainstIndex(emb, "vec_id", "embedding", modelS, listsS,
      k = 1, nprobe = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(topS == top, "salted index serves different results")
    // mismatched geometry fails fast instead of silently mis-scoring
    val truncated = emb.withColumn("embedding",
      org.apache.spark.sql.functions.slice(col("embedding"), 1, 32))
    val (shortModel, shortLists) = Similarity.buildIvfPqIndex(truncated,
      "vec_id", "embedding", cellCount = 8, m = 4, ksub = 16)
    val half = shortModel.filter(col("kind") === "book")
    intercept[IllegalArgumentException] {
      Similarity.annAgainstIndex(emb, "vec_id", "embedding",
        model.filter(col("kind") === "cell").unionByName(half), shortLists, k = 1)
    }
  }
}
