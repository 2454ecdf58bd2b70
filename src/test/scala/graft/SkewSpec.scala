package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._

/** Skew stress for the dedup pipeline: zipf-distributed duplicate-cluster
  * sizes (the shape real crawl corpora have — a few enormous boilerplate
  * clusters, a long tail of pairs) and a long-chain component that a plain
  * O(diameter) label propagation cannot close in bounded rounds. These are
  * the two ways near-dup clustering falls over at 100 TB: hot LSH buckets
  * (quadratic candidate blowup) and high-diameter duplicate graphs
  * (unbounded iteration count).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("pointer doubling closes a 300-link chain within 12 rounds") {
    // plain neighbour-min propagation needs ~300 rounds on this graph;
    // with the label-of-label shortcut 12 suffice (2^12 ≫ 300). Forcing
    // maxLocalEdges=0 keeps us off the driver union-find fast path, and a
    // wrong/unconverged labeling fails the exact-label assert below.
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("key_1", "key_2")
    val labels = Dedup.duplicateClusters(chain, maxIter = 12, maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 301)
    assert(labels.values.forall(_ == 0L), "every chain node must label to the min key 0")
  }

  test("zipf(1.2) cluster sizes: capped candidates, exact clusters, bounded time") {
    // cluster r (r = 1..25) has ceil(120 / r^1.2) members sharing one
    // text — a discrete zipf over cluster sizes. Identical members land
    // in the same bucket in EVERY band, so the hottest cluster is also
    // the hottest LSH bucket.
    val sizes = (1 to 25).map(r => math.max(2, math.ceil(120.0 / math.pow(r, 1.2)).toInt))
    val docs = sizes.zipWithIndex.flatMap { case (sz, r) =>
      val base = s"zipf cluster $r " +
        (0 until 25).map(w => s"boilerplate${(r * 31 + w) % 97} token$w").mkString(" ")
      (0 until sz).map(i => (r * 10000L + i, base))
    }.toDF("doc_id", "text")

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    // identical-text clusters produce exactly the complete graph per
    // cluster and nothing across clusters — candidate generation stayed
    // bucket-local even with the zipf head
    val expected = sizes.map(m => m.toLong * (m - 1) / 2).sum
    assert(nPairs == expected, s"expected $expected intra-cluster pairs, got $nPairs")

    val labels = Dedup.duplicateClusters(
      pairs.select(col("key_1"), col("key_2")), maxIter = 12, maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.unpersist()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(labels.size == sizes.sum)
    sizes.zipWithIndex.foreach { case (sz, r) =>
      (0 until sz).foreach { i =>
        assert(labels(r * 10000L + i) == r * 10000L, s"member $i of cluster $r mislabeled")
      }
    }
    // generous wall-clock gate (local[2]): a quadratic hot-bucket blowup
    // or O(diameter) propagation would blow far past this
    assert(secs < 120, s"zipf dedup took $secs s — skew handling regressed")
  }

  test("bucket above the cap is dropped from candidates; exactDedup owns it") {
    // one 300-member IDENTICAL cluster with the default maxBucketSize=200:
    // identical docs share the same bucket in every band, so the oversized
    // bucket is excluded from candidate generation entirely (the documented
    // contract — true exact duplicates belong in exactDedup, and near-dups
    // stay reachable through their other band buckets). This is the guard
    // that keeps one boilerplate bucket from going quadratic at 100 TB.
    val docs = (0 until 300).map(i =>
      (i.toLong, "hot boilerplate " + (0 until 30).map(w => s"tok$w").mkString(" ")))
      .toDF("doc_id", "text")
    val nPairs = Dedup.minhashNearDuplicates(docs, "text", "doc_id").count()
    assert(nPairs == 0, s"oversized identical bucket must be dropped, got $nPairs pairs")
    // the exact path still collapses the cluster to one representative
    assert(Dedup.exactDedup(docs, "text", "doc_id").count() == 1)
  }

  test("simhash chunk-bucket cap drops identical-fingerprint hot buckets") {
    // 30 identical docs share every chunk bucket; with maxBucketSize = 5
    // those buckets drop whole (exactDedup's job), while a genuinely
    // near-dup pair in its own small buckets still surfaces
    val boiler = (0 until 40).map(w => s"w$w").mkString(" ")
    // 60 shared tokens + one differing: the lone edit shifts few bit
    // votes, keeping the pair inside the hamming budget
    val base = (0 until 60).map(w => s"u$w").mkString(" ")
    val docs = ((0 until 30).map(i => (i.toLong, boiler)) ++ Seq(
      (100L, s"$base alpha"),
      (101L, s"$base beta")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDuplicatesMd5(docs, "text", "doc_id",
      maxHamming = 10, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a >= 100L && b >= 100L },
      s"hot identical bucket leaked pairs: $pairs")
    assert(pairs.contains((100L, 101L)), s"near-dup pair lost: $pairs")
  }

  test("random-walk candidate tables absorb hub degrees at O(maxNeighbors)") {
    import graft.functions.Graph
    import spark.implicits._
    // star: hub 0 with 400 leaves. The capped candidate table must hold
    // <= maxNeighbors entries for the hub (the bounded heap, never a
    // degree-sized sort), every leaf's single candidate is the hub, and
    // all 401 walks complete their full length — each step from the hub
    // picks among the same 8 hash-chosen leaves, so no walk strands or
    // fans out.
    val star = (1L to 400L).map(i => (0L, i)).toDF("src", "dst")
    val walks = Graph.randomWalks(star, walkLength = 4, walksPerNode = 1,
      maxNeighbors = 8, salt = "skew")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    val byStart = walks.groupBy(_._1)
    assert(byStart.size == 401 && byStart.values.forall(_.length == 5),
      "every node walks the full length")
    // leaves alternate leaf -> hub -> (capped leaf) -> hub -> ...: every
    // odd step from a leaf start is the hub, and every hub departure
    // lands in ONE fixed 8-leaf candidate set
    val hubDepartures = byStart.values.flatMap { rows =>
      rows.sortBy(_._2).map(_._3).toSeq.sliding(2).collect {
        case Seq(0L, next) => next
      }
    }.toSet
    assert(hubDepartures.size <= 8,
      s"hub must step into its <=8 capped candidates, saw ${hubDepartures.size}")
  }

  test("degree orientation bounds triangle wedge fan-out on a hub graph") {
    import graft.functions.Graph
    // power-law-ish star: hub 0 with 500 leaves. Under id-order
    // orientation the hub (id 0) would own all 500 out-edges and
    // generate C(500,2) ≈ 125k wedges; degree orientation points every
    // edge INTO the hub, so the hub generates zero.
    val star = (1L to 500L).map(i => (0L, i)).toDF("src", "dst")
    val canon = star.select(least(col("src"), col("dst")).as("lo"),
      greatest(col("src"), col("dst")).as("hi")).distinct()
    val outDeg = Graph.orientByDegree(canon)
      .groupBy("u").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).first().getLong(0)
    assert(outDeg == 1L, s"star must orient leaf->hub (max out-degree 1), got $outDeg")
    assert(Graph.triangleCounts(star).count() == 0, "a star has no triangles")

    // plant a leaf triangle 1-2-3: with the hub attached to all three,
    // the graph gains 4 triangles — (1,2,3) and (0,x,y) for each pair.
    // Counts must be exact, and the oriented out-degree stays tiny.
    val edges = star.unionAll(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    val tc = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc(0L) == 3L, s"hub sits in 3 triangles, got ${tc.get(0L)}")
    Seq(1L, 2L, 3L).foreach(n =>
      assert(tc(n) == 3L, s"node $n sits in 3 triangles, got ${tc.get(n)}"))
    assert(tc.size == 4, s"plain leaves sit in no triangle: $tc")
    val canon2 = edges.select(least(col("src"), col("dst")).as("lo"),
      greatest(col("src"), col("dst")).as("hi")).distinct()
    val outDeg2 = Graph.orientByDegree(canon2)
      .groupBy("u").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).first().getLong(0)
    assert(outDeg2 <= 3L, s"hub graph max oriented out-degree must stay tiny, got $outDeg2")
  }

  test("pagerank hub salting preserves ranks on a power-law out-degree graph") {
    import graft.functions.Graph
    // hub 0 points at 400 leaves (out-degree 400 >> everyone else's <= 3),
    // plus a sparse back-edge ring so mass circulates. Salting spreads the
    // hub's edges across the salt space; ranks must agree with the
    // unsalted sweep to fp-noise (same contributions, different partial
    // sum order).
    val edges = ((1L to 400L).map(i => (0L, i)) ++
      (1L to 400L).filter(_ % 10 == 0).map(i => (i, 0L)) ++
      (1L to 399L).map(i => (i, i + 1))).toDF("src", "dst")
    val plain = Graph.pageRank(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val saltedR = Graph.pageRank(edges, iterations = 4,
      saltDegreeThreshold = 100, saltFactor = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == saltedR.keySet)
    val worst = plain.map { case (k, v) => math.abs(v - saltedR(k)) }.max
    assert(worst < 1e-12, s"salted ranks diverged by $worst")
    // the hub actually qualified: a threshold above its degree must be
    // identical to the plain path bit-for-bit (salt column all zero)
    val offR = Graph.pageRank(edges, iterations = 4,
      saltDegreeThreshold = 1000, saltFactor = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(offR == plain)
  }

  test("weighted pagerank salting and weighted louvain stay hub-safe") {
    import graft.functions.Graph
    // the same power-law fixture with per-edge weights: hub salting must
    // preserve WEIGHTED ranks (the salt join carries the weight column),
    // and weighted louvain over a hub multigraph must stay
    // partition-invariant (its per-(node, community) kiin aggregate is
    // map-side combined — a hub costs one combiner row per neighbor
    // community, never one per weighted edge)
    val edges = ((1L to 400L).map(i => (0L, i, 1.0 + (i % 7))) ++
      (1L to 400L).filter(_ % 10 == 0).map(i => (i, 0L, 2.0)) ++
      (1L to 399L).map(i => (i, i + 1, 1.0 + (i % 3))))
      .toDF("src", "dst", "w")
    val plain = Graph.pageRank(edges, iterations = 4, weightCol = "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Graph.pageRank(edges, iterations = 4,
      saltDegreeThreshold = 100, saltFactor = 8, weightCol = "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == salted.keySet)
    val worst = plain.map { case (k, v) => math.abs(v - salted(k)) }.max
    assert(worst < 1e-12, s"weighted salted ranks diverged by $worst")
    // weights shift mass: the weighted ranks must differ from unweighted
    // (weights are non-uniform by construction)
    val unw = Graph.pageRank(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.exists { case (k, v) => math.abs(v - unw(k)) > 1e-9 })
    // weighted louvain on a star multigraph (hub 0, spoke weights 1..5):
    // identical assignment under a 13-way repartition
    val star = (1L to 200L).map(i => (0L, i, 1L + (i % 5))).toDF("src", "dst", "w")
    val a = Graph.louvainCommunities(star, rounds = 4, weightCol = "w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.louvainCommunities(star.repartition(13), rounds = 4, weightCol = "w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b, "weighted louvain not partition-invariant on the star")
  }

  test("bipartite projection caps a hub group at cap-choose-2 pairs") {
    import graft.functions.Graph
    // one hub group with 500 members + 50 small groups of 3: the raw
    // self-join would emit 124,750 hub pairs; the capped projection
    // emits exactly C(8,2) = 28 from the hub, chosen by salted hash —
    // deterministically, partition-invariantly
    val hub = (1L to 500L).map(r => (0L, r))
    val smalls = (1L to 50L).flatMap(g => (0L to 2L).map(i => (g, 1000 + g * 3 + i)))
    val mem = (hub ++ smalls).toDF("l", "r")
    val proj = Graph.projectBipartite(mem, "l", "r", maxPerGroup = 8, salt = "s")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // hub pairs: both endpoints <= 500
    assert(proj.count(p => p._1 <= 500 && p._2 <= 500) == 28)
    // each small group contributes C(3,2) = 3 pairs at weight 1
    assert(proj.count(p => p._1 > 1000) == 150)
    val re = Graph.projectBipartite(mem.repartition(11), "l", "r", 8, "s")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(proj.sorted.toSeq == re.sorted.toSeq, "not partition-invariant")
  }
}
