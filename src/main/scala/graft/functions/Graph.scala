package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge frames — the domain-authority signal
  * web-corpus pipelines rank URLs/hosts with (CommonCrawl publishes
  * exactly this as harmonic/pagerank centrality per host). Spark-first:
  * every iteration is one join + one aggregate over the edge frame; no
  * vertex-program framework, no driver-side graph.
  */
object Graph {

  /** Fixed-iteration PageRank over (src, dst) edges, treated as a
    * weighted multigraph (duplicate edges carry multiplicity).
    * Deterministic: uniform init 1/N, `iterations` synchronous sweeps,
    * rank = (1−d)/N + d·Σ_in rank/outdeg. Fixed iteration count (not a
    * convergence test) keeps the result a pure function of the edges —
    * replayable by any engine (q_pagerank unrolls the same sweeps in
    * SQL CTEs).
    *
    * Scale: each sweep shuffles the edge frame once (join on src) and
    * aggregates contributions on dst — the canonical 2-shuffle
    * iteration. `checkpointEvery` truncates lineage for long runs
    * (iterative plans grow linearly deep; localCheckpoint keeps the
    * optimizer from re-analyzing the whole history each sweep).
    * Dangling nodes (no out-edges) simply contribute nothing — supply
    * symmetric edges if mass conservation matters.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 5,
      damping: Double = 0.85,
      checkpointEvery: Int = 0,
      broadcastRanks: Boolean = false): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    // persisted: every sweep re-reads all three — without the cache the
    // edge projection and the deg/nodes shuffles replay ~2× per
    // iteration from the source scan
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val base = lit(1.0) - lit(damping)
    // broadcastRanks trades per-sweep driver broadcast builds of the
    // NODE-sized rank/degree tables for an unshuffled edge frame — a
    // win only when edges ≫ nodes (huge-corpus host graphs); on the
    // test graph the reused shuffle exchanges measured ~25% FASTER, so
    // the default stays false
    def maybeBc(df: DataFrame): DataFrame = if (broadcastRanks) broadcast(df) else df
    var ranks = nodes.withColumn("rank", lit(1.0) / lit(n.toDouble))
    for (it <- 1 to iterations) {
      val contribs = e
        .join(maybeBc(ranks.withColumnRenamed("node", "src")), "src")
        .join(maybeBc(deg), "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (base / lit(n.toDouble) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (checkpointEvery > 0 && it % checkpointEvery == 0)
        ranks = ranks.localCheckpoint()
    }
    // materialize before releasing the cached inputs the plan reads
    val out = ranks.localCheckpoint()
    e.unpersist(false); deg.unpersist(false); nodes.unpersist(false)
    out
  }

  /** Per-node triangle counts over an undirected simple graph: edges
    * canonicalize to (lo < hi) distinct pairs, and each triangle
    * a < b < c is found exactly once by the two-hop join
    * e(a,b) ⋈ e(b,c) ⋈ e(a,c). Per-node counts explode each triangle
    * to its three corners and aggregate — all exact integers.
    *
    * Scale: the join fans out on high-degree vertices; the classic
    * mitigation (orient edges low-degree → high-degree before the
    * two-hop join) keeps per-vertex fanout O(max degree in the oriented
    * graph) = O(√|E|) on skewed graphs. Canonical a<b<c ordering is a
    * degenerate orientation that already avoids double counting; swap
    * in degree ordering when a hub dominates.
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("lo"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.hi") === col("bc.lo"))
      .join(e.as("ac"),
        col("ac.lo") === col("ab.lo") && col("ac.hi") === col("bc.hi"))
      .select(col("ab.lo").as("a"), col("ab.hi").as("b"), col("bc.hi").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
