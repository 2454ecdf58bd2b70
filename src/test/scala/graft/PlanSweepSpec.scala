package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan regression sweep over EVERY SparkEntry query: builds each query's
  * physical plan at sf0.001 and rejects the three patterns that silently
  * stop scaling at 100 TB —
  *   - CartesianProduct (all-pairs; nothing in the library needs one),
  *   - BroadcastNestedLoopJoin outside the explicit allowlist of
  *     asserted-intentional tiny-dim patterns (geo country boxes,
  *     broadcast scalar-bounds cross joins),
  *   - a partitionless Window directly over data-sized input (a global
  *     sort that funnels the table through one task). Partitionless
  *     windows over aggregated/limited frames are fine — those frames are
  *     O(groups), not O(rows) — so the check only fires when no
  *     Aggregate/Limit/Join sits between the Window and a raw file scan.
  * Catching these at spec time beats catching them in BENCH_r{N}: a plan
  * that regresses to one of them usually still PASSES correctness.
  */
class PlanSweepSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed a BroadcastNestedLoopJoin: each is a broadcast of a
    * provably tiny side (scalar bounds row, country-box dim table),
    * asserted intentional in GeoSpec / the query's scaladoc.
    */
  private val bnljAllow = Set(
    "q_geo_in_country_boxes",  // tiny country-box dim side (GeoSpec asserts)
    "q_embedding_quantize",    // crossJoin(broadcast(<1-row global min/max bounds>))
    "q_feature_recommender",   // crossJoin(broadcast(<1-row query-norm scalar>))
    "q_k_anonymity",           // crossJoin(broadcast(<1-row corpus-total scalar>)) — QualityChecker.kAnonymityAudit
    "q_keyword_tfidf",         // crossJoin(broadcast(<1-row doc-count N scalar>)) — TextOps.keywordTfidf
    "q_vocab_coverage",        // crossJoin(broadcast(<1-row token-total scalar>)) — TextOps.vocabCoverage
    "q_modularity",            // crossJoin of THREE 1-row aggregates (m, e_in, Σtot²) — Graph.modularity
    "q_graph_summary",         // crossJoin of 1-row aggregate profile frames — Graph.graphSummary
    "q_community_profile"      // crossJoin(<1-row total-weight 2m scalar>) — Graph.communityProfile
  )

  /** Queries allowed a partitionless Window over non-aggregated input:
    * each runs on a frame bounded by construction, not by aggregation.
    */
  private val globalWindowAllow = Set.empty[String]

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.inputPlan)
      case other                    => Seq(other)
    }
    self ++ p.children.flatMap(flatten) ++
      p.subqueries.flatMap(flatten)
  }

  /** True when `p`'s subtree reaches a leaf relation without passing an
    * Aggregate / Limit / row_number-capped window group limit — i.e. the
    * window input is O(table rows), not O(groups).
    */
  private def dataSized(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    def walk(n: SparkPlan): Boolean = n match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => false
      case _: org.apache.spark.sql.execution.GlobalLimitExec => false
      case _: org.apache.spark.sql.execution.LocalLimitExec => false
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => false
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case l if l.children.isEmpty => true // a raw leaf within reach
      case other => other.children.exists(walk)
    }
    walk(p)
  }

  test("no cartesian / unallowed BNLJ / global data-sized window in any query plan") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      val nodes = flatten(plan)
      nodes.foreach {
        case _: CartesianProductExec =>
          offenders += s"$name: CartesianProduct"
        case _: BroadcastNestedLoopJoinExec if !bnljAllow(name) =>
          offenders += s"$name: BroadcastNestedLoopJoin"
        case w: WindowExec
            if w.partitionSpec.isEmpty && !globalWindowAllow(name) && dataSized(w.child) =>
          offenders += s"$name: partitionless Window over data-sized input"
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"\nplan offenders:\n  ${offenders.distinct.mkString("\n  ")}")
  }
}
