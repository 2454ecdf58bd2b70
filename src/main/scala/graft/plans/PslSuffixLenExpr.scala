package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd public-suffix-length lookup: the number of host
  * labels the Mozilla Public Suffix List claims as the public suffix,
  * per the PSL algorithm (exception rules prevail, then the longest
  * matching exact/wildcard rule, else 1). `registrableDomain` is then
  * one slice off this length.
  *
  * Exists for PLAN ECONOMY, not just eval speed: the former
  * Column-level form encoded the full snapshot as `isin` literal sets —
  * ~9.5k string literals re-analyzed and re-optimized in EVERY plan
  * that touched a domain (each optimizer pass walks and copies the
  * whole literal tree; q_workflow_url's staged pipeline paid it
  * repeatedly — 5.26 s vs its 1.26 s pre-full-list floor, steal 0%).
  * This node is O(1) in the plan; the rule tables live once per JVM as
  * shared hash sets (loaded from the same `UrlOps` tables the DuckDB
  * oracle SQL is generated from, so engine and oracle cannot drift).
  *
  * Eval walks the host's labels once, right to left, building each
  * candidate suffix incrementally — O(host length) with one hash probe
  * per rule length present in the list. Label splitting keeps trailing
  * empties (`split(host, "\\.", -1)`) to match Spark's `split` exactly.
  */
case class PslSuffixLenExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "psl_suffix_len"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"psl_suffix_len expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PslSuffixLenExpr.suffixLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PslSuffixLenExpr.suffixLen($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PslSuffixLenExpr {
  /** Rule tables as JVM-shared hash sets, built once from the SAME
    * [[graft.functions.UrlOps]] snapshot tables the oracle-SQL
    * generators read. Lengths are sorted longest-first, mirroring the
    * former when-chain's clause order.
    */
  private final class Rules(
      val excLens: Array[Int],
      val excSets: Array[java.util.HashSet[String]],
      val sfxLens: Array[Int],
      val exactSets: Array[java.util.HashSet[String]],
      val wildSets: Array[java.util.HashSet[String]],
      val maxLen: Int)

  private lazy val rules: Rules = {
    import graft.functions.UrlOps
    def set(xs: Seq[String]): java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](math.max(16, xs.size * 2))
      xs.foreach(s.add)
      s
    }
    val excLens = UrlOps.exceptionByLen.keys.toArray.sorted.reverse
    val sfxLens = (UrlOps.exactByLen.keys ++ UrlOps.wildcardByLen.keys.map(_ + 1))
      .toArray.distinct.sorted.reverse
    new Rules(
      excLens,
      excLens.map(k => set(UrlOps.exceptionByLen(k))),
      sfxLens,
      sfxLens.map(k => set(UrlOps.exactByLen.getOrElse(k, Nil))),
      sfxLens.map(k => set(UrlOps.wildcardByLen.getOrElse(k - 1, Nil))),
      (excLens ++ sfxLens).foldLeft(1)(math.max))
  }

  def suffixLen(host: UTF8String): Int = suffixLen(host.toString)

  def suffixLen(host: String): Int = {
    val r = rules
    // split with limit -1: Spark's split keeps trailing empty labels
    val labels = host.split("\\.", -1)
    val n = labels.length
    // candidate suffixes of the last k labels, built right-to-left once
    val last = new Array[String](math.min(n, r.maxLen) + 1)
    var k = 1
    while (k < last.length) {
      last(k) = if (k == 1) labels(n - 1) else labels(n - k) + "." + last(k - 1)
      k += 1
    }
    var i = 0
    while (i < r.excLens.length) {
      val kk = r.excLens(i)
      if (n >= kk && r.excSets(i).contains(last(kk))) return kk - 1
      i += 1
    }
    i = 0
    while (i < r.sfxLens.length) {
      val kk = r.sfxLens(i)
      if (n >= kk && (r.exactSets(i).contains(last(kk)) ||
          (kk - 1 < last.length && kk - 1 >= 1 && r.wildSets(i).contains(last(kk - 1)))))
        return kk
      i += 1
    }
    1
  }
}
