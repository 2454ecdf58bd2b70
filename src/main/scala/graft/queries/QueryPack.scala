package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark plan over the test tables plus
  * (when SQL-expressible) a DuckDB oracle that must hash-match it.
  *
  * Oracle-parity rules used throughout the packs (see SURVEY.md §5):
  *  - money sums go through DECIMAL(18,4) casts → exact, order- and
  *    engine-independent; result decimals are pinned to the same scale on
  *    both sides;
  *  - ratios divide via CAST(x AS DOUBLE) (DuckDB's bare `1.0` literal is
  *    DECIMAL and would change the result type);
  *  - continuous statistics are rounded at 4 decimals only when their
  *    magnitude keeps cross-engine float noise well below the rounding
  *    grid;
  *  - percentiles use exact linear-interpolation (Spark `percentile` ↔
  *    DuckDB `quantile_cont`), never sketches.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryPack {
  def tables(s: SparkSession, dir: String): Tables = Tables(s, dir)

  /** "SELECT 'c' AS attribute, <exprs(c)> FROM t" UNION ALL per column. */
  def perColumnUnion(table: String, cols: Seq[String])(exprs: String => String): String =
    cols.map(c => s"SELECT '$c' AS attribute, ${exprs(c)} FROM $table")
      .mkString(" UNION ALL ")

  /** DuckDB equal-range bin CASE expression matching
    * Transformers.binExpr: interior cutoffs lo + (hi-lo)*i/k, value<=cut
    * → bin i, else k. `lo`/`hi` must be column references in scope.
    */
  def binCaseSql(valueExpr: String, lo: String, hi: String, k: Int): String = {
    val whens = (1 until k)
      .map(i => s"WHEN $valueExpr <= $lo + ($hi - $lo) * $i / $k THEN $i")
      .mkString(" ")
    s"CASE $whens ELSE $k END"
  }

  /** round(CAST(a AS DOUBLE) / b, 4) — the pct idiom. */
  def pctSql(num: String, den: String): String =
    s"round(CAST($num AS DOUBLE) / $den, 4)"
}
