package graft.queries

import graft.operators.StatsGenerator
import graft.queries.QueryPack._
import org.apache.spark.sql.functions._

/** Descriptive-stats operator queries (SURVEY.md §2.4). */
object StatsQueries {

  private val liNums = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val custCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  val qGlobalSummary = Q(
    "q_global_summary",
    (s, dir) => StatsGenerator.globalSummary(tables(s, dir).lineitem),
    Some("""
      SELECT 'rows_count' AS metric, CAST(count(*) AS VARCHAR) AS value FROM lineitem
      UNION ALL SELECT 'columns_count', '11'
      UNION ALL SELECT 'numcols_count', '8'
      UNION ALL SELECT 'numcols_name', 'l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax'
      UNION ALL SELECT 'catcols_count', '2'
      UNION ALL SELECT 'catcols_name', 'l_returnflag, l_linestatus'
      UNION ALL SELECT 'othercols_count', '1'
      UNION ALL SELECT 'othercols_name', 'l_shipdate'"""))

  val qMissingCounts = Q(
    "q_missing_counts",
    (s, dir) => StatsGenerator.missingCount(tables(s, dir).customer, custCols),
    Some(perColumnUnion("customer", custCols)(c =>
      s"count(*) - count($c) AS missing_count, ${pctSql(s"count(*) - count($c)", "count(*)")} AS missing_pct")))

  val qNonzeroCounts = Q(
    "q_nonzero_counts",
    (s, dir) => StatsGenerator.nonzeroCount(tables(s, dir).lineitem, liNums),
    Some(perColumnUnion("lineitem", liNums)(c =>
      s"count(CASE WHEN $c IS NOT NULL AND $c <> 0 THEN 1 END) AS nonzero_count, " +
        pctSql(s"count(CASE WHEN $c IS NOT NULL AND $c <> 0 THEN 1 END)", "count(*)") + " AS nonzero_pct")))

  val qMeasuresOfCounts = Q(
    "q_measures_of_counts",
    (s, dir) => StatsGenerator.measuresOfCounts(tables(s, dir).orders,
      Seq("o_orderkey", "o_custkey", "o_totalprice")),
    Some(perColumnUnion("orders", Seq("o_orderkey", "o_custkey", "o_totalprice"))(c =>
      s"""count($c) AS fill_count, ${pctSql(s"count($c)", "count(*)")} AS fill_pct,
          count(*) - count($c) AS missing_count, ${pctSql(s"count(*) - count($c)", "count(*)")} AS missing_pct,
          count(CASE WHEN $c IS NOT NULL AND $c <> 0 THEN 1 END) AS nonzero_count,
          ${pctSql(s"count(CASE WHEN $c IS NOT NULL AND $c <> 0 THEN 1 END)", "count(*)")} AS nonzero_pct""")))

  private val ctCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  val qCentralTendency = Q(
    "q_central_tendency",
    (s, dir) => StatsGenerator.centralTendency(tables(s, dir).lineitem, ctCols),
    // mode ties break on the STRING form of the value (the engine's melt
    // casts to string before ranking), hence ORDER BY CAST AS VARCHAR
    Some(perColumnUnion("lineitem", ctCols)(c =>
      s"""CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / count($c) AS mean,
          quantile_cont($c, 0.5) AS median,
          (SELECT CAST($c AS VARCHAR) FROM lineitem WHERE $c IS NOT NULL
             GROUP BY $c ORDER BY count(*) DESC, CAST($c AS VARCHAR) ASC LIMIT 1) AS mode,
          (SELECT count(*) FROM lineitem WHERE $c IS NOT NULL GROUP BY $c
             ORDER BY count(*) DESC, CAST($c AS VARCHAR) ASC LIMIT 1) AS mode_rows,
          round((SELECT CAST(count(*) AS DOUBLE) FROM lineitem WHERE $c IS NOT NULL
                   GROUP BY $c ORDER BY count(*) DESC, CAST($c AS VARCHAR) ASC LIMIT 1)
                / count($c), 4) AS mode_pct""")))

  private val modeCols = Seq("o_orderstatus", "o_orderpriority")
  val qMode = Q(
    "q_mode",
    (s, dir) => StatsGenerator.modeComputation(tables(s, dir).orders, modeCols),
    Some(modeCols.map(c =>
      s"""(SELECT '$c' AS attribute, $c AS mode, count(*) AS mode_count,
          round(CAST(count(*) AS DOUBLE) / (SELECT count($c) FROM orders), 4) AS mode_pct
          FROM orders GROUP BY $c ORDER BY count(*) DESC, $c ASC LIMIT 1)""")
      .mkString(" UNION ALL ")))

  val qUniqueCounts = Q(
    "q_unique_counts",
    (s, dir) => StatsGenerator.uniqueCount(tables(s, dir).lineitem, liNums),
    Some(perColumnUnion("lineitem", liNums)(c =>
      s"count(DISTINCT $c) AS unique_values")))

  // dispersion restricted to bounded-magnitude columns: variance of a
  // ~1e4-magnitude column needs 13 significant digits at round-4 — beyond
  // reliable cross-engine float agreement.
  private val dispCols = Seq("l_quantity", "l_discount", "l_tax")
  val qDispersion = Q(
    "q_dispersion",
    (s, dir) => StatsGenerator.measuresOfDispersion(tables(s, dir).lineitem, dispCols),
    Some(perColumnUnion("lineitem", dispCols)(c =>
      s"""round(stddev_samp($c), 4) AS stddev,
          round(var_samp($c), 4) AS variance,
          round(stddev_samp($c) / (CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / count($c)), 4) AS cov,
          round(quantile_cont($c, 0.75) - quantile_cont($c, 0.25), 4) AS "IQR",
          max($c) - min($c) AS range""")))

  private val pctCols = Seq("l_quantity", "l_extendedprice", "l_discount")
  val qPercentiles = Q(
    "q_percentiles",
    (s, dir) => StatsGenerator.measuresOfPercentiles(tables(s, dir).lineitem, pctCols),
    Some(perColumnUnion("lineitem", pctCols)(c =>
      s"""CAST(min($c) AS DOUBLE) AS "min", """ +
        StatsGenerator.percentilePoints.map(p =>
          s"round(quantile_cont($c, $p), 4) AS pct_${(p * 100).toInt}").mkString(", ") +
        s""", CAST(max($c) AS DOUBLE) AS "max"""")))

  private val shapeCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  val qShape = Q(
    "q_shape",
    (s, dir) => StatsGenerator.measuresOfShape(tables(s, dir).lineitem, shapeCols),
    // Spark's skewness/kurtosis are population moments (g1, excess g2);
    // DuckDB's builtins are sample-corrected, so the oracle recomputes
    // from raw central moments.
    Some(shapeCols.map(c =>
      s"""SELECT '$c' AS attribute,
          round((sum(pow($c - mu, 3)) / count(*)) / pow(sum(pow($c - mu, 2)) / count(*), 1.5), 4) AS skewness,
          round((sum(pow($c - mu, 4)) / count(*)) / pow(sum(pow($c - mu, 2)) / count(*), 2) - 3, 4) AS kurtosis
          FROM lineitem, (SELECT avg($c) AS mu FROM lineitem)""")
      .mkString(" UNION ALL ")))

  val qCardinality = Q(
    "q_cardinality",
    (s, dir) => StatsGenerator.measuresOfCardinality(tables(s, dir).orders,
      Seq("o_orderkey", "o_orderstatus", "o_orderpriority")),
    Some(perColumnUnion("orders", Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))(c =>
      s"""count(DISTINCT $c) AS unique_values,
          ${pctSql(s"count(DISTINCT $c)", s"count($c)")} AS "IDness"""")))

  def all: Seq[Q] = Seq(qGlobalSummary, qMissingCounts, qNonzeroCounts, qMeasuresOfCounts,
    qCentralTendency, qMode, qUniqueCounts, qDispersion, qPercentiles, qShape, qCardinality)
}
