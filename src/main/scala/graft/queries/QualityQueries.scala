package graft.queries

import graft.operators.{QualityChecker, Transformers}
import graft.queries.QueryPack._
import org.apache.spark.sql.functions._

/** Quality-checker operator queries (SURVEY.md §2.4/2.8 quality side). */
object QualityQueries {

  private val dupCols = Seq("l_partkey", "l_suppkey")
  val qDuplicates = Q(
    "q_duplicate_detection",
    (s, dir) => QualityChecker.duplicateDetection(tables(s, dir).lineitem, dupCols),
    Some {
      val d = s"(SELECT count(*) FROM (SELECT DISTINCT ${dupCols.mkString(", ")} FROM lineitem))"
      val n = "(SELECT count(*) FROM lineitem)"
      s"""
      SELECT 'rows_count' AS metric, CAST($n AS DOUBLE) AS value
      UNION ALL SELECT 'unique_rows_count', CAST($d AS DOUBLE)
      UNION ALL SELECT 'duplicate_rows', CAST($n - $d AS DOUBLE)
      UNION ALL SELECT 'duplicate_pct', round(CAST($n - $d AS DOUBLE) / $n, 4)"""
    })

  private val orderCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")
  val qNullRows = Q(
    "q_nullrows_histogram",
    (s, dir) => QualityChecker.nullRowsDetection(tables(s, dir).orders, orderCols),
    Some {
      val nc = orderCols.map(c => s"CASE WHEN $c IS NULL THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      SELECT nc AS null_cols_count, count(*) AS row_count,
        round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM orders), 4) AS row_pct,
        CASE WHEN nc > 0.8 * ${orderCols.size} THEN 1 ELSE 0 END AS flagged
      FROM (SELECT ($nc) AS nc FROM orders) GROUP BY nc"""
    })

  val qIdness = Q(
    "q_idness",
    (s, dir) => QualityChecker.idnessDetection(tables(s, dir).customer,
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
    Some(perColumnUnion("customer", Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))(c =>
      s"""count(DISTINCT $c) AS unique_values,
          ${pctSql(s"count(DISTINCT $c)", s"count($c)")} AS "IDness",
          CASE WHEN ${pctSql(s"count(DISTINCT $c)", s"count($c)")} >= 0.8 THEN 1 ELSE 0 END AS flagged""")))

  val qBiasedness = Q(
    "q_biasedness",
    (s, dir) => QualityChecker.biasednessDetection(tables(s, dir).orders,
      Seq("o_orderstatus", "o_orderpriority"), threshold = 0.3),
    Some(Seq("o_orderstatus", "o_orderpriority").map(c =>
      s"""(SELECT '$c' AS attribute, $c AS mode,
          round(CAST(count(*) AS DOUBLE) / (SELECT count($c) FROM orders), 4) AS mode_pct,
          CASE WHEN round(CAST(count(*) AS DOUBLE) / (SELECT count($c) FROM orders), 4) >= 0.3
            THEN 1 ELSE 0 END AS flagged
          FROM orders GROUP BY $c ORDER BY count(*) DESC, $c ASC LIMIT 1)""")
      .mkString(" UNION ALL ")))

  /** Invalid-entry vocabulary scan over string columns of documents. */
  val qInvalidEntries = Q(
    "q_invalid_entries",
    (s, dir) => QualityChecker.invalidEntriesDetection(tables(s, dir).documents,
      Seq("lang", "source")),
    Some {
      val nullWords = QualityChecker.nullWords.map(w => s"'$w'").mkString(", ")
      perColumnUnion("documents", Seq("lang", "source")) { c =>
        val l = s"lower(trim(CAST($c AS VARCHAR)))"
        val isNullWord = s"$l IN ($nullWords)"
        val isSpecial = s"regexp_matches($l, '^[^a-zA-Z0-9]+$$')"
        // DuckDB regexes are RE2 (no backreferences) — express the
        // >=3-repeated-char check structurally instead of ^(.)\1\1+$
        val isRepeat = s"(length($l) >= 3 AND $l = repeat(substr($l, 1, 1), length($l)))"
        val isInvalid = s"($isNullWord OR $isSpecial OR $isRepeat)"
        s"""count(CASE WHEN $isInvalid THEN 1 END) AS invalid_count,
            ${pctSql(s"count(CASE WHEN $isInvalid THEN 1 END)", s"count($c)")} AS invalid_pct,
            count(CASE WHEN $isNullWord THEN 1 END) AS null_word_count,
            count(CASE WHEN $isSpecial THEN 1 END) AS special_char_count,
            count(CASE WHEN $isRepeat THEN 1 END) AS repeated_char_count"""
      }
    })

  private val outlierCols = Seq("l_quantity", "l_extendedprice")
  val qOutlierDetection = Q(
    "q_outlier_detection",
    (s, dir) => QualityChecker.outlierDetection(tables(s, dir).lineitem, outlierCols),
    Some(outlierCols.map { c =>
      // combined bound = 2nd order statistic of {pctile, mean±3sd, IQR fence}
      s"""(WITH b AS (
          SELECT quantile_cont($c, 0.05) AS pl, quantile_cont($c, 0.95) AS pu,
                 quantile_cont($c, 0.25) AS q1, quantile_cont($c, 0.75) AS q3,
                 avg($c) AS m, stddev_samp($c) AS sd
          FROM lineitem),
        cb AS (
          SELECT
            list_sort([pl, m - 3*sd, q1 - 1.5*(q3-q1)])[2] AS lo,
            list_sort([pu, m + 3*sd, q3 + 1.5*(q3-q1)])[2] AS hi
          FROM b)
        SELECT '$c' AS attribute,
          (SELECT count(CASE WHEN $c < lo THEN 1 END) FROM lineitem, cb) AS lower_outliers,
          (SELECT count(CASE WHEN $c > hi THEN 1 END) FROM lineitem, cb) AS upper_outliers,
          0 AS excluded_due_to_skewness
        FROM cb)"""
    }.mkString(" UNION ALL ")))

  /** MMM imputation on deterministically-nulled events (median + mode). */
  val qImputationMMM = Q(
    "q_imputation_mmm",
    (s, dir) => {
      val base = tables(s, dir).events
        .withColumn("value", when(col("value") < 10, lit(null)).otherwise(col("value")))
        .withColumn("event_type",
          when(col("event_type") === "error", lit(null)).otherwise(col("event_type")))
      Transformers.imputationMMM(base, Seq("value"), Seq("event_type"), numMethod = "median")
        .select(col("event_id"), round(col("value"), 4).as("value"), col("event_type"))
    },
    Some("""
      WITH base AS (
        SELECT event_id,
          CASE WHEN value < 10 THEN NULL ELSE value END AS value,
          CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type
        FROM events),
      med AS (SELECT quantile_cont(value, 0.5) AS v FROM base),
      md AS (SELECT event_type AS v FROM base WHERE event_type IS NOT NULL
             GROUP BY event_type ORDER BY count(*) DESC, event_type ASC LIMIT 1)
      SELECT event_id,
        round(coalesce(value, (SELECT v FROM med)), 4) AS value,
        coalesce(event_type, (SELECT v FROM md)) AS event_type
      FROM base"""))

  /** Robust median/MAD outlier scoring (Iglewicz–Hoaglin modified
    * z-score) — both medians ride the shuffle-free exact-percentile
    * histogram selection; the count is one aggregation.
    */
  val qMadOutliers = Q(
    "q_mad_outliers",
    (s, dir) => QualityChecker.madOutliers(
      tables(s, dir).lineitem, Seq("l_quantity", "l_extendedprice", "l_discount")),
    Some {
      Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        s"""
        SELECT '$c' AS attribute,
          (SELECT median(CAST($c AS DOUBLE)) FROM lineitem) AS median,
          (SELECT median(abs(CAST($c AS DOUBLE) -
              (SELECT median(CAST($c AS DOUBLE)) FROM lineitem))) FROM lineitem) AS mad,
          (SELECT count(*) FROM lineitem
           WHERE abs(0.6745 * (CAST($c AS DOUBLE) -
               (SELECT median(CAST($c AS DOUBLE)) FROM lineitem)) /
               (SELECT median(abs(CAST($c AS DOUBLE) -
                   (SELECT median(CAST($c AS DOUBLE)) FROM lineitem))) FROM lineitem)) > 3.5)
            AS n_outliers"""
      }.mkString(" UNION ALL ")
    })

  /** nullColumns_detection dispatcher under the oracle gate: the
    * column_removal arm drops columns whose missing_pct (4-dp rounded,
    * same as missingCount) exceeds the threshold. event_type is nulled
    * for ~2/3 of rows (dropped), value for ~1/10 (kept) — the output
    * lists the surviving columns plus the untouched row count, so the
    * DROP decision itself is what hash-matches. The other dispatcher
    * arms (MMM/KNN/regression/MF/auto) delegate to operators with their
    * own oracle rows.
    */
  val qNullTreatment = Q(
    "q_null_treatment",
    (s, dir) => {
      import s.implicits._
      val planted = tables(s, dir).events
        .withColumn("event_type",
          when(col("user_id") % 3 =!= 0, lit(null)).otherwise(col("event_type")))
        .withColumn("value",
          when(col("user_id") % 10 === 0, lit(null)).otherwise(col("value")))
      val treated = QualityChecker.nullColumnsDetection(
        planted, Seq("value", "event_type"), treatment = "column_removal", threshold = 0.5)
      val n = treated.count()
      treated.columns.sorted.toSeq.toDF("column_name")
        .withColumn("n_rows", lit(n))
    },
    Some("""
      WITH base AS (
        SELECT event_id, ts, user_id, props,
          CASE WHEN user_id % 3 <> 0 THEN NULL ELSE event_type END AS event_type,
          CASE WHEN user_id % 10 = 0 THEN NULL ELSE value END AS value
        FROM events),
      m AS (SELECT
        round(CAST(count(*) - count(value) AS DOUBLE) / count(*), 4) AS pv,
        round(CAST(count(*) - count(event_type) AS DOUBLE) / count(*), 4) AS pe,
        count(*) AS n FROM base),
      kept AS (
        SELECT c FROM (VALUES ('event_id'), ('ts'), ('user_id'), ('props')) v(c)
        UNION ALL SELECT 'value' FROM m WHERE pv <= 0.5
        UNION ALL SELECT 'event_type' FROM m WHERE pe <= 0.5)
      SELECT c AS column_name, (SELECT n FROM m) AS n_rows FROM kept"""))

  /** k-anonymity audit over the (c_mktsegment, c_nationkey)
    * quasi-identifier pair: the equivalence-class-size histogram with
    * row shares and the k = 5 violation flag. Pure integer set
    * arithmetic until the rounded share, so the oracle replays it
    * exactly.
    */
  val qKAnonymity = Q(
    "q_k_anonymity",
    (s, dir) => QualityChecker.kAnonymityAudit(tables(s, dir).customer,
      Seq("c_mktsegment", "c_nationkey"), k = 5),
    Some("""
      WITH cls AS (SELECT c_mktsegment, c_nationkey, count(*) AS class_size
                   FROM customer GROUP BY 1, 2),
      h AS (SELECT class_size, count(*) AS n_classes,
                   class_size * count(*) AS n_rows
            FROM cls GROUP BY 1),
      t AS (SELECT sum(n_rows) AS total FROM h)
      SELECT class_size, n_classes, n_rows,
        round(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 4) AS pct_rows,
        class_size < 5 AS below_k
      FROM h, t"""))

  def all: Seq[Q] = Seq(qDuplicates, qNullRows, qIdness, qBiasedness, qInvalidEntries,
    qOutlierDetection, qImputationMMM, qMadOutliers, qNullTreatment, qKAnonymity)
}
