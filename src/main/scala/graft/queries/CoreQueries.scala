package graft.queries

import graft.queries.QueryPack._
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan/join/aggregate flagships + ingest-surface queries. */
object CoreQueries {

  private val money = DecimalType(18, 4)
  private def dec(c: String) = col(c).cast(money)

  /** TPC-H Q1-flavoured pricing summary: predicate pushdown to parquet,
    * one hash aggregate, exact decimal sums.
    */
  val q1 = Q(
    "q_agg_pricing_summary",
    (s, dir) => {
      val li = tables(s, dir).lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      // Sums are exact in decimal; the FINAL cast to double pins the textual
      // form to match DuckDB's (decimal scale would render trailing zeros).
      // round(…,4) after the cast is LOSSLESS (the decimal sums have ≤ 4
      // true decimals) and normalizes the two engines' decimal→double
      // conversions: at sf0.1 magnitudes (~2.7e9) the casts can land one
      // ulp apart and render differently; snapping to the exact 1e-4 grid
      // makes both bit-identical at any scale.
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(dec("l_quantity")).cast(DoubleType), 4).as("sum_qty"),
          round(sum(dec("l_extendedprice")).cast(DoubleType), 4).as("sum_base_price"),
          round(sum(dec("l_extendedprice") * (lit(1).cast(money) - dec("l_discount")))
            .cast(DoubleType), 4).as("sum_disc_price"),
          (sum(dec("l_quantity")).cast(DoubleType) / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** 5-table star join: fact-side shuffle joins + broadcast dims
    * (nation/region are tiny — Catalyst broadcasts; we hint explicitly).
    */
  val qJoin = Q(
    "q_join_revenue_nation",
    (s, dir) => {
      val t = tables(s, dir)
      val joined = Ingest.joinDataset(
        Seq(
          t.lineitem.withColumnRenamed("l_orderkey", "k"),
          t.orders.withColumnRenamed("o_orderkey", "k")), Seq("k"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      joined
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(dec("l_extendedprice") * (lit(1).cast(money) - dec("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT r_name, n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""))

  /** Cardinality-driven type recommendation (ingest surface). */
  val qRecommendType = Q(
    "q_recommend_type",
    (s, dir) => Ingest.recommendType(tables(s, dir).customer),
    Some {
      // threshold = min(0.01 * n, 100); numeric→categorical iff uniq <= thr;
      // string→numerical iff fully castable and uniq > thr.
      val numCols = Seq("c_custkey", "c_nationkey", "c_acctbal")
      val catCols = Seq("c_name", "c_mktsegment")
      val thr = "least(0.01 * (SELECT count(*) FROM customer), 100)"
      val numSel = numCols.map(c =>
        s"""SELECT '$c' AS attribute, 'numerical' AS current_type,
            count(DISTINCT $c) AS unique_values,
            CASE WHEN count(DISTINCT $c) <= $thr THEN 'categorical' ELSE 'numerical' END AS recommended_type
            FROM customer""")
      val catSel = catCols.map(c =>
        s"""SELECT '$c' AS attribute, 'categorical' AS current_type,
            count(DISTINCT $c) AS unique_values,
            CASE WHEN count(CASE WHEN $c IS NOT NULL AND TRY_CAST($c AS DOUBLE) IS NULL THEN 1 END) = 0
                  AND count(DISTINCT $c) > $thr
              THEN 'numerical' ELSE 'categorical' END AS recommended_type
            FROM customer""")
      (numSel ++ catSel).mkString(" UNION ALL ")
    })

  /** SQL-expression features over lineitem rows (expression_parser). */
  val qExpressionParser = Q(
    "q_expression_parser",
    (s, dir) => {
      val li = tables(s, dir).lineitem
      graft.operators.Transformers
        .expressionParser(li, Seq(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)",
          "l_quantity * 2"))
        .select(col("l_orderkey"), col("l_linenumber"), col("f0"), col("f1"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS f0,
        l_quantity * 2 AS f1
      FROM lineitem"""))

  /** Semi/anti join surface: customers with vs without orders, one frame. */
  val qSemiAnti = Q(
    "q_semi_anti_join",
    (s, dir) => {
      val t = tables(s, dir)
      val o = t.orders.withColumnRenamed("o_custkey", "c_custkey")
      val semi = Ingest.joinDataset(Seq(t.customer, o), Seq("c_custkey"), "left_semi")
        .select(lit("with_orders").as("segment"), col("c_custkey"))
      val anti = Ingest.joinDataset(Seq(t.customer, o), Seq("c_custkey"), "left_anti")
        .select(lit("no_orders").as("segment"), col("c_custkey"))
      semi.unionByName(anti)
    },
    Some("""
      SELECT 'with_orders' AS segment, c_custkey FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
      UNION ALL
      SELECT 'no_orders' AS segment, c_custkey FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"""))

  /** subtract/except surface: order keys that never shipped a lineitem. */
  val qExcept = Q(
    "q_except_subtract",
    (s, dir) => {
      val t = tables(s, dir)
      t.orders.select(col("o_orderkey"))
        .except(t.lineitem.select(col("l_orderkey").as("o_orderkey")))
    },
    Some("""
      SELECT o_orderkey FROM orders
      EXCEPT
      SELECT l_orderkey AS o_orderkey FROM lineitem"""))

  /** rename + recast surface (single-projection implementations). */
  val qRenameRecast = Q(
    "q_rename_recast",
    (s, dir) => {
      val renamed = Ingest.renameColumn(tables(s, dir).customer,
        Map("c_name" -> "customer_name", "c_mktsegment" -> "segment"))
      Ingest.recastColumn(renamed, Map("c_custkey" -> "string"))
        .select(col("c_custkey"), col("customer_name"), col("segment"))
    },
    Some("""
      SELECT CAST(c_custkey AS VARCHAR) AS c_custkey,
             c_name AS customer_name, c_mktsegment AS segment
      FROM customer"""))

  /** Contiguous row ids under a total order (distributed sort +
    * zipWithIndex — no single-partition window).
    */
  val qRowIds = Q(
    "q_row_ids",
    (s, dir) => Ingest.withRowId(
      tables(s, dir).orders.select("o_orderkey", "o_orderstatus"),
      Seq("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_orderstatus,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id
      FROM orders"""))

  /** Skew-mitigation salted join: the fact side takes a random salt, the
    * dim side replicates saltFactor×, hot keys spread over saltFactor
    * reducers. Salting must be result-invariant — the oracle is the
    * PLAIN join, so any row lost/duplicated by the salt plumbing
    * hash-mismatches.
    */
  val qSaltedJoin = Q(
    "q_salted_join",
    (s, dir) => {
      val t = tables(s, dir)
      val fact = t.orders.withColumn("custkey", col("o_custkey"))
      val dim = t.customer.withColumn("custkey", col("c_custkey"))
        .select("custkey", "c_mktsegment")
      graft.sources.SkewJoin.saltedJoin(fact, dim, Seq("custkey"), saltFactor = 8)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          graft.core.NumExpr.dsum(col("o_totalprice")).cast("double").as("total_price"))
    },
    Some("""
      SELECT c_mktsegment,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment"""))

  /** Top-3 customers by account balance per market segment — the
    * canonical per-group top-k: rank window partitioned on the group key
    * (parallelism = #groups' hash spread, never 1).
    */
  val qTopkPerGroup = Q(
    "q_topk_per_group",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      tables(s, dir).customer
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("c_mktsegment", "rk", "c_custkey", "c_acctbal")
    },
    Some("""
      SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        FROM customer) WHERE rk <= 3"""))

  /** ROLLUP aggregation — subtotal + grand-total rows from ONE pass
    * (Expand + single hash aggregate; no per-level rescans).
    */
  val qRollupPricing = Q(
    "q_rollup_pricing",
    (s, dir) => tables(s, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(dec("l_quantity")).cast(DoubleType), 4).as("sum_qty"),
        count(lit(1)).as("n")),
    Some("""
      SELECT l_returnflag, l_linestatus,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
        count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  /** CUBE aggregation — every grouping-set combination (both rollup
    * paths + the cross marginals) from the same one-pass Expand plan.
    */
  val qCubePricing = Q(
    "q_cube_pricing",
    (s, dir) => tables(s, dir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(dec("l_quantity")).cast(DoubleType), 4).as("sum_qty"),
        count(lit(1)).as("n")),
    Some("""
      SELECT l_returnflag, l_linestatus,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
        count(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** Row-level snapshot diff (added/removed/changed keys between two
    * table versions — the incremental-pipeline primitive): both
    * versions derive deterministically from orders, so the oracle
    * replays the full-outer join with IS NOT DISTINCT FROM the same
    * null-safe way. Changed rows flip o_orderstatus on key % 3 == 0.
    */
  val qSnapshotDiff = Q(
    "q_snapshot_diff",
    (s, dir) => {
      val o = tables(s, dir).orders
      val oldSnap = o.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 3 === 0, lit("X")).otherwise(col("o_orderstatus")))
      graft.sources.Ingest.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
    },
    Some("""
      WITH o AS (SELECT * FROM orders),
      olds AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
      news AS (SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
               FROM o WHERE o_orderkey % 5 <> 0)
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        CASE WHEN a.o_orderkey IS NULL THEN 'added'
             WHEN b.o_orderkey IS NULL THEN 'removed'
             WHEN NOT (a.o_custkey IS NOT DISTINCT FROM b.o_custkey
                   AND a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
                   AND a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice
                   AND a.o_orderdate IS NOT DISTINCT FROM b.o_orderdate
                   AND a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority)
               THEN 'changed' END AS change
      FROM olds a FULL OUTER JOIN news b ON a.o_orderkey = b.o_orderkey
      WHERE change IS NOT NULL"""))

  /** CDC changelog apply (MERGE INTO semantics): a derived changelog
    * upserts flipped statuses (seq 2) over deletes (seq 1) and inserts
    * brand-new keys; precedence, delete, and insert paths all replay in
    * the oracle's window + anti-join SQL. Keys divisible by 12 carry
    * BOTH ops and must resolve to the higher-sequence upsert.
    */
  val qChangelogApply = Q(
    "q_changelog_apply",
    (s, dir) => {
      val o = tables(s, dir).orders
      val ups = o.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("op", lit("U")).withColumn("seq", lit(2L))
      val dels = o.filter(col("o_orderkey") % 6 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(1L))
      val ins = o.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("op", lit("I")).withColumn("seq", lit(1L))
      val merged = graft.sources.Ingest.applyChangelog(
        o, ups.unionByName(dels).unionByName(ins), Seq("o_orderkey"))
      merged.select(col("o_orderkey"), col("o_orderstatus"))
    },
    Some("""
      WITH o AS (SELECT * FROM orders),
      ch AS (
        SELECT o_orderkey, 'U' AS st, 'U' AS op, 2 AS seq FROM o
        WHERE o_orderkey % 4 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, 'D', 1 FROM o WHERE o_orderkey % 6 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_orderstatus, 'I', 1 FROM o
        WHERE o_orderkey % 101 = 0),
      latest AS (SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC)
            AS rn FROM ch) WHERE rn = 1)
      SELECT o.o_orderkey, o.o_orderstatus FROM o
      WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
      UNION ALL
      SELECT o_orderkey, st AS o_orderstatus FROM latest WHERE op <> 'D'"""))

  /** GROUPING SETS with grouping_id — arbitrary chosen grouping-set
    * combinations (here: by-flag×status, by-flag, by-status — NOT a
    * rollup or cube) from one Expand + single hash aggregate;
    * grouping_id disambiguates a real NULL key from a subtotal row.
    */
  val qGroupingSets = Q(
    "q_grouping_sets",
    (s, dir) => {
      tables(s, dir).lineitem.createOrReplaceTempView("lineitem_gs")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
          count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))""")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
        count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))"""))

  /** Pivot: event counts per day × event type (fixed category list so
    * the output schema is static — the scale-safe pivot contract).
    */
  val qPivotEvents = Q(
    "q_pivot_events",
    (s, dir) => tables(s, dir).events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L),
    Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS day,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events GROUP BY 1"""))

  /** Grouped exact median (small-group regime: the `percentile` aggregate
    * is exact and matches quantile_cont; for high-cardinality value
    * domains per group, route through StatsGenerator.exactPercentiles
    * per group key instead).
    */
  val qGroupedMedian = Q(
    "q_grouped_median",
    (s, dir) => tables(s, dir).customer
      .groupBy(col("c_mktsegment"))
      .agg(expr("percentile(c_acctbal, 0.5)").as("median_acctbal"),
        count(lit(1)).as("n")),
    Some("""
      SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS median_acctbal,
        count(*) AS n
      FROM customer GROUP BY c_mktsegment"""))

  /** write_dataset round-trip (ref: data_ingest.py:54-117): write orders
    * through the repartition rule to parquet, read it back, and aggregate
    * — the oracle runs the same aggregate on the SOURCE table, so the
    * round-trip must be lossless (values, types, and null behaviour).
    * Gives §2.1's write path a hard CORRECTNESS row instead of spec-only.
    */
  /** Avro ingest/export proof under the driver's own gate: supplier goes
    * out through the avro writer (spark-avro when bundled, the
    * avro-mapred fallback otherwise — AvroIO), comes back in through the
    * avro reader, and must aggregate identically to the parquet source.
    * ref: shared/spark.py:12-23 bundles spark-avro for the same surface;
    * test_data_ingest_integration.py round-trips it.
    */
  val qAvroRoundtrip = Q(
    "q_avro_roundtrip",
    (s, dir) => {
      import graft.sources.Ingest
      // scale-dir-derived path: two tiers (or two concurrent runs on
      // different data) must not race each other through one fixed dir
      val out = System.getProperty("java.io.tmpdir", "/tmp") +
        s"/graft_avro_roundtrip_${Integer.toHexString(dir.hashCode)}"
      Ingest.writeDataset(tables(s, dir).supplier, out, "avro", repartitionTo = Some(4))
      Ingest.readDataset(s, out, "avro")
        .groupBy(col("s_nationkey"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(dec("s_acctbal")).cast(DoubleType), 4).as("sum_bal"),
          min(col("s_name")).as("min_name"))
    },
    Some("""
      SELECT s_nationkey, count(*) AS n,
        round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_bal,
        min(s_name) AS min_name
      FROM supplier GROUP BY s_nationkey"""))

  val qWriteRoundtrip = Q(
    "q_write_roundtrip",
    (s, dir) => {
      import graft.sources.Ingest
      val out = System.getProperty("java.io.tmpdir", "/tmp") +
        s"/graft_write_roundtrip_${Integer.toHexString(dir.hashCode)}"
      Ingest.writeDataset(tables(s, dir).orders, out, "parquet", repartitionTo = Some(8))
      Ingest.readDataset(s, out, "parquet")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(dec("o_totalprice")).cast(DoubleType), 4).as("sum_price"),
          count(col("o_custkey")).as("n_cust"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"))
    },
    Some("""
      SELECT o_orderstatus, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
        count(o_custkey) AS n_cust,
        min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
      FROM orders GROUP BY o_orderstatus"""))

  /** Range-clustered write under the correctness gate: orders goes out
    * through writeClustered (repartitionByRange + sortWithinPartitions —
    * the file-skipping layout IngestSpec proves prunes scans), comes
    * back, and must aggregate identically to the source. Flips the
    * clustered-write path from spec-only to oracle-checked losslessness.
    */
  val qClusteredRoundtrip = Q(
    "q_clustered_roundtrip",
    (s, dir) => {
      import graft.sources.Ingest
      val out = System.getProperty("java.io.tmpdir", "/tmp") +
        s"/graft_clustered_roundtrip_${Integer.toHexString(dir.hashCode)}"
      Ingest.writeClustered(tables(s, dir).orders, out, Seq("o_totalprice"), numFiles = 8)
      s.read.parquet(out)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(dec("o_totalprice")).cast(DoubleType), 4).as("sum_price"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"))
    },
    Some("""
      SELECT o_orderstatus, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
        min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
      FROM orders GROUP BY o_orderstatus"""))

  /** DuckDB replay of [[graft.sources.Ingest.zorderValue]] over two
    * 16-bit bins: `((x >> i) & 1) << 2i  |  ((y >> i) & 1) << 2i+1`.
    */
  private def zInterleaveSql(bx: String, by: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($bx >> $i) & 1) << ${2 * i})",
      s"((($by >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Mirrors every zorderValue edge: degenerate range (mx <= mn) bins to
    * 0 via the engine's lit(0) branch, null values via its coalesce —
    * without these the SQL would divide by zero (inf → clamp 65535) or
    * propagate NULL and the tiles would shift on an oracle artifact.
    */
  private def zBinSql(x: String, mn: String, mx: String): String =
    s"""CASE WHEN $mx <= $mn THEN 0 ELSE
       | coalesce(CAST(least(greatest(floor((CAST($x AS DOUBLE) - $mn) / ($mx - $mn)
       | * 65536.0), 0.0), 65535.0) AS BIGINT), 0) END""".stripMargin

  /** Z-order clustered write under the correctness gate: orders goes out
    * through writeZOrdered on (o_totalprice, o_custkey), comes back, and
    * the query re-computes every row's z-value FROM THE RE-READ DATA and
    * aggregates per top-6-bit z-tile. The oracle rebuilds the identical
    * bin + bit-interleave arithmetic from the source table, so a hash
    * match proves both losslessness of the layout pass and the z-curve
    * arithmetic bit-for-bit (IngestSpec separately proves the layout
    * actually skips files on BOTH dimensions).
    */
  val qZorderRoundtrip = Q(
    "q_zorder_roundtrip",
    (s, dir) => {
      import graft.sources.Ingest
      val out = System.getProperty("java.io.tmpdir", "/tmp") +
        s"/graft_zorder_roundtrip_${Integer.toHexString(dir.hashCode)}"
      Ingest.writeZOrdered(tables(s, dir).orders, out,
        Seq("o_totalprice", "o_custkey"), numFiles = 8, bits = 16)
      val back = s.read.parquet(out)
      val st = back.select(
        min(col("o_totalprice").cast(DoubleType)), max(col("o_totalprice").cast(DoubleType)),
        min(col("o_custkey").cast(DoubleType)), max(col("o_custkey").cast(DoubleType))).head()
      val z = Ingest.zorderValue(
        Seq(col("o_totalprice"), col("o_custkey")),
        Seq(st.getDouble(0), st.getDouble(2)),
        Seq(st.getDouble(1), st.getDouble(3)), bits = 16)
      back.withColumn("zb", shiftright(z, 26))
        .groupBy(col("zb"))
        .agg(count(lit(1)).as("n"),
          round(sum(dec("o_totalprice")).cast(DoubleType), 4).as("sum_price"))
    },
    Some(s"""
      WITH s AS (SELECT min(CAST(o_totalprice AS DOUBLE)) AS mnp,
                        max(CAST(o_totalprice AS DOUBLE)) AS mxp,
                        min(CAST(o_custkey AS DOUBLE)) AS mnc,
                        max(CAST(o_custkey AS DOUBLE)) AS mxc FROM orders),
      b AS (SELECT o_totalprice,
              ${zBinSql("o_totalprice", "mnp", "mxp")} AS bx,
              ${zBinSql("o_custkey", "mnc", "mxc")} AS by
            FROM orders, s),
      z AS (SELECT o_totalprice, (${zInterleaveSql("bx", "by", 16)}) AS zv FROM b)
      SELECT zv >> 26 AS zb, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
      FROM z GROUP BY zb"""))

  /** Feast export type mapping under the oracle gate: the engine maps
    * the Spark parquet schema to Feast dtypes; DuckDB derives the same
    * mapping from ITS parquet reader's view of lineitem — both engines
    * must agree on every exported column's type.
    */
  val qFeastTypes = Q(
    "q_feast_types",
    (s, dir) => graft.workflow.FeastExporter.featureViewFields(
      tables(s, dir).lineitem, entityCol = "l_orderkey"),
    Some("""
      SELECT column_name AS field,
        CASE WHEN column_type IN ('BIGINT', 'INTEGER', 'SMALLINT', 'TINYINT',
                                  'UBIGINT', 'UINTEGER') THEN 'Int64'
             WHEN column_type IN ('DOUBLE', 'FLOAT', 'REAL')
                  OR column_type LIKE 'DECIMAL%' THEN 'Float64'
             WHEN column_type = 'BOOLEAN' THEN 'Bool'
             WHEN column_type LIKE 'TIMESTAMP%' OR column_type = 'DATE'
               THEN 'UnixTimestamp'
             ELSE 'String' END AS dtype
      FROM (DESCRIBE lineitem)
      WHERE column_name <> 'l_orderkey'"""))

  def all: Seq[Q] = Seq(q1, qJoin, qRecommendType, qExpressionParser,
    qSemiAnti, qExcept, qRenameRecast, qRowIds, qSaltedJoin,
    qTopkPerGroup, qRollupPricing, qCubePricing, qGroupingSets, qPivotEvents,
    qGroupedMedian, qWriteRoundtrip, qAvroRoundtrip, qSnapshotDiff, qChangelogApply,
    qClusteredRoundtrip, qZorderRoundtrip, qFeastTypes)
}
