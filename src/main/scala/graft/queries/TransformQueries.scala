package graft.queries

import graft.operators.Transformers
import graft.queries.QueryPack._
import org.apache.spark.sql.functions._

/** Transformer operator queries (SURVEY.md §2.8). */
object TransformQueries {

  val qBinning = Q(
    "q_binning_equal_range",
    (s, dir) => Transformers
      .attributeBinning(tables(s, dir).lineitem, Seq("l_quantity"), "equal_range", 10)
      .groupBy(col("l_quantity_binned").as("bin"))
      .agg(count(lit(1)).as("bin_count")),
    Some {
      val bin = binCaseSql("l_quantity", "lo", "hi", 10)
      s"""
      WITH mm AS (SELECT CAST(min(l_quantity) AS DOUBLE) AS lo,
                         CAST(max(l_quantity) AS DOUBLE) AS hi FROM lineitem)
      SELECT $bin AS bin, count(*) AS bin_count
      FROM lineitem, mm GROUP BY 1"""
    })

  val qBinningEqFreq = Q(
    "q_binning_equal_frequency",
    (s, dir) => Transformers
      .attributeBinning(tables(s, dir).orders, Seq("o_totalprice"), "equal_frequency", 4)
      .groupBy(col("o_totalprice_binned").as("bin"))
      .agg(count(lit(1)).as("bin_count")),
    Some {
      val whens = (1 to 3)
        .map(i => s"WHEN o_totalprice <= quantile_cont(o_totalprice, ${i * 0.25}) OVER () THEN $i")
        .mkString(" ")
      // quantile_cont as window is unsupported — use a CTE instead
      s"""
      WITH q AS (SELECT quantile_cont(o_totalprice, 0.25) AS c1,
                        quantile_cont(o_totalprice, 0.50) AS c2,
                        quantile_cont(o_totalprice, 0.75) AS c3 FROM orders)
      SELECT CASE WHEN o_totalprice <= c1 THEN 1
                  WHEN o_totalprice <= c2 THEN 2
                  WHEN o_totalprice <= c3 THEN 3
                  ELSE 4 END AS bin,
             count(*) AS bin_count
      FROM orders, q GROUP BY 1"""
    })

  val qMinMaxNorm = Q(
    "q_minmax_normalization",
    (s, dir) => Transformers
      .normalization(tables(s, dir).lineitem, Seq("l_extendedprice"), roundScale = 6)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("scaled")),
    Some("""
      WITH mm AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
                         CAST(max(l_extendedprice) AS DOUBLE) AS hi FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        round((l_extendedprice - lo) / (hi - lo), 6) AS scaled
      FROM lineitem, mm"""))

  val qZStandardization = Q(
    "q_z_standardization",
    (s, dir) => Transformers
      .zStandardization(tables(s, dir).lineitem, Seq("l_quantity", "l_tax"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("z_quantity"), col("l_tax").as("z_tax")),
    Some("""
      WITH st AS (SELECT avg(l_quantity) AS m1, stddev_samp(l_quantity) AS s1,
                         avg(l_tax) AS m2, stddev_samp(l_tax) AS s2 FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        round((l_quantity - m1) / s1, 4) AS z_quantity,
        round((l_tax - m2) / s2, 4) AS z_tax
      FROM lineitem, st"""))

  val qIqrStandardization = Q(
    "q_iqr_standardization",
    (s, dir) => Transformers
      .iqrStandardization(tables(s, dir).lineitem, Seq("l_quantity"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").as("scaled")),
    Some("""
      WITH q AS (SELECT quantile_cont(l_quantity, 0.25) AS q1,
                        quantile_cont(l_quantity, 0.50) AS q2,
                        quantile_cont(l_quantity, 0.75) AS q3 FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        round((l_quantity - q2) / (q3 - q1), 4) AS scaled
      FROM lineitem, q"""))

  val qFeatureMath = Q(
    "q_feature_math",
    (s, dir) => {
      val li = tables(s, dir).lineitem
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        round(Transformers.featureTransformation(col("l_extendedprice"), "ln"), 4).as("ln_price"),
        round(Transformers.featureTransformation(col("l_quantity"), "sqrt"), 4).as("sqrt_qty"),
        round(Transformers.featureTransformation(col("l_discount"), "sq"), 4).as("sq_discount"),
        Transformers.featureTransformation(col("l_quantity"), "floor").as("floor_qty"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        round(ln(l_extendedprice), 4) AS ln_price,
        round(sqrt(l_quantity), 4) AS sqrt_qty,
        round(pow(l_discount, 2), 4) AS sq_discount,
        CAST(floor(l_quantity) AS BIGINT) AS floor_qty
      FROM lineitem"""))

  val qOutlierCategories = Q(
    "q_outlier_categories",
    (s, dir) => Transformers
      .outlierCategories(tables(s, dir).part, Seq("p_type"), maxCategories = 6)
      .groupBy("p_type").agg(count(lit(1)).as("cat_count")),
    Some("""
      WITH kept AS (SELECT p_type FROM part GROUP BY p_type
                    ORDER BY count(*) DESC, p_type ASC LIMIT 5)
      SELECT CASE WHEN p_type IN (SELECT p_type FROM kept) THEN p_type
                  ELSE 'outlier_categories' END AS p_type,
             count(*) AS cat_count
      FROM part GROUP BY 1"""))

  val qTargetEncoding = Q(
    "q_target_encoding",
    (s, dir) => Transformers
      .targetEncoding(tables(s, dir).customer, Seq("c_mktsegment"), col("c_acctbal") > 5000)
      .select(col("c_mktsegment"), col("c_mktsegment_encoded"))
      .distinct(),
    Some("""
      SELECT c_mktsegment,
        round(CAST(count(CASE WHEN c_acctbal > 5000 THEN 1 END) AS DOUBLE) / count(*), 4)
          AS c_mktsegment_encoded
      FROM customer GROUP BY c_mktsegment"""))

  val qLabelEncoding = Q(
    "q_label_encoding",
    (s, dir) => Transformers
      .labelEncoding(tables(s, dir).orders, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("o_orderpriority_index"))
      .distinct(),
    Some("""
      SELECT o_orderpriority,
        CAST(row_number() OVER (ORDER BY cnt DESC, o_orderpriority ASC) - 1 AS INT)
          AS o_orderpriority_index
      FROM (SELECT o_orderpriority, count(*) AS cnt FROM orders
            WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority)"""))

  /** One-hot encoding: one 0/1 column per observed category. */
  val qOneHot = Q(
    "q_one_hot_encoding",
    (s, dir) => Transformers
      .oneHotEncoding(tables(s, dir).customer, Seq("c_mktsegment"))
      .select(col("c_custkey"),
        col("c_mktsegment_AUTOMOBILE"), col("c_mktsegment_BUILDING"),
        col("c_mktsegment_FURNITURE"), col("c_mktsegment_HOUSEHOLD"),
        col("c_mktsegment_MACHINERY")),
    Some("""
      SELECT c_custkey,
        CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS c_mktsegment_AUTOMOBILE,
        CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END AS c_mktsegment_BUILDING,
        CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END AS c_mktsegment_FURNITURE,
        CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END AS c_mktsegment_HOUSEHOLD,
        CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END AS c_mktsegment_MACHINERY
      FROM customer"""))

  /** DuckDB replay of [[Transformers.quantileTransform]]: the same
    * `nq`-point quantile_cont grid (which the q_percentiles parity
    * already proves matches exactPercentiles) rounded to the same
    * `gridDp` grid, then the identical cell lookup (#points ≤ x) and
    * in-cell linear interpolation.
    */
  private def quantileTransformSql(cols: Seq[String], nq: Int, gridDp: Int): String = {
    val ps = (0 until nq).map(i => s"${i.toDouble / (nq - 1)}").mkString(", ")
    val gridCols = cols.zipWithIndex.map { case (c, ci) =>
      s"list_transform(quantile_cont($c, [$ps]), e -> round(e, $gridDp)) AS g$ci"
    }.mkString(",\n             ")
    val idxCols = cols.zipWithIndex.map { case (c, ci) =>
      s"len(list_filter(g.g$ci, e -> e <= l.$c)) AS i$ci"
    }.mkString(", ")
    val outCols = cols.zipWithIndex.map { case (c, ci) =>
      s"""CASE WHEN $c IS NULL THEN NULL
         |       WHEN i$ci = 0 THEN 0.0
         |       WHEN i$ci = $nq THEN 1.0
         |       ELSE round((i$ci - 1 + ($c - g$ci[i$ci]) / (g$ci[i$ci + 1] - g$ci[i$ci]))
         |                  / ${nq - 1}.0, 4) + 0.0 END AS ${c}_qt""".stripMargin
    }.mkString(",\n      ")
    s"""
      WITH g AS (SELECT $gridCols FROM lineitem),
      ix AS (SELECT l.l_orderkey, l.l_linenumber, l.${cols.mkString(", l.")},
                    ${idxCols}, ${cols.indices.map(ci => s"g.g$ci").mkString(", ")}
             FROM lineitem l CROSS JOIN g)
      SELECT l_orderkey, l_linenumber,
      $outCols
      FROM ix"""
  }

  /** Quantile/ECDF transform (sklearn QuantileTransformer's uniform
    * mode) over two lineitem measures — fit by distributed histogram
    * selection, apply map-only, fully oracle-checked.
    */
  val qQuantileTransform = Q(
    "q_quantile_transform",
    (s, dir) => Transformers.quantileTransform(
      tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Seq("l_quantity", "l_extendedprice"))
      .select("l_orderkey", "l_linenumber", "l_quantity_qt", "l_extendedprice_qt"),
    Some(quantileTransformSql(Seq("l_quantity", "l_extendedprice"), nq = 101, gridDp = 6)))

  /** The quantile_transform YAML stage end-to-end: same fit+apply as
    * q_quantile_transform but driven through the workflow runner — the
    * oracle replays the identical grid/interpolation, proving the stage
    * wiring adds nothing and loses nothing.
    */
  val qWorkflowQuantile = Q(
    "q_workflow_quantile",
    (s, dir) => {
      val yaml = s"""
input_dataset:
  read_dataset:
    file_path: "$dir/lineitem.parquet"
    file_type: parquet
  select_column: [l_orderkey, l_linenumber, l_quantity]
transformers:
  quantile_transform:
    list_of_cols: [l_quantity]
    n_quantiles: 101
"""
      val (df, _) = graft.workflow.Workflow.run(s, yaml)
      df.select("l_orderkey", "l_linenumber", "l_quantity_qt")
    },
    Some(quantileTransformSql(Seq("l_quantity"), nq = 101, gridDp = 6)))

  /** cat_to_num_transformer DISPATCH oracle (ref transformers.py:428-503):
    * one run per route — supervised (labelCol ⇒ target encoding),
    * label_encoding, onehot_encoding — on the same column, each summarized
    * to (route, category, value) rows. The hash match checks the routing
    * DECISION itself (which arm fires for which config) on top of the
    * per-arm oracles the individual queries already carry.
    */
  val qCatToNumDispatch = Q(
    "q_cat_to_num_dispatch",
    (s, dir) => {
      val o = tables(s, dir).orders
      val sup = Transformers
        .catToNumTransformer(o, Seq("o_orderpriority"),
          labelCol = Some("o_orderstatus"), eventLabel = "F")
        .select(col("o_orderpriority").as("category"),
          col("o_orderpriority_encoded").cast("double").as("value"))
        .distinct()
        .withColumn("route", lit("supervised"))
      val lab = Transformers
        .catToNumTransformer(o, Seq("o_orderpriority"), encoding = "label_encoding")
        .select(col("o_orderpriority").as("category"),
          col("o_orderpriority_index").cast("double").as("value"))
        .distinct()
        .withColumn("route", lit("label"))
      val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val ohWide = Transformers
        .catToNumTransformer(o, Seq("o_orderpriority"), encoding = "onehot_encoding")
      val oh = ohWide
        .agg(sum(col(s"`o_orderpriority_${pris.head}`")).as(pris.head),
          pris.tail.map(p => sum(col(s"`o_orderpriority_$p`")).as(p)): _*)
        .select(expr(
          s"stack(${pris.size}, ${pris.map(p => s"'$p', cast(`$p` as double)").mkString(", ")}) " +
            "as (category, value)"))
        .withColumn("route", lit("onehot"))
      sup.unionByName(lab).unionByName(oh)
        .select("route", "category", "value")
    },
    Some("""
      WITH sup AS (
        SELECT 'supervised' AS route, o_orderpriority AS category,
               round(CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE)
                 / count(*), 4) AS value
        FROM orders GROUP BY o_orderpriority),
      lab AS (
        SELECT 'label' AS route, o_orderpriority AS category,
               CAST(row_number() OVER (ORDER BY cnt DESC, o_orderpriority ASC) - 1 AS DOUBLE)
                 AS value
        FROM (SELECT o_orderpriority, count(*) AS cnt FROM orders
              WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority)),
      oh AS (
        SELECT 'onehot' AS route, o_orderpriority AS category,
               CAST(count(*) AS DOUBLE) AS value
        FROM orders GROUP BY o_orderpriority)
      SELECT route, category, value FROM sup
      UNION ALL SELECT route, category, value FROM lab
      UNION ALL SELECT route, category, value FROM oh"""))

  def all: Seq[Q] = Seq(qBinning, qBinningEqFreq, qMinMaxNorm, qZStandardization,
    qIqrStandardization, qFeatureMath, qOutlierCategories, qTargetEncoding, qLabelEncoding,
    qOneHot, qQuantileTransform, qWorkflowQuantile, qCatToNumDispatch)
}
