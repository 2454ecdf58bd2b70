package graft.queries

import graft.functions.Multimodal
import graft.operators.{KnnImputer, LatentFeatures, Transformers}
import graft.queries.QueryPack._
import graft.workflow.Workflow
import org.apache.spark.sql.functions._

/** ML-backed transformers, multimodal plumbing, and the YAML workflow
  * runner as driver-checkable queries.
  */
object MLQueries {

  /** DuckDB replay of the portable 4-column PCA
    * (`LatentFeatures.pcaLatentFeaturesPortable`): the correlation matrix
    * (entries rounded to `dp` decimals, where Spark-vs-DuckDB `corr`
    * last-ulp noise dies) is diagonalized by `sweeps` unrolled cyclic-
    * Jacobi sweeps — one CTE pair per rotation, every updated A/V entry
    * re-rounded to the same grid, so both engines walk the identical
    * quantized trajectory (the q_ivf_topk / q_geo_vincenty fixed-
    * iteration trick applied to an eigensolver). Eigenpairs then rank
    * (λ desc, cid asc), sign-fix on the largest-|loading| coordinate,
    * and project the z-scores. The engine's cutoff-0.8 resolves to all 4
    * components on this near-orthogonal data (λ ≈ 1 each), which the
    * oracle emits; a shrunken k would surface as a loud schema mismatch.
    */
  private def pcaJacobiSql(
      sweeps: Int, dp: Int, latentK: Int = 4, recon: Boolean = false): String = {
    val p = 4
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def aName(i: Int, j: Int) = if (i <= j) s"a$i$j" else s"a$j$i"
    val aEntries = for (i <- 1 to p; j <- i to p) yield aName(i, j)
    val vEntries = for (i <- 1 to p; j <- 1 to p) yield s"v$i$j"
    val carry = (1 to p).flatMap(i => Seq(s"mu$i", s"sd$i"))
    val pairsIdx = for (i <- 1 to p; j <- (i + 1) to p) yield (i, j)

    val stCols = (cols.zipWithIndex.flatMap { case (c, i) =>
      // mu/sd rounded to the same dp grid as the correlation entries —
      // matches the engine's rq(mu)/rq(sd) (removes the residual risk of
      // an unquantized value on a round(.,4) projection boundary)
      Seq(s"round(avg($c), $dp) AS mu${i + 1}",
        s"round(stddev_samp($c), $dp) AS sd${i + 1}")
    } ++ pairsIdx.map { case (i, j) =>
      s"round(corr(${cols(i - 1)}, ${cols(j - 1)}), $dp) AS c$i$j"
    }).mkString(", ")

    val r0Cols = (aEntries.map {
      case n if n(1) == n(2) => s"1.0 AS $n"
      case n                 => s"c${n.drop(1)} AS $n"
    } ++ vEntries.map { n =>
      if (n(1) == n(2)) s"1.0 AS $n" else s"0.0 AS $n"
    } ++ carry).mkString(", ")

    val allRots = Seq.fill(sweeps)(pairsIdx).flatten.zipWithIndex
    val rotCtes = allRots.map { case ((pp, qq), t0) =>
      val t = t0 + 1
      val apq = aName(pp, qq); val app = aName(pp, pp); val aqq = aName(qq, qq)
      val updates = scala.collection.mutable.LinkedHashMap.empty[String, String]
      updates(app) = s"round(co*co*$app + 2.0*si*co*$apq + si*si*$aqq, $dp)"
      updates(aqq) = s"round(si*si*$app - 2.0*si*co*$apq + co*co*$aqq, $dp)"
      updates(apq) = "0.0"
      for (r <- 1 to p if r != pp && r != qq) {
        val arp = aName(r, pp); val arq = aName(r, qq)
        updates(arp) = s"round(co*$arp + si*$arq, $dp)"
        updates(arq) = s"round(-si*$arp + co*$arq, $dp)"
      }
      for (i <- 1 to p) {
        updates(s"v$i$pp") = s"round(co*v$i$pp + si*v$i$qq, $dp)"
        updates(s"v$i$qq") = s"round(-si*v$i$pp + co*v$i$qq, $dp)"
      }
      val sel = (aEntries ++ vEntries).map(n =>
        updates.get(n).map(e => s"$e AS $n").getOrElse(n)) ++ carry
      // MATERIALIZED: keeps DuckDB from inlining the 72-CTE chain into
      // one exponentially-expanded plan (same guard as ivfTopKSql)
      s"""t$t AS MATERIALIZED (SELECT *, CASE WHEN $apq = 0 THEN 0.0
         |          ELSE 0.5 * atan2(2.0 * $apq, $app - $aqq) END AS th
         |        FROM r${t - 1}),
         |r$t AS MATERIALIZED (SELECT ${sel.mkString(", ")}
         |        FROM (SELECT *, cos(th) AS co, sin(th) AS si FROM t$t))""".stripMargin
    }.mkString(",\n")
    val rN = s"r${allRots.size}"

    val eigRows = (1 to p).map { c =>
      s"SELECT $c AS cid, ${aName(c, c)} AS ev, ${(1 to p).map(i => s"v$i$c AS w$i").mkString(", ")} FROM $rN"
    }.mkString("\n      UNION ALL ")

    val absMax = s"greatest(${(1 to p).map(i => s"abs(w$i)").mkString(", ")})"
    val pick = (1 until p).map(i => s"WHEN abs(w$i) = m THEN w$i").mkString(" ")
    val projTerm = (k: Int) => (1 to p).map(i =>
      s"(l.${cols(i - 1)} - st.mu$i) * (ld$k.wf$i / st.sd$i)").mkString(" + ")
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")

    s"""
      WITH li AS (SELECT * FROM lineitem WHERE $notNull),
      st AS (SELECT $stCols FROM li),
      r0 AS (SELECT $r0Cols FROM st),
      $rotCtes,
      eig AS ($eigRows),
      orde AS (SELECT *, row_number() OVER (ORDER BY ev DESC, cid ASC) AS rk FROM eig),
      ld AS (SELECT rk, ${(1 to p).map(i => s"w$i * f AS wf$i").mkString(", ")} FROM (
               SELECT *, CASE WHEN (CASE $pick ELSE w$p END) < 0
                 THEN -1.0 ELSE 1.0 END AS f
               FROM (SELECT *, $absMax AS m FROM orde))),
      ${(1 to p).map(k => s"ld$k AS (SELECT * FROM ld WHERE rk = $k)").mkString(",\n      ")}${
        val latentSelect = (1 to latentK).map(k =>
          s"round(${projTerm(k)}, 4) + 0.0 AS latent_${k - 1}").mkString(",\n        ")
        val fromLds = (1 to latentK).map(k => s"CROSS JOIN ld$k").mkString(" ")
        if (!recon)
          s"""
      SELECT l.l_orderkey, l.l_linenumber,
        $latentSelect
      FROM li l CROSS JOIN st $fromLds"""
        else {
          // decode from the ROUNDED latents (same rule as the engine):
          // recon_j = round(mu_j + sd_j * Σ_k latent_k · wf_kj, 4)
          val reconSelect = cols.zipWithIndex.map { case (c, j0) =>
            val i = j0 + 1
            val code = (1 to latentK).map(k => s"b.latent_${k - 1} * ld$k.wf$i").mkString(" + ")
            s"round(st.mu$i + st.sd$i * ($code), 4) + 0.0 AS recon_$c"
          }.mkString(",\n        ")
          s""",
      base AS (SELECT l.l_orderkey, l.l_linenumber,
        $latentSelect
      FROM li l CROSS JOIN st $fromLds)
      SELECT b.l_orderkey, b.l_linenumber,
        ${(0 until latentK).map(i => s"b.latent_$i").mkString(", ")},
        $reconSelect
      FROM base b CROSS JOIN st $fromLds"""
        }
      }"""
  }

  /** PCA latent features over the 4 numeric lineitem columns, cutoff
    * 0.8 — the full fit+apply pipeline oracle-checked via the quantized-
    * Jacobi replay ([[pcaJacobiSql]]). The Breeze `pcaLatentFeatures`
    * stays the default production path; ImputerSpec proves the portable
    * variant agrees with it to 1e-3 on every latent (up to the shared
    * sign convention).
    */
  val qPcaLatent = Q(
    "q_pca_latent",
    (s, dir) => LatentFeatures.pcaLatentFeaturesPortable(
      tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      explainedVarianceCutoff = 0.8, sweeps = 6, quantizeDp = 9),
    Some(pcaJacobiSql(sweeps = 6, dp = 9)))

  /** Two-column PCA — the one PCA configuration whose eigenstructure is
    * CLOSED-FORM (corr matrix [[1,r],[r,1]] ⇒ eigenvectors (1,±1)/√2,
    * eigenvalues 1±r), so the whole fit+apply replays analytically in
    * SQL: latent_0 = (z₁ + sign(r)·z₂)/√2, latent_1 = (z₁ − sign(r)·z₂)/√2
    * under the largest-|loading|-positive sign convention. Turns the PCA
    * core (standardize → eigencomposition → codegen projection) into a
    * hard oracle row; the 4-column q_pca_latent stays the production
    * configuration.
    */
  val qPca2Col = Q(
    "q_pca_2col",
    (s, dir) => LatentFeatures.pcaLatentFeatures(
      tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Seq("l_quantity", "l_extendedprice"),
      explainedVarianceCutoff = 0.999)
      // `+ 0.0` collapses -0.0 → 0.0 identically on both engines
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("latent_0") + lit(0.0)).as("latent_0"),
        (col("latent_1") + lit(0.0)).as("latent_1")),
    Some("""
      WITH s AS (
        SELECT avg(l_quantity) AS mu1, stddev_samp(l_quantity) AS sd1,
               avg(l_extendedprice) AS mu2, stddev_samp(l_extendedprice) AS sd2,
               CASE WHEN corr(l_quantity, l_extendedprice) >= 0 THEN 1.0 ELSE -1.0 END AS sg
        FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        round(((l_quantity - mu1) / sd1 + sg * (l_extendedprice - mu2) / sd2)
              / sqrt(2.0), 4) + 0.0 AS latent_0,
        round(((l_quantity - mu1) / sd1 - sg * (l_extendedprice - mu2) / sd2)
              / sqrt(2.0), 4) + 0.0 AS latent_1
      FROM lineitem, s"""))

  /** ALS matrix-factorization imputation over a deterministically-nulled
    * user×metric matrix derived from events (model-based → rows-only).
    */
  val qAlsImpute = Q(
    "q_als_imputation",
    (s, dir) => {
      val e = tables(s, dir).events
      val wide = e.groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(avg(col("value")))
        .withColumn("click", when(col("user_id") % 5 === 0, lit(null)).otherwise(col("click")))
      LatentFeatures.imputationMatrixFactorization(
        wide, "user_id", Seq("click", "view", "purchase", "signup", "error"),
        rank = 4, maxIter = 5)
    },
    None)

  /** Auto-imputation harness: masks clean rows, compares candidate
    * imputers by RMSE (seeded mask → rows-only).
    */
  val qAutoImputation = Q(
    "q_auto_imputation",
    (s, dir) => {
      import s.implicits._
      val (best, rmses) = LatentFeatures.autoImputation(
        tables(s, dir).lineitem.select("l_quantity", "l_extendedprice"),
        Seq("l_quantity", "l_extendedprice"))
      rmses.toSeq.toDF("method", "rmse").withColumn("best", lit(best))
    },
    None)

  /** Monotonic binning with exact percentiles: the oracle re-runs the
    * whole fit loop in SQL — per k ∈ [3, maxBins] compute equal-frequency
    * cuts (quantile_cont ≡ exact interpolated percentile), bin, check the
    * event-rate profile for monotonicity, pick the LARGEST monotone k
    * (the Scala loop descends from maxBins and returns on first success),
    * fall back to k = 2.
    */
  val qMonotonicBinning = Q(
    "q_monotonic_binning",
    (s, dir) => {
      val o = tables(s, dir).orders
      Transformers.monotonicBinning(o, "o_totalprice", "o_orderstatus",
        col("o_orderstatus") === "F", maxBins = 10, approx = false)
        .groupBy("o_totalprice_binned").agg(count(lit(1)).as("n"))
    },
    Some {
      // DuckDB quantile_cont needs CONSTANT probabilities — expand the
      // (k, i) grid to 44 constant aggregates at SQL-generation time
      // (same doubles as the Scala fit's i.toDouble / k)
      val kis = (2 to 10).flatMap(k => (1 until k).map(i => (k, i)))
      val qAggs = kis.map { case (k, i) =>
        s"quantile_cont(CAST(o_totalprice AS DOUBLE), ${i.toDouble / k}) AS q_${k}_$i"
      }.mkString(",\n            ")
      val cutRows = kis.map { case (k, i) =>
        s"SELECT $k AS k, $i AS i, q_${k}_$i AS cut FROM q"
      }.mkString("\n            UNION ALL ")
      s"""
      WITH q AS (SELECT $qAggs FROM orders),
      cuts AS ($cutRows),
      binned AS (
        SELECT o.o_orderkey, c.k,
               any_value(o.o_orderstatus) AS status,
               CAST(1 + count(*) FILTER (WHERE c.cut < CAST(o.o_totalprice AS DOUBLE)) AS INT) AS bin
        FROM orders o JOIN cuts c ON true
        GROUP BY o.o_orderkey, c.k),
      rates AS (SELECT k, bin,
                       avg(CASE WHEN status = 'F' THEN 1.0 ELSE 0.0 END) AS rate
                FROM binned GROUP BY k, bin),
      diffs AS (SELECT k, rate - lag(rate) OVER (PARTITION BY k ORDER BY bin) AS d
                FROM rates),
      mono AS (SELECT k FROM diffs WHERE d IS NOT NULL
               GROUP BY k HAVING bool_and(d >= 0) OR bool_and(d <= 0)),
      best(bk) AS (SELECT coalesce(max(k) FILTER (WHERE k >= 3), 2) FROM mono)
      SELECT b.bin AS o_totalprice_binned, count(*) AS n
      FROM binned b, best WHERE b.k = best.bk
      GROUP BY 1"""
    })

  /** Box-Cox transformation (λ argmax by skewness — deterministic but the
    * 15-λ argmax is unwieldy in SQL → rows-only).
    */
  /** Boxcox λ selection IS the operator's fit — oracle-checkable: the
    * argmin over |population skewness| of x^λ (ln x at λ=0) is a pure
    * aggregate on both engines; ulp-level double differences cannot flip
    * the argmin off a near-tie-free profile.
    */
  val qBoxcoxLambda = Q(
    "q_boxcox_lambda",
    (s, dir) => {
      import s.implicits._
      val (_, lambdas) = Transformers.boxcoxTransformation(
        tables(s, dir).lineitem.select("l_extendedprice"),
        Seq("l_extendedprice"))
      lambdas.toSeq.toDF("attribute", "lambda")
    },
    Some {
      val values = Transformers.boxcoxLambdas
        .map(l => s"(CAST($l AS DOUBLE))").mkString(", ")
      s"""
      WITH lam(l) AS (VALUES $values),
      tx AS (SELECT l, CASE WHEN l = 0 THEN ln(l_extendedprice)
                            ELSE pow(l_extendedprice, l) END AS v
             FROM lineitem CROSS JOIN lam),
      m AS (SELECT l, avg(v) AS mu FROM tx GROUP BY l),
      sk AS (SELECT tx.l,
                    abs(avg(pow(v - mu, 3)) / pow(avg(pow(v - mu, 2)), 1.5)) AS s
             FROM tx JOIN m ON tx.l = m.l GROUP BY tx.l)
      SELECT 'l_extendedprice' AS attribute, l AS lambda FROM sk
      ORDER BY (CASE WHEN isnan(s) THEN 1 ELSE 0 END), s LIMIT 1"""
    })

  /** Full fit+apply: the oracle re-runs the λ argmin (same SQL as
    * q_boxcox_lambda) and applies the winning transform — an end-to-end
    * check that fit-on-data + apply-on-data agree across engines. The fit
    * sample cap (100k) is above sf0.01's row count, so both engines fit
    * on identical full data.
    */
  val qBoxcox = Q(
    "q_boxcox",
    (s, dir) => {
      val (out, _) = Transformers.boxcoxTransformation(
        tables(s, dir).lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        Seq("l_extendedprice"))
      out.select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 4).as("boxcox_price"))
    },
    Some {
      val values = Transformers.boxcoxLambdas
        .map(l => s"(CAST($l AS DOUBLE))").mkString(", ")
      s"""
      WITH lam(l) AS (VALUES $values),
      tx AS (SELECT l, CASE WHEN l = 0 THEN ln(l_extendedprice)
                            ELSE pow(l_extendedprice, l) END AS v
             FROM lineitem CROSS JOIN lam),
      m AS (SELECT l, avg(v) AS mu FROM tx GROUP BY l),
      sk AS (SELECT tx.l,
                    abs(avg(pow(v - mu, 3)) / pow(avg(pow(v - mu, 2)), 1.5)) AS s
             FROM tx JOIN m ON tx.l = m.l GROUP BY tx.l),
      best AS (SELECT l FROM sk
               ORDER BY (CASE WHEN isnan(s) THEN 1 ELSE 0 END), s LIMIT 1)
      SELECT l_orderkey, l_linenumber,
             round(CASE WHEN best.l = 0 THEN ln(l_extendedprice)
                        ELSE pow(l_extendedprice, best.l) END, 4) AS boxcox_price
      FROM lineitem CROSS JOIN best"""
    })

  /** Multimodal plumbing: text → binary payload → partition-wise batched
    * feature extraction (stubbed decode). n_bytes is oracle-checkable
    * (UTF-8 byte length); the fake features are computed then pruned.
    */
  val qMultimodal = Q(
    "q_multimodal_features",
    (s, dir) => {
      val docs = tables(s, dir).documents
        .withColumn("payload", col("text").cast("binary"))
      Multimodal.extractFeatures(docs, "doc_id", "payload", dim = 16)
        .select(col("doc_id"), col("n_bytes"))
    },
    Some("SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents"))

  private val workflowYaml = (dir: String) => s"""
input_dataset:
  read_dataset:
    file_path: "$dir/orders.parquet"
    file_type: parquet
  delete_column: [o_orderdate]
transformers:
  attribute_binning:
    list_of_cols: [o_totalprice]
    method_type: equal_range
    bin_size: 4
  outlier_categories:
    list_of_cols: [o_orderpriority]
    max_category: 3
"""

  /** End-to-end YAML workflow: ETL → binning → category outliers. The
    * oracle replays the same pipeline in SQL.
    */
  val qWorkflow = Q(
    "q_workflow_pipeline",
    (s, dir) => {
      val (df, _) = Workflow.run(s, workflowYaml(dir))
      df.groupBy(col("o_totalprice_binned").as("bin"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    },
    Some {
      val bin = binCaseSql("o_totalprice", "lo", "hi", 4)
      s"""
      WITH mm AS (SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
                         CAST(max(o_totalprice) AS DOUBLE) AS hi FROM orders),
      kept AS (SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
               ORDER BY count(*) DESC, o_orderpriority ASC LIMIT 2),
      t AS (SELECT $bin AS bin,
              CASE WHEN o_orderpriority IN (SELECT o_orderpriority FROM kept)
                   THEN o_orderpriority ELSE 'outlier_categories' END AS o_orderpriority
            FROM orders, mm)
      SELECT bin, o_orderpriority, count(*) AS n FROM t GROUP BY bin, o_orderpriority"""
    })

  /** The reference's FULL configs.yaml composition end-to-end (ref
    * config/configs.yaml:6-321 stage shape): ETL (delete/rename/recast)
    * → stats_generator → quality_checker (duplicate treatment → nullRows
    * → outlier value-clamp → MMM null imputation, in the runner's fixed
    * order) → transformers (equal-range binning + label encoding) →
    * association_evaluator + drift_detector (metric stages) →
    * write_main, answered from the RE-READ saved parquet. The income
    * fixture's dirty-data roles are planted deterministically on orders
    * (nulls where o_orderkey % 13 = 0, exact-duplicate rows where
    * % 101 = 0) and the oracle replays every treatment in SQL — bounds
    * as the 2nd order statistic of {pctile, mean±3σ, IQR fence}, median
    * fill, frequency-ranked label indices, min/max bin edges — so the
    * final-dataset hash proves the whole configured composition, not
    * just its pieces.
    */
  val qWorkflowFull = Q(
    "q_workflow_full",
    (s, dir) => {
      val scratch = new java.io.File(
        System.getProperty("java.io.tmpdir", "/tmp"), "graft_q_workflow_full").toString
      val o = s.read.parquet(s"$dir/orders.parquet")
      val doctored = o.withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, lit(null)).otherwise(col("o_totalprice")))
      doctored.unionByName(doctored.filter(col("o_orderkey") % 101 === 0))
        .write.mode("overwrite").parquet(s"$scratch/in")
      o.select("o_totalprice").write.mode("overwrite").parquet(s"$scratch/drift_src")
      val yaml = s"""input_dataset:
                    |  read_dataset:
                    |    file_path: "$scratch/in"
                    |    file_type: parquet
                    |  delete_column: [o_orderdate]
                    |  rename_column: {o_orderpriority: priority}
                    |  recast_column: {o_custkey: double}
                    |stats_generator:
                    |  list_of_cols: [o_totalprice]
                    |  metrics: [central_tendency]
                    |quality_checker:
                    |  duplicate_detection: {list_of_cols: all, treatment: true}
                    |  nullRows_detection: {treatment: true, treatment_threshold: 0.75}
                    |  outlier_detection: {list_of_cols: [o_totalprice], treatment: true,
                    |    treatment_method: value}
                    |  nullColumns_detection: {list_of_cols: [o_totalprice], treatment: true,
                    |    treatment_method: MMM}
                    |transformers:
                    |  attribute_binning: {list_of_cols: [o_totalprice],
                    |    method_type: equal_range, bin_size: 5}
                    |  cat_to_num_unsupervised: {list_of_cols: [priority]}
                    |association_evaluator:
                    |  correlation_matrix: {list_of_cols: [o_totalprice, o_custkey]}
                    |  IV_calculation: {list_of_cols: [priority], label_col: o_orderstatus,
                    |    event_label: F}
                    |drift_detector:
                    |  source_path: "$scratch/drift_src"
                    |  list_of_cols: [o_totalprice]
                    |write_main:
                    |  file_path: "$scratch/out"
                    |""".stripMargin
      graft.workflow.Workflow.run(s, yaml)
      s.read.parquet(s"$scratch/out")
        .groupBy(col("priority"), col("priority_index"),
          col("o_totalprice_binned").as("bin"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
            .as("total_price"))
    },
    Some {
      val bin = binCaseSql("i.o_totalprice", "mm.lo", "mm.hi", 5)
      s"""
      WITH doctored AS (
        SELECT o_orderkey, CAST(o_custkey AS DOUBLE) AS o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_totalprice END
                 AS o_totalprice,
               o_orderpriority AS priority
        FROM orders),
      uni AS (SELECT * FROM doctored
              UNION ALL SELECT * FROM doctored WHERE o_orderkey % 101 = 0),
      ded AS (SELECT DISTINCT * FROM uni),
      b AS (SELECT quantile_cont(o_totalprice, 0.05) AS pl,
                   quantile_cont(o_totalprice, 0.95) AS pu,
                   quantile_cont(o_totalprice, 0.25) AS q1,
                   quantile_cont(o_totalprice, 0.75) AS q3,
                   avg(o_totalprice) AS m, stddev_samp(o_totalprice) AS sd
            FROM ded),
      cb AS (SELECT list_sort([pl, m - 3*sd, q1 - 1.5*(q3-q1)])[2] AS lo,
                    list_sort([pu, m + 3*sd, q3 + 1.5*(q3-q1)])[2] AS hi
             FROM b),
      cl AS (SELECT d.* REPLACE (
               CASE WHEN d.o_totalprice > cb.hi THEN cb.hi
                    WHEN d.o_totalprice < cb.lo THEN cb.lo
                    ELSE d.o_totalprice END AS o_totalprice)
             FROM ded d, cb),
      med AS (SELECT quantile_cont(o_totalprice, 0.5) AS v FROM cl),
      imp AS (SELECT cl.* REPLACE (
                coalesce(o_totalprice, (SELECT v FROM med)) AS o_totalprice)
              FROM cl),
      mm AS (SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
                    CAST(max(o_totalprice) AS DOUBLE) AS hi FROM imp),
      enc AS (SELECT priority,
                CAST(row_number() OVER (ORDER BY cnt DESC, priority ASC) - 1 AS INT)
                  AS priority_index
              FROM (SELECT priority, count(*) AS cnt FROM imp
                    WHERE priority IS NOT NULL GROUP BY priority)),
      binned AS (SELECT i.*, $bin AS bin FROM imp i, mm)
      SELECT b.priority, e.priority_index, b.bin,
             count(*) AS n_rows,
             round(CAST(sum(CAST(b.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_price
      FROM binned b JOIN enc e USING (priority)
      GROUP BY b.priority, e.priority_index, b.bin"""
    })

  /** save_stats write+reread BARRIER oracle (ref workflow save_stats):
    * the workflow's stats_generator writes its metric frames to
    * save_stats_path; this query answers from the RE-READ parquet — not
    * the in-session frame — so the hash match proves the saved artifact
    * round-trips the full stats content (schema, decimals, mode
    * tie-breaks) through disk.
    */
  val qWorkflowSaveStats = Q(
    "q_workflow_save_stats",
    (s, dir) => {
      // fixed scratch path, not createTempDirectory: bench retries and
      // TriScale tiers would otherwise leave an orphaned dir per run
      val statsDir = new java.io.File(
        System.getProperty("java.io.tmpdir", "/tmp"),
        "graft_q_workflow_save_stats").toString
      val yaml = s"""input_dataset:
                    |  read_dataset:
                    |    file_path: "$dir/orders.parquet"
                    |    file_type: parquet
                    |stats_generator:
                    |  list_of_cols: [o_totalprice, o_custkey]
                    |  metrics: [central_tendency]
                    |  save_stats_path: "$statsDir"
                    |""".stripMargin
      Workflow.run(s, yaml)
      s.read.parquet(s"$statsDir/central_tendency")
    },
    // mode ties break on the STRING form of the value (the engine's melt
    // casts to string before ranking) — same parity rules as
    // q_central_tendency, replayed against orders
    Some {
      def one(c: String) =
        s"""SELECT '$c' AS attribute,
            CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / count($c) AS mean,
            quantile_cont($c, 0.5) AS median,
            (SELECT CAST($c AS VARCHAR) FROM orders WHERE $c IS NOT NULL
               GROUP BY $c ORDER BY count(*) DESC, CAST($c AS VARCHAR) ASC LIMIT 1) AS mode,
            (SELECT count(*) FROM orders WHERE $c IS NOT NULL GROUP BY $c
               ORDER BY count(*) DESC, CAST($c AS VARCHAR) ASC LIMIT 1) AS mode_rows,
            round((SELECT CAST(count(*) AS DOUBLE) FROM orders WHERE $c IS NOT NULL
                     GROUP BY $c ORDER BY count(*) DESC, CAST($c AS VARCHAR) ASC LIMIT 1)
                  / count($c), 4) AS mode_pct
            FROM orders"""
      Seq("o_totalprice", "o_custkey").map(one).mkString(" UNION ALL ")
    })

  private val varClusCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey", "l_suppkey")

  /** Variable clustering over lineitem numerics — the PORTABLE VarClusHi
    * path (quantized Jacobi, canonical sorted member lists, fixed-sweep
    * hill-climb), with a FULL DuckDB oracle: VarClusSql replays the whole
    * split → quartimax → NCS → hill-climb → RS pipeline via one Jacobi
    * per subset bitmask + three recursive CTEs. The Breeze production
    * path keeps its reference-parity coverage in VarClusSpec.
    */
  val qVarClus = Q(
    "q_variable_clustering",
    (s, dir) => graft.operators.VarClus.variableClusteringPortable(
      tables(s, dir).lineitem, varClusCols),
    Some(graft.queries.VarClusSql.sql(varClusCols)))

  /** KNN imputation (fit-small/apply-big contract; neighbour averages →
    * rows-only).
    */
  val qKnnImpute = Q(
    "q_knn_imputation",
    (s, dir) => {
      val li = tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .withColumn("l_quantity",
          when(col("l_orderkey") % 13 === 0, lit(null)).otherwise(col("l_quantity")))
      KnnImputer.imputationKnn(li, Seq("l_quantity", "l_extendedprice", "l_discount"),
        k = 5, sampleSize = 2000)
    },
    None)

  /** Deterministic KNN imputation with a FULL oracle: the neighbour
    * sample is the 2000 complete rows with the lowest md5 key hash (in
    * hash order), distances are the same scaled-euclidean expression on
    * both engines, neighbour ranks tie-break on sample order, and the
    * 5-neighbour mean fill replays exactly — DuckDB reproduces every
    * imputed cell. (The seeded-sample production imputationKnn stays
    * rows-only + RMSE-gated.)
    */
  val qKnnDeterministic = Q(
    "q_knn_deterministic",
    (s, dir) => {
      // (orderkey, linenumber, partkey, suppkey) is the unique row key —
      // the testdata has (orderkey, linenumber) duplicates, which would
      // merge distinct rows in the oracle's per-row window
      val li = tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .withColumn("l_quantity",
          when(col("l_orderkey") % 13 === 0, lit(null)).otherwise(col("l_quantity")))
      KnnImputer.imputationKnnDeterministic(
        li, Seq("l_quantity", "l_extendedprice", "l_discount"),
        sampleKeyCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        k = 5, sampleSize = 2000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), round(col("l_quantity"), 4).as("q_filled"))
    },
    Some("""
      WITH masked AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_quantity END AS q,
          l_extendedprice AS e, l_discount AS d
        FROM lineitem),
      st AS (SELECT stddev_samp(e) AS s2, stddev_samp(d) AS s3 FROM masked),
      samp AS (
        SELECT q, e, d,
          row_number() OVER (
            ORDER BY hh, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rk
        FROM (SELECT *,
            ('0x' || substr(md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR
              || '|' || l_partkey::VARCHAR || '|' || l_suppkey::VARCHAR), 1, 15))::BIGINT AS hh
          FROM masked WHERE q IS NOT NULL)),
      samp2 AS (SELECT * FROM samp WHERE rk <= 2000),
      nulls AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, e, d
                FROM masked WHERE q IS NULL),
      nn AS (
        SELECT n.l_orderkey, n.l_linenumber, n.l_partkey, n.l_suppkey, s.q AS sq,
          row_number() OVER (
            PARTITION BY n.l_orderkey, n.l_linenumber, n.l_partkey, n.l_suppkey
            ORDER BY (((n.e - s.e) / st.s2) * ((n.e - s.e) / st.s2)
                    + ((n.d - s.d) / st.s3) * ((n.d - s.d) / st.s3)) * 3 / 2,
              s.rk) AS rnk
        FROM nulls n CROSS JOIN samp2 s CROSS JOIN st),
      fills AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, avg(sq) AS fq
        FROM nn WHERE rnk <= 5
        GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey)
      SELECT m.l_orderkey, m.l_linenumber, m.l_partkey, m.l_suppkey,
        round(COALESCE(m.q, f.fq), 4) AS q_filled
      FROM masked m
      LEFT JOIN fills f
        ON m.l_orderkey = f.l_orderkey AND m.l_linenumber = f.l_linenumber
       AND m.l_partkey = f.l_partkey AND m.l_suppkey = f.l_suppkey"""))

  /** Iterative (round-robin ridge) imputation — the reference's
    * imputation_sklearn method_type="regression" analog (model-based →
    * rows-only; ImputerSpec carries the RMSE-quality assertions).
    */
  val qIterativeImputation = Q(
    "q_iterative_imputation",
    (s, dir) => {
      val li = tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .withColumn("l_extendedprice",
          when(col("l_orderkey") % 11 === 0, lit(null)).otherwise(col("l_extendedprice")))
      graft.operators.IterativeImputer.imputationIterative(
        li, Seq("l_quantity", "l_extendedprice", "l_discount"), sampleSize = 2000)
    },
    None)

  /** Deterministic iterative imputation with a FULL oracle: md5-lowest
    * complete-row sample, exact-integer Gram sums, identical-op-order
    * Gauss elimination, fixed round-robin apply sweeps — DuckDB
    * reproduces every coefficient and every imputed cell bit-for-bit
    * (IterImputeSql). The RNG production path stays RMSE-gated above.
    */
  val qIterDeterministic = Q(
    "q_iterative_deterministic",
    (s, dir) => {
      val li = tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .withColumn("l_quantity",
          when(col("l_orderkey") % 13 === 0, lit(null)).otherwise(col("l_quantity")))
        .withColumn("l_extendedprice",
          when(col("l_orderkey") % 11 === 0, lit(null)).otherwise(col("l_extendedprice")))
      graft.operators.IterativeImputer.imputationIterativeDeterministic(
        li, Seq("l_quantity", "l_extendedprice", "l_discount"),
        sampleKeyCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        scales = Seq(10000L, 100L, 10000L))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          round(col("l_quantity"), 4).as("q_f"),
          round(col("l_extendedprice"), 4).as("e_f"),
          round(col("l_discount"), 4).as("d_f"))
    },
    Some(graft.queries.IterImputeSql.sql(
      table = "lineitem",
      keyCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      maskedExprs = Seq(
        "CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE CAST(l_quantity AS DOUBLE) END",
        "CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE CAST(l_extendedprice AS DOUBLE) END",
        "CAST(l_discount AS DOUBLE)"),
      scales = Seq(10000L, 100L, 10000L),
      outNames = Seq("q_f", "e_f", "d_f"))))

  /** TF-IDF feature-recommender search over a corpus derived from the
    * documents table. The oracle replays the exact TF-IDF arithmetic
    * (ln-idf with +1 smoothing, cosine against the query vector, HALF_UP
    * round at 4, ties broken on ascending id) — the query-token list is
    * generated from the SAME Scala normalization as the engine side.
    */
  val qFeatureRec = Q(
    "q_feature_recommender",
    (s, dir) => graft.functions.FeatureRecommender.search(
      tables(s, dir).documents, "doc_id", "source", "text",
      query = "spark table join query window", topK = 10),
    Some {
      val qToks = graft.functions.TextOps
        .normalizeTextString("spark table join query window")
        .split(" ").filter(_.length > 1)
        .groupBy(identity).map { case (t, xs) => (t, xs.length) }.toSeq
      val qValues = qToks.map { case (t, n) => s"('$t', $n)" }.mkString(", ")
      val norm = "trim(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
      s"""
      WITH toks AS (
        SELECT doc_id AS id, unnest(str_split($norm, ' ')) AS token FROM documents),
      tok1 AS (SELECT id, token FROM toks WHERE length(token) > 1),
      tf AS (SELECT id, token, count(*) AS tf FROM tok1 GROUP BY 1, 2),
      cnt(n) AS (SELECT count(*) FROM documents),
      idf AS (SELECT token,
                     ln((CAST(n AS DOUBLE) + 1) / (count(DISTINCT id) + 1)) + 1 AS idf
              FROM tf CROSS JOIN cnt GROUP BY token, n),
      weighted AS (SELECT id, tf.token, tf * idf AS w FROM tf JOIN idf USING (token)),
      qtoks(token, qtf) AS (VALUES $qValues),
      qw AS (SELECT token, qtf * idf AS qw FROM qtoks JOIN idf USING (token)),
      qn(qnorm) AS (
        SELECT sqrt(CASE WHEN coalesce(sum(qw * qw), 0) <= 0 THEN 1.0
                         ELSE sum(qw * qw) END) FROM qw),
      dnorms AS (SELECT id, sqrt(sum(w * w)) AS dnorm FROM weighted GROUP BY id),
      dots AS (SELECT id, sum(w * qw.qw) AS dot
               FROM weighted JOIN qw USING (token) GROUP BY id)
      SELECT d.id, doc.source AS name,
             round(d.dot / (dn.dnorm * qn.qnorm), 4) AS score
      FROM dots d
      JOIN dnorms dn USING (id)
      CROSS JOIN qn
      JOIN documents doc ON doc.doc_id = d.id
      ORDER BY score DESC, d.id ASC LIMIT 10"""
    })

  private val attrCorpusQueries = Seq(
    "spark sql window aggregation pipeline",
    "language detection and text quality scoring")

  /** feature_mapper find_attr_by_relevance under the gate: every
    * building-corpus description ranks the documents "data dictionary"
    * (source as name, text as description) by TF-IDF cosine and keeps
    * rows at/above the threshold — the full multi-query fit+score+filter
    * replays in DuckDB (query tokens generated from the SAME Scala
    * normalization as the engine side, like q_feature_recommender).
    */
  val qFeatureMapper = Q(
    "q_feature_mapper",
    (s, dir) => graft.functions.FeatureRecommender.findAttrByRelevance(
      tables(s, dir).documents, "doc_id", "source", "text",
      attrCorpusQueries, threshold = 0.05),
    Some {
      val qValues = attrCorpusQueries.zipWithIndex.flatMap { case (q, qi) =>
        graft.functions.TextOps.normalizeTextString(q)
          .split(" ").filter(_.length > 1)
          .groupBy(identity).map { case (t, xs) => s"($qi, '$q', '$t', ${xs.length})" }
      }.mkString(", ")
      val norm = "trim(regexp_replace(lower(trim(concat_ws(' ', source, text))), '\\s+', ' ', 'g'))"
      s"""
      WITH base AS (SELECT doc_id AS id, source AS name, text AS adesc,
                           $norm AS t FROM documents),
      toks AS (SELECT id, unnest(str_split(t, ' ')) AS token FROM base),
      tok1 AS (SELECT id, token FROM toks WHERE length(token) > 1),
      tf AS (SELECT id, token, count(*) AS tf FROM tok1 GROUP BY 1, 2),
      cnt(n) AS (SELECT count(*) FROM base),
      idf AS (SELECT token,
                     ln((CAST(n AS DOUBLE) + 1) / (count(DISTINCT id) + 1)) + 1 AS idf
              FROM tf CROSS JOIN cnt GROUP BY token, n),
      weighted AS (SELECT id, tf.token, tf * idf AS w FROM tf JOIN idf USING (token)),
      q(qid, qtext, token, qtf) AS (VALUES $qValues),
      qw AS (SELECT qid, qtext, q.token, qtf * idf AS qw FROM q JOIN idf USING (token)),
      qn AS (SELECT qid, qtext, sqrt(sum(qw * qw)) AS qnorm FROM qw GROUP BY qid, qtext),
      dnorms AS (SELECT id, sqrt(sum(w * w)) AS dnorm FROM weighted GROUP BY id),
      dots AS (SELECT qid, id, sum(w * qw.qw) AS dot
               FROM weighted JOIN qw USING (token) GROUP BY qid, id)
      SELECT qn.qtext AS input_feature_desc, b.name AS attribute_name,
             b.adesc AS attribute_desc,
             round(d.dot / (dn.dnorm * qn.qnorm), 4) AS score
      FROM dots d
      JOIN qn USING (qid)
      JOIN dnorms dn USING (id)
      JOIN base b USING (id)
      WHERE round(d.dot / (dn.dnorm * qn.qnorm), 4) >= 0.05"""
    })

  /** REAL image decode end-to-end on the cluster path: synthesize a small
    * PNG per document (deterministic from doc_id), then decode with the
    * JDK ImageIO inside a partition-wise pass (rows-only: PNG encoder
    * bytes are JVM-version-specific, but decoded dims/intensities are
    * checked in-spec).
    */
  val qImageFeatures = Q(
    "q_image_features",
    (s, dir) => {
      val toPng = udf { id: Long =>
        val w = (id % 7 + 2).toInt; val h = (id % 5 + 2).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = ((id * 2654435761L) & 0xFFFFFF).toInt
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      // deterministic quarter of the corpus: the stage is map-only and
      // scales linearly, but ImageIO costs ~2 ms/image — no need to spend
      // bench time proving the same decode 5000 times
      val docs = tables(s, dir).documents
        .filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), toPng(col("doc_id")).as("payload"))
      graft.functions.Multimodal.imageFeatures(docs, "doc_id", "payload")
    },
    // closed-form oracle: PNG round-trip is lossless for TYPE_INT_RGB, so
    // the decoded dims/bands/mean-intensity equal the generator's formula
    // exactly (uniform color ⇒ sum = w·h·(r+g+b); the double division is
    // bit-identical on both engines) — an end-to-end check that the
    // distributed encode→decode path preserves pixel data
    Some("""
      WITH c AS (
        SELECT doc_id,
               CAST(doc_id % 7 + 2 AS INT) AS width,
               CAST(doc_id % 5 + 2 AS INT) AS height,
               CAST(3 AS INT) AS bands,
               (doc_id * 2654435761) % 16777216 AS rgb
        FROM documents WHERE doc_id % 4 = 0)
      SELECT doc_id, width, height, bands,
             CAST(width * height * ((rgb // 65536) + ((rgb // 256) % 256) + (rgb % 256)) AS DOUBLE)
               / (width * height * 3 * 255.0) AS mean_intensity
      FROM c"""))

  /** REAL video demux + decode end-to-end: synthesize an MJPEG-AVI per
    * document (uniform-gray JPEG frames, all parameters deterministic
    * from doc_id), demux the RIFF container and decode every frame with
    * the JDK JPEG decoder in a partition-wise pass. Closed-form EXACT
    * oracle: a uniform-gray frame survives JPEG quantization exactly
    * (Y = g is a DC-only block, Cb = Cr = 128 — verified for all 256
    * gray levels), so decoded dims/intensity equal the generator's
    * formula — the hash match proves the whole mux → demux → decode
    * pipeline round-trips pixel data.
    */
  val qVideoFeatures = Q(
    "q_video_features",
    (s, dir) => {
      val toAvi = udf { id: Long =>
        val nFrames = (id % 3 + 2).toInt
        val frames = (0 until nFrames).map { i =>
          val g = ((id * 37 + i * 59) % 256).toInt
          val img = new java.awt.image.BufferedImage(32, 24,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < 24) { var x = 0; while (x < 32) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        Multimodal.muxMjpegAvi(frames, 32, 24, fps = 25)
      }
      // deterministic eighth of the corpus: the stage is map-only and
      // scales linearly; JPEG encode costs ~2 ms/frame — no need to
      // prove the same round-trip 15000 times per bench run
      val docs = tables(s, dir).documents
        .filter(col("doc_id") % 8 === 0)
        .select(col("doc_id"), toAvi(col("doc_id")).as("payload"))
      Multimodal.videoFeatures(docs, "doc_id", "payload")
    },
    // mean_intensity replays the decoder's sum/(w·h·bands·255.0) with
    // the same exactly-representable integers, so the one IEEE division
    // is bit-identical on both engines
    Some("""
      WITH v AS (
        SELECT doc_id, CAST(doc_id % 3 + 2 AS INT) AS n_frames
        FROM documents WHERE doc_id % 8 = 0),
      f AS (
        SELECT doc_id, n_frames, CAST(i AS INT) AS frame_idx,
               (doc_id * 37 + CAST(i AS INT) * 59) % 256 AS g
        FROM v, unnest(range(0, n_frames)) AS u(i))
      SELECT doc_id, frame_idx, n_frames,
             CAST(25 AS DOUBLE) AS fps,
             CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
             CAST(32 AS INT) AS frame_width, CAST(24 AS INT) AS frame_height,
             CAST(32 * 24 * 3 * g AS DOUBLE) / (32 * 24 * 3 * 255.0) AS mean_intensity
      FROM f"""))

  /** Linear-autoencoder latent features (seeded GD solver → rows-only;
    * StreamingSpec gates the fit on reconstruction RMSE).
    */
  val qAutoencoderLatent = Q(
    "q_autoencoder_latent",
    (s, dir) => LatentFeatures.autoencoderLatentFeatures(
      tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      latentDim = 2),
    None)

  /** Deterministic autoencoder sibling with a FULL oracle: a linear
    * autoencoder's optimum is the top-k principal subspace (Baldi &
    * Hornik 1989), so the closed-form encoder/decoder come from the
    * quantized-Jacobi eigenbasis — the 2-latent bottleneck AND the
    * 4-column reconstruction both replay in DuckDB via the extended
    * Jacobi CTE chain (decode runs off the rounded latents on both
    * engines). The seeded-GD production path (q_autoencoder_latent)
    * stays RMSE-gated.
    */
  /** Deterministic auto-imputation sibling: md5 cell mask at 10%, three
    * closed-form candidates (mean / median / partner-column OLS with
    * 9-dp-quantized fit), Σ√MSE/|mean| scoring on the 4-decimal grid,
    * argmin selection — the full harness INCLUDING the method-selection
    * decision replays in DuckDB. The RNG path (q_auto_imputation) stays
    * spec-gated. The fixture pairs gross with net price (corr ≈ 0.998 —
    * quantity/extendedprice are near-independent in this data), so
    * regression must WIN: the oracle verifies a real selection decision,
    * not a tie resolved by name order.
    */
  val qAutoImputeDeterministic = Q(
    "q_auto_imputation_deterministic",
    (s, dir) => LatentFeatures.autoImputationDeterministic(
      tables(s, dir).lineitem.select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("gross_price"),
        (col("l_extendedprice").cast("double") *
          (lit(1.0) - col("l_discount").cast("double"))).as("net_price")),
      Seq("gross_price", "net_price"),
      Seq("l_orderkey", "l_linenumber")),
    Some {
      val thr = graft.sources.Sampling.hashThresholdLong(0.1)
      def mask(c: String) =
        s"""('0x' || substr(md5(concat_ws('#', CAST(l_orderkey AS VARCHAR),
           |   CAST(l_linenumber AS VARCHAR), '$c')), 1, 15))::BIGINT < $thr""".stripMargin
      s"""
      WITH clean AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_extendedprice AS DOUBLE) AS a,
               CAST(l_extendedprice AS DOUBLE) * (1.0 - CAST(l_discount AS DOUBLE)) AS b
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
      mk AS (SELECT *, ${mask("gross_price")} AS ma, ${mask("net_price")} AS mb
             FROM clean),
      st AS (SELECT
        round(avg(a) FILTER (WHERE NOT ma), 9) AS mua,
        round(avg(b) FILTER (WHERE NOT mb), 9) AS mub,
        round(quantile_cont(a, 0.5) FILTER (WHERE NOT ma), 9) AS meda,
        round(quantile_cont(b, 0.5) FILTER (WHERE NOT mb), 9) AS medb,
        round(avg(a), 9) AS na, round(avg(b), 9) AS nb,
        round(avg(a) FILTER (WHERE NOT ma AND NOT mb), 9) AS fa,
        round(avg(b) FILTER (WHERE NOT ma AND NOT mb), 9) AS fb,
        round(stddev_samp(a) FILTER (WHERE NOT ma AND NOT mb), 9) AS sda,
        round(stddev_samp(b) FILTER (WHERE NOT ma AND NOT mb), 9) AS sdb,
        round(corr(a, b) FILTER (WHERE NOT ma AND NOT mb), 9) AS r
        FROM mk),
      co AS (SELECT *, (r * sda) / sdb AS b1a, (r * sdb) / sda AS b1b FROM st),
      co2 AS (SELECT *, fa - b1a * fb AS b0a, fb - b1b * fa AS b0b FROM co),
      er AS (SELECT
        avg(CASE WHEN ma THEN pow(mua - a, 2) END) AS msea_mean,
        avg(CASE WHEN mb THEN pow(mub - b, 2) END) AS mseb_mean,
        avg(CASE WHEN ma THEN pow(meda - a, 2) END) AS msea_median,
        avg(CASE WHEN mb THEN pow(medb - b, 2) END) AS mseb_median,
        avg(CASE WHEN ma THEN
              pow((CASE WHEN mb THEN mua ELSE b0a + b1a * b END) - a, 2) END) AS msea_regression,
        avg(CASE WHEN mb THEN
              pow((CASE WHEN ma THEN mub ELSE b0b + b1b * a END) - b, 2) END) AS mseb_regression
        FROM mk, co2),
      sc AS (
        SELECT 'mean' AS method,
               round(sqrt(msea_mean) / greatest(abs(na), 1e-12)
                     + sqrt(mseb_mean) / greatest(abs(nb), 1e-12), 4) AS rmse
        FROM er, co2
        UNION ALL
        SELECT 'median',
               round(sqrt(msea_median) / greatest(abs(na), 1e-12)
                     + sqrt(mseb_median) / greatest(abs(nb), 1e-12), 4)
        FROM er, co2
        UNION ALL
        SELECT 'regression',
               round(sqrt(msea_regression) / greatest(abs(na), 1e-12)
                     + sqrt(mseb_regression) / greatest(abs(nb), 1e-12), 4)
        FROM er, co2)
      SELECT method, rmse,
             method = (SELECT method FROM sc ORDER BY rmse, method LIMIT 1) AS best
      FROM sc"""
    })

  val qAutoencoderDeterministic = Q(
    "q_autoencoder_deterministic",
    (s, dir) => LatentFeatures.autoencoderDeterministic(
      tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      latentDim = 2, sweeps = 6, quantizeDp = 9),
    Some(pcaJacobiSql(sweeps = 6, dp = 9, latentK = 2, recon = true)))

  private val alsItems = Seq("click", "view", "purchase", "signup", "error")

  /** Deterministic ALS sibling with a FULL oracle (the last RNG-only ML
    * fit gets its quantized-replay twin): per-(user,event_type) ratings
    * from a decimal-exact sum (order-independent on both engines), the
    * click cell masked for every 5th user, fit on the 400 lowest-md5
    * users, rank-2 ridge ALS with closed-form quantized init and 3 fixed
    * sweeps — AlsSql replays every Gram sum (exact BIGINT) and 2×2 solve
    * (identical IEEE expression order) so all observed and predicted
    * cells hash-match. The RNG production path (q_als_imputation) stays
    * RMSE-gated.
    */
  val qAlsDeterministic = Q(
    "q_als_deterministic",
    (s, dir) => {
      val e = tables(s, dir).events
      val itExpr = alsItems.zipWithIndex.tail.foldLeft(
        when(col("event_type") === alsItems.head, 0)) {
        case (acc, (c, i)) => acc.when(col("event_type") === c, i)
      }
      val cells = e.filter(col("event_type").isin(alsItems: _*))
        .groupBy(col("user_id").as("u"), col("event_type"))
        .agg(
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double").as("rsum"),
          count(col("value")).as("n"))
        .filter(col("n") > 0)
        .withColumn("it", itExpr.cast("int"))
        .filter(!(col("u") % 5 === 0 && col("it") === 0))
        .select("u", "it", "rsum", "n")
      LatentFeatures.alsDeterministic(cells, alsItems.size, alsItems,
        sampleSize = 400, sweeps = 3)
    },
    Some(AlsSql.sql(alsItems, maskItem = "click", sampleSize = 400, sweeps = 3)))

  def all: Seq[Q] = Seq(qPcaLatent, qPca2Col, qAlsImpute, qAutoImputation,
    qMonotonicBinning, qBoxcox, qBoxcoxLambda, qMultimodal, qWorkflow,
    qWorkflowFull, qWorkflowSaveStats, qVarClus,
    qKnnImpute, qKnnDeterministic, qIterativeImputation, qIterDeterministic,
    qAlsDeterministic,
    qFeatureRec, qFeatureMapper, qImageFeatures, qVideoFeatures,
    qAutoencoderLatent, qAutoencoderDeterministic, qAutoImputeDeterministic)
}
