package graft.workflow

import graft.core.ColumnSelector
import graft.operators._
import graft.sources.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** YAML-config-driven pipeline runner (ref: workflow.py:148-871 +
  * main.py). Stage ordering follows the reference: ETL →
  * stats_generator → quality_checker → transformers → write_main.
  * Each stage optionally ends in a write+re-read checkpoint — the
  * reference's deliberate lineage cut (workflow.py:64-88) — and logs
  * wall time.
  */
object Workflow {

  final case class StageResult(name: String, seconds: Double, metrics: Map[String, DataFrame])

  private type Conf = Map[String, Any]

  private def asConf(v: Any): Conf = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, x) => k.toString -> x }.toMap
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"expected mapping, got $other")
  }

  private def strings(v: Any): Seq[String] = v match {
    case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
    case s: String => s.split('|').map(_.trim).filter(_.nonEmpty).toSeq
    case null => Nil
  }

  /** list_of_cols accepts a YAML list, a pipe-string, or "all". */
  private def resolveCols(df: DataFrame, v: Any, drop: Seq[String] = Nil): Seq[String] = v match {
    case l: java.util.List[_] => ColumnSelector.resolve(df, strings(l).mkString("|"), drop)
    case null => ColumnSelector.resolve(df, "all", drop)
    case s => ColumnSelector.resolve(df, s.toString, drop)
  }

  def parse(yamlText: String): Conf =
    asConf(new Yaml().load[Any](yamlText))

  def runFile(spark: SparkSession, path: String): (DataFrame, Seq[StageResult]) =
    run(spark, new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))

  def run(spark: SparkSession, yamlText: String): (DataFrame, Seq[StageResult]) = {
    val conf = parse(yamlText)
    val results = scala.collection.mutable.ArrayBuffer.empty[StageResult]

    def timed[A](name: String, metrics: Map[String, DataFrame] = Map.empty)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      results += StageResult(name, (System.nanoTime() - t0) / 1e9, metrics)
      r
    }

    // ---- input_dataset: read + ETL ops in config order (workflow.py:45-61)
    val input = asConf(conf("input_dataset"))
    var df = timed("read_dataset") {
      val rd = asConf(input("read_dataset"))
      Ingest.readDataset(spark,
        rd("file_path").toString,
        rd.getOrElse("file_type", "parquet").toString,
        asConf(rd.getOrElse("file_options", null)).map { case (k, v) => k -> v.toString })
    }
    input.get("delete_column").foreach(v => df = Ingest.deleteColumn(df, strings(v)))
    input.get("select_column").foreach(v => df = Ingest.selectColumn(df, strings(v)))
    input.get("rename_column").foreach(v =>
      df = Ingest.renameColumn(df, asConf(v).map { case (k, x) => k -> x.toString }))
    input.get("recast_column").foreach(v =>
      df = Ingest.recastColumn(df, asConf(v).map { case (k, x) => k -> x.toString }))
    // expression_parser (ref data_ingest expression_parser): computed
    // columns from Spark-SQL expression strings — name -> expr
    input.get("expression_parser").foreach(v =>
      asConf(v).foreach { case (name, e) =>
        df = df.withColumn(name, org.apache.spark.sql.functions.expr(e.toString))
      })
    // ts_preprocess (ref ts_auto_detection.py:622): detect string
    // timestamp columns from one sampling job and cast them; "auto"
    // probes every string column
    input.get("ts_preprocess").foreach { v =>
      import graft.functions.AutoDetect
      val auto = v == "auto"
      val cols =
        if (auto) graft.core.ColumnRole.categoricalCols(df)
        else strings(v)
      if (cols.nonEmpty) timed("ts_preprocess") {
        val detections = AutoDetect.detectTimestampColumns(df, cols)
        // auto probes EVERY string column, so id/phone-named columns
        // that accidentally clear the epoch regex (10 digits starting
        // with '1') must not be destructively rewritten; an explicit
        // column list asserts the caller knows they are times
        df = AutoDetect.tsPreprocess(df,
          if (auto) AutoDetect.epochIdGuard(detections) else detections)
      }
    }

    // ---- concatenate / join auxiliary datasets
    conf.get("join_dataset").foreach { v =>
      val jc = asConf(v)
      val others = strings(jc("paths")).map(p => spark.read.parquet(p))
      df = timed("join_dataset") {
        Ingest.joinDataset(df +: others, strings(jc("join_cols")),
          jc.getOrElse("join_type", "inner").toString)
      }
    }

    // ---- as-of enrichment: join the latest/nearest right-side state row
    // per key at each left timestamp (pandas merge_asof semantics, all
    // directions + tolerance + strict)
    conf.get("asof_join").foreach { v =>
      val ac = asConf(v)
      val right = spark.read.parquet(ac("right_path").toString)
      df = timed("asof_join") {
        graft.functions.AsofJoin.asofJoin(df, right,
          strings(ac("key_cols")),
          ac("left_ts").toString,
          ac.getOrElse("right_ts", ac("left_ts")).toString,
          strings(ac("value_cols")),
          ac.getOrElse("direction", "backward").toString,
          ac.get("tolerance").map(_.toString.toDouble),
          ac.getOrElse("allow_exact_matches", true).toString.toBoolean)
      }
    }

    // ---- incremental ETL: CDC changelog apply / snapshot diff against
    // a second input (our additions — MERGE INTO and table-versioning
    // primitives for incremental pipelines)
    conf.get("changelog_apply").foreach { v =>
      val cc = asConf(v)
      val changes = spark.read.parquet(cc("changes_path").toString)
      df = timed("changelog_apply") {
        Ingest.applyChangelog(df, changes, strings(cc("key_cols")),
          cc.getOrElse("op_col", "op").toString,
          cc.getOrElse("seq_col", "seq").toString)
      }
    }
    conf.get("snapshot_diff").foreach { v =>
      val sc = asConf(v)
      val old = spark.read.parquet(sc("old_path").toString)
      df = timed("snapshot_diff") {
        Ingest.snapshotDiff(old, df, strings(sc("key_cols")))
      }
    }

    // ---- stats_generator (metrics attached to the stage result; written
    // out when save_stats_path is configured — ref workflow save_stats)
    conf.get("stats_generator").foreach { v =>
      val sc = asConf(v)
      val cols = resolveCols(df, sc.getOrElse("list_of_cols", null),
        strings(sc.getOrElse("drop_cols", null)))
      val (num, cat, _) = graft.core.ColumnRole.segregate(
        df.select(cols.map(org.apache.spark.sql.functions.col): _*).schema)
      // optional `metrics:` list selects which frames to compute (and
      // save); default = all applicable — the prior behavior
      val wanted = Option(sc.getOrElse("metrics", null))
        .map(strings(_).toSet)
      def want(name: String) = wanted.forall(_.contains(name))
      val metrics: Map[String, org.apache.spark.sql.DataFrame] =
        (if (want("global_summary"))
           Map("global_summary" -> StatsGenerator.globalSummary(df))
         else Map.empty[String, org.apache.spark.sql.DataFrame]) ++
        (if (want("measures_of_counts"))
           Map("measures_of_counts" -> StatsGenerator.measuresOfCounts(df, cols)) else Map.empty) ++
        (if (num.nonEmpty) {
          (if (want("central_tendency"))
             Map("central_tendency" -> StatsGenerator.centralTendency(df, num)) else Map.empty) ++
          (if (want("dispersion"))
             Map("dispersion" -> StatsGenerator.measuresOfDispersion(df, num)) else Map.empty) ++
          (if (want("percentiles"))
             Map("percentiles" -> StatsGenerator.measuresOfPercentiles(df, num)) else Map.empty)
        } else Map.empty) ++
        (if (cat.nonEmpty && want("mode"))
           Map("mode" -> StatsGenerator.modeComputation(df, cat)) else Map.empty)
      timed("stats_generator", metrics) {
        sc.get("save_stats_path").foreach { p =>
          metrics.foreach { case (name, m) =>
            m.coalesce(1).write.mode("overwrite").parquet(s"$p/$name")
          }
        }
      }
    }

    // ---- quality_checker treatments
    conf.get("quality_checker").foreach { v =>
      val qc = asConf(v)
      timed("quality_checker") {
        qc.get("duplicate_detection").foreach { d =>
          val cols = resolveCols(df, asConf(d).getOrElse("list_of_cols", null))
          if (asConf(d).getOrElse("treatment", false) == true) {
            df = QualityChecker.dropDuplicatesOn(df, cols)
            // The dedup distinct is the one shuffle in this block, and
            // every downstream FIT action (outlier bounds, MMM median,
            // binning edges, label-encoding frequencies, association /
            // drift metrics, write_main) re-plans the query — Spark SQL
            // gives no shuffle reuse across actions — so without a
            // lineage cut the distinct replays once per fit (measured
            // ~5x on the full configs.yaml composition). Same
            // materialize-not-persist rationale as near_dedup below.
            if (qc.keys.exists(k => k != "duplicate_detection") ||
                conf.keys.exists(Set("transformers", "association_evaluator",
                  "drift_detector", "write_main")))
              df = graft.functions.Dedup.materialize(df)
          }
        }
        qc.get("nullRows_detection").foreach { d =>
          val thr = asConf(d).getOrElse("treatment_threshold", 0.8).toString.toDouble
          if (asConf(d).getOrElse("treatment", false) == true)
            df = QualityChecker.nullRowsTreatment(df, df.columns.toSeq, thr)
        }
        qc.get("outlier_detection").foreach { d =>
          val dd = asConf(d)
          val cols = resolveCols(df, dd.getOrElse("list_of_cols", null))
            .filter(graft.core.ColumnRole.numericCols(df).contains)
          if (dd.getOrElse("treatment", false) == true) {
            val bounds = QualityChecker.outlierBounds(df, cols)
            df = QualityChecker.outlierTreatment(df, bounds,
              dd.getOrElse("treatment_method", "value").toString)
          }
        }
        qc.get("invalidEntries_detection").foreach { d =>
          val dd = asConf(d)
          val cols = resolveCols(df, dd.getOrElse("list_of_cols", null))
          if (dd.getOrElse("treatment", false) == true)
            df = QualityChecker.invalidEntriesTreatment(df, cols,
              method = dd.getOrElse("treatment_method", "null_replacement").toString,
              treatmentThreshold =
                dd.get("treatment_threshold").map(_.toString.toDouble))
        }
        qc.get("nullColumns_detection").foreach { d =>
          val dd = asConf(d)
          val cols = resolveCols(df, dd.getOrElse("list_of_cols", null))
          if (dd.getOrElse("treatment", false) == true)
            df = QualityChecker.nullColumnsDetection(df, cols,
              treatment = dd.getOrElse("treatment_method", "MMM").toString,
              threshold = dd.getOrElse("treatment_threshold", 0.5).toString.toDouble,
              idCol = dd.get("id_col").map(_.toString))
        }
        qc.get("imputation_MMM").foreach { d =>
          val (num, cat, _) = graft.core.ColumnRole.segregate(df.schema)
          df = Transformers.imputationMMM(df, num, cat,
            asConf(d).getOrElse("method", "median").toString)
        }
      }
    }

    // ---- text_pipeline: the training-data text stages (quality filter →
    // exact dedup → near-dup treatment → text stats) as one configured
    // block, mirroring the geospatial/drift stages
    conf.get("text_pipeline").foreach { v =>
      val tp = asConf(v)
      import org.apache.spark.sql.functions.col
      timed("text_pipeline") {
        val textCol = tp.getOrElse("text_col", "text").toString
        val idCol = tp.getOrElse("id_col", df.columns.head).toString
        if (tp.getOrElse("pii_redaction", false) == true)
          df = df.withColumn(textCol, graft.functions.TextOps.piiRedact(col(textCol)))
        if (tp.getOrElse("line_dedup", false) == true) {
          // corpus-level boilerplate-line removal; docs whose every line
          // was seen earlier drop out entirely
          val cleaned = graft.functions.Dedup.lineDedup(df, textCol, idCol)
            .filter(col("n_kept") > 0)
            .select(col(idCol), col("text_clean"))
          df = df.drop(textCol)
            .join(cleaned.withColumnRenamed("text_clean", textCol), Seq(idCol))
        }
        tp.get("quality_filter").foreach { q =>
          val minScore = asConf(q).getOrElse("min_score", 0.5).toString.toDouble
          df = df.withColumn("quality",
            graft.functions.TextOps.qualityScore(col(textCol)))
            .filter(col("quality") >= minScore)
        }
        if (tp.getOrElse("gopher_filter", false) == true) {
          val ok = graft.functions.TextOps.gopherSignals(df, textCol, idCol)
            .filter(col("passes")).select(col(idCol))
          df = df.join(ok, Seq(idCol), "left_semi")
        }
        tp.get("nb_filter").foreach { nv =>
          // Naive Bayes seed-classifier filter (GPT-3-style): the seed
          // labels derive from curated/junk source lists; keep docs
          // scoring at least min_log_odds (default 0 = predicted curated)
          val nb = asConf(nv)
          val srcCol = nb.getOrElse("source_col", "source").toString
          val pos = strings(nb("positive_sources"))
          val neg = strings(nb("negative_sources"))
          val seed = df
            .filter(col(srcCol).isin((pos ++ neg).map(x => x: Any): _*))
            .select(col(idCol),
              org.apache.spark.sql.functions
                .when(col(srcCol).isin(pos.map(x => x: Any): _*), 1)
                .otherwise(0).as("label"))
          val minLo = nb.getOrElse("min_log_odds", 0.0).toString.toDouble
          val keep = graft.functions.TextOps
            .nbSeedClassifier(df, textCol, idCol, seed)
            .filter(col("log_odds") >= minLo)
            .select(col(idCol))
          df = df.join(keep, Seq(idCol), "left_semi")
        }
        if (tp.getOrElse("exact_dedup", false) == true)
          df = graft.functions.Dedup.exactDedup(df, textCol, idCol)
        tp.get("dedup_against_index").foreach { iv =>
          // incremental near-dup drop against a persisted MinHash band
          // index (built by build_dedup_index in an earlier run): the
          // corpus side is never re-hashed — the new frame probes the
          // saved buckets and flagged docs drop via anti-join.
          // Materialize first: the probe side and the anti-join's left
          // side would otherwise each replay the upstream stage chain
          // (same rationale as near_dedup's localCheckpoint below)
          val ic = asConf(iv)
          df = graft.functions.Dedup.materialize(df)
          val index = spark.read.parquet(ic("index_path").toString)
          val flagged = graft.functions.Dedup.dedupAgainstIndexMd5(
            df, index, textCol, idCol,
            shingleSize = ic.getOrElse("shingle_size", 3).toString.toInt,
            numHashes = ic.getOrElse("num_hashes", 16).toString.toInt,
            bands = ic.getOrElse("bands", 4).toString.toInt,
            threshold = ic.getOrElse("threshold", 0.7).toString.toDouble)
            .filter(org.apache.spark.sql.functions.col("is_dup"))
            .select(org.apache.spark.sql.functions.col("key").as(idCol))
          df = df.join(flagged, Seq(idCol), "left_anti")
        }
        tp.get("build_dedup_index").foreach { bv =>
          // persist the band index of the CURRENT frame (post-filter,
          // post-dedup) so the next batch can probe it. When the path
          // already holds an index (the incremental loop: probe batch N
          // against it, then fold batch N in), the new rows UNION the
          // existing ones — re-capped, since a bucket can cross the cap
          // cumulatively — and the result is localCheckpoint-ed before
          // the overwrite (writing a frame whose lineage still reads the
          // path being overwritten is an AnalysisException).
          import org.apache.spark.sql.functions.col
          val bc = asConf(bv)
          val path = bc("path").toString
          val shingleN = bc.getOrElse("shingle_size", 3).toString.toInt
          val numHashes = bc.getOrElse("num_hashes", 16).toString.toInt
          val nBands = bc.getOrElse("bands", 4).toString.toInt
          val cap = bc.getOrElse("max_bucket_size", 200).toString.toInt
          df = graft.functions.Dedup.materialize(df)
          val fresh = graft.functions.Dedup.minhashIndexMd5(df, textCol, idCol,
            shingleSize = shingleN, numHashes = numHashes, bands = nBands,
            maxBucketSize = cap)
          val exists = try {
            !spark.read.parquet(path).isEmpty
          } catch { case _: org.apache.spark.sql.AnalysisException => false }
          val combined = if (exists) {
            val old = spark.read.parquet(path)
            graft.functions.Dedup.validateIndex(old, shingleN, numHashes, nBands)
            graft.functions.Dedup.capGroups(
              old.unionByName(fresh).dropDuplicates("band", "bucket", "key"),
              Seq("band", "bucket"), cap)
          } else fresh
          graft.functions.Dedup.materialize(combined.select(
              col("band"), col("bucket"), col("key"), col("sig"), col("shingle_n")))
            .write.mode("overwrite").parquet(path)
        }
        tp.get("span_dedup").foreach { sv =>
          // exact-substring span removal (Lee et al. 2021): rewrite the
          // text column with cross-doc duplicated token ranges dropped
          val sd = asConf(sv)
          val cleaned = graft.functions.Dedup.removeDuplicateSpans(
            df, textCol, idCol,
            windowTokens = sd.getOrElse("window_tokens", 50).toString.toInt,
            minDocFreq = sd.getOrElse("min_doc_freq", 2).toString.toInt)
            .select(col(idCol), col("text_clean"))
          df = df.drop(textCol)
            .join(cleaned.withColumnRenamed("text_clean", textCol), Seq(idCol))
        }
        tp.get("near_dedup").foreach { ndv =>
          val nd = asConf(ndv)
          // the frame here (post-filter, post-exact-dedup) feeds BOTH the
          // candidate-pair path (shingle expansion → clusters, whose
          // pointer-jumping runs its own actions) and the final
          // drop-anti-join — without materialization the whole upstream
          // quality-score + dedup-window chain replays once per consumer
          // (measured ~1 s of the q_workflow_text cost at sf0.1; linear
          // in corpus size at scale). localCheckpoint, NOT persist(): a
          // persist registers in the session CacheManager and nothing in
          // a lazy workflow can safely unpersist it, leaking cached
          // blocks across repeated Workflow.run calls in a long-lived
          // session — checkpoint blocks are reclaimed by the
          // ContextCleaner once the returned frame is unreachable.
          df = graft.functions.Dedup.materialize(df)
          // blockless configs still need the (skew-capped) block join —
          // use a constant block
          val (src, blk) = nd.get("block_col").map(b => (df, b.toString)).getOrElse(
            (df.withColumn("__block", org.apache.spark.sql.functions.lit(1)), "__block"))
          val pairs = graft.functions.Dedup.ngramJaccardPairs(src, textCol, idCol,
            blockCol = blk,
            n = nd.getOrElse("ngram", 3).toString.toInt,
            threshold = nd.getOrElse("threshold", 0.5).toString.toDouble)
          val clusters = graft.functions.Dedup.duplicateClusters(
            pairs.select(col("key_1"), col("key_2")))
          df = graft.functions.Dedup.dropNearDuplicates(df, idCol, clusters)
        }
        tp.get("deterministic_sample").foreach { f =>
          df = graft.sources.Sampling.deterministicSample(
            df, asConf(f).getOrElse("fraction", 0.1).toString.toDouble, Seq(idCol))
        }
        tp.get("stratified_sample").foreach { f =>
          val sc = asConf(f)
          df = graft.sources.Sampling.deterministicStratifiedSample(
            df,
            sc.getOrElse("fraction", 0.1).toString.toDouble,
            strings(sc("strata_cols")),
            Seq(idCol),
            sc.getOrElse("mode", "population").toString)
        }
        tp.get("mixture_sample").foreach { mv =>
          // source-mixture sampling under a token budget: explicit
          // per-source weights, or temperature weights derived from the
          // per-source token totals when no weights are given
          val mc = asConf(mv)
          val budget = mc.getOrElse("token_budget", 1000000L).toString.toLong
          val srcCol = mc.getOrElse("source_col", "source").toString
          val toks = graft.functions.TextOps.tokenCount(col(textCol))
          val targets = mc.get("weights") match {
            case Some(w) => graft.sources.Sampling.mixtureTargets(
              asConf(w).map { case (k, x) => k -> x.toString.toDouble }, budget)
            case None => graft.sources.Sampling.temperatureTargets(
              df, srcCol, toks, budget,
              mc.getOrElse("temperature", 0.5).toString.toDouble)
          }
          df = graft.sources.Sampling.mixtureSample(
            df, srcCol, toks, Seq(idCol), targets,
            prefilterMargin = mc.get("prefilter_margin").map(_.toString.toDouble))
        }
        if (tp.getOrElse("text_stats", false) == true)
          df = df
            .withColumn("n_tokens", graft.functions.TextOps.tokenCount(col(textCol)))
            .withColumn("lang_pred", graft.functions.TextOps.langId(col(textCol)))
        tp.get("ccnet_buckets").foreach { cv =>
          // per-language head/middle/tail tertiles over a score column
          // already on the frame (e.g. quality from quality_filter)
          val cb = asConf(cv)
          val scoreCol = cb.getOrElse("score_col", "quality").toString
          val langCol = cb.getOrElse("lang_col", "lang").toString
          require(df.columns.contains(scoreCol) && df.columns.contains(langCol),
            s"ccnet_buckets needs '$scoreCol' and '$langCol' on the frame")
          df = graft.functions.TextOps.perplexityBuckets(df, scoreCol, idCol, langCol)
        }
        tp.get("shard_budget").foreach { b =>
          val budget = b.toString.toLong
          val withTok =
            if (df.columns.contains("n_tokens")) df
            else df.withColumn("n_tokens",
              graft.functions.TextOps.tokenCount(col(textCol)))
          df = graft.functions.Sharding.packByBudget(
            withTok, "n_tokens", Seq(idCol), budget)
        }
      }
    }

    // ---- semantic_dedup: SemDeDup over an embedding column — keep one
    // survivor (min id) per semantic duplicate component. Stage-level so
    // embedding tables can dedup without the text pipeline.
    conf.get("semantic_dedup").foreach { v =>
      val sd = asConf(v)
      val idCol = sd.getOrElse("id_col", df.columns.head).toString
      val vecCol = sd.getOrElse("vec_col", "embedding").toString
      df = timed("semantic_dedup") {
        val labels = graft.functions.Similarity.semanticDedup(
          df, idCol, vecCol,
          threshold = sd.getOrElse("threshold", 0.95).toString.toDouble,
          cellCount = sd.getOrElse("cell_count", 0).toString.toInt,
          maxCellSize = sd.getOrElse("max_cell_size", 100000).toString.toInt)
        df.join(
          labels.filter(org.apache.spark.sql.functions.col("kept"))
            .select(org.apache.spark.sql.functions.col("vec_id").as(idCol)),
          Seq(idCol), "left_semi")
      }
    }

    // ---- curation_pipeline: the LLM-pretraining curation trio as one
    // configured block, composing AFTER text_pipeline the way a real
    // data pipeline runs (filter/dedup first, then select toward the
    // target domain, then split): DSIR importance selection keeps all
    // target-domain docs plus the keep_k most target-like raw-pool docs
    // (deterministic Gumbel-top-k — the md5-seeded uniform idiom, no
    // RNG); leakage_split assigns train/test so a near-dup cluster never
    // straddles the boundary; source_overlap attaches the dense
    // cross-source Jaccard matrix as a stage metric.
    conf.get("curation_pipeline").foreach { v =>
      val cp = asConf(v)
      import org.apache.spark.sql.functions.{col, lit, expr, round, log}
      val textCol = cp.getOrElse("text_col", "text").toString
      val idCol = cp.getOrElse("id_col", df.columns.head).toString
      val metrics = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
      val t0 = System.nanoTime()
      cp.get("dsir_select").foreach { dv =>
        val dc = asConf(dv)
        val targetCol = dc.getOrElse("target_col", "lang").toString
        val targetValue = dc.getOrElse("target_value", "en").toString
        val keepK = dc.getOrElse("keep_k", 1000).toString.toInt
        val buckets = dc.getOrElse("num_buckets", 8192).toString.toInt
        val isTarget = col(targetCol) === lit(targetValue)
        // three consumers (target half, score fit, selected semi-join):
        // materialize once so the upstream stage chain replays once;
        // widen first so the DSIR feature explosion doesn't run on a
        // single scan task when the input is one small parquet file
        df = graft.functions.Dedup.materialize(
          graft.functions.Dedup.widenForCompute(df))
        val scores = graft.functions.ImportanceSampling.dsirScores(
          df, textCol, idCol, isTarget, numBuckets = buckets)
        // deterministic Gumbel-top-k on the 1e-4-ROUNDED key: a cross-
        // engine ln() ulp difference can't flip a rounded boundary, so
        // the SELECTED SET is oracle-replayable (ties break on id).
        // limit() plans as a distributed TakeOrdered, never a global sort.
        graft.plans.GraftFunctions.register(spark)
        val u = (expr("md5_prefix60(cast(cast(id as string) as binary))")
          .cast("double") + lit(0.5)) / lit(math.pow(2.0, 60))
        val picked = scores
          .withColumn("gumbel_key", round(col("score") - log(-log(u)), 4))
          .orderBy(col("gumbel_key").desc, col("id").asc)
          .limit(keepK)
          .select(col("id").as(idCol))
        df = df.filter(isTarget)
          .unionByName(df.join(picked, Seq(idCol), "left_semi"))
      }
      cp.get("leakage_split").foreach { lv =>
        val lc = asConf(lv)
        // the surviving frame feeds both the candidate-pair path and the
        // split join (same rationale as text_pipeline's near_dedup)
        df = graft.functions.Dedup.materialize(df)
        val (src, blk) = lc.get("block_col").map(b => (df, b.toString)).getOrElse(
          (df.withColumn("__block", lit(1)), "__block"))
        val pairs = graft.functions.Dedup.ngramJaccardPairs(src, textCol, idCol,
          blockCol = blk,
          n = lc.getOrElse("ngram", 3).toString.toInt,
          threshold = lc.getOrElse("threshold", 0.5).toString.toDouble)
          .select(col("key_1"), col("key_2"))
        // ordered "name:frac" list — split thresholds are CUMULATIVE, so
        // the config must pin the order (a YAML mapping wouldn't)
        val weights = lc.get("weights")
          .map(strings(_).map { w =>
            val Array(k, f) = w.split(':')
            k.trim -> f.trim.toDouble
          })
          .getOrElse(Seq("train" -> 0.8, "test" -> 0.2))
        df = graft.functions.Dedup.leakageSafeSplit(df, idCol, pairs, weights)
      }
      cp.get("source_overlap").foreach { ov =>
        val oc = asConf(ov)
        metrics("source_overlap") = graft.functions.Dedup.sourceOverlap(
          df, textCol, oc.getOrElse("source_col", "source").toString,
          n = oc.getOrElse("ngram", 3).toString.toInt,
          maxSources = oc.getOrElse("max_sources", 64).toString.toInt)
      }
      results += StageResult("curation_pipeline",
        (System.nanoTime() - t0) / 1e9, metrics.toMap)
    }

    // ---- url_curation: the crawl-side page-identity passes as ONE
    // configured stage, running BEFORE any text-level dedup the way a
    // real pipeline orders them: canonical-form URL dedup (one page,
    // one row), then the per-registrable-domain document quota; the
    // per-domain rollup attaches as a stage metric. Adds url_canon and
    // domain columns to the frame.
    conf.get("url_curation").foreach { v =>
      val uc = asConf(v)
      import org.apache.spark.sql.functions.col
      val urlCol = uc.getOrElse("url_col", "url").toString
      val idCol = uc.getOrElse("id_col", df.columns.head).toString
      val metrics = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
      val t0 = System.nanoTime()
      uc.get("domain_rollup").foreach { rc =>
        val textCol = asConf(rc).getOrElse("text_col", "text").toString
        metrics("domain_rollup") =
          graft.functions.UrlOps.domainRollup(df, urlCol, textCol)
      }
      df = df
        .withColumn("url_canon",
          graft.functions.UrlOps.canonicalizeUrl(col(urlCol)))
        .withColumn("domain", graft.functions.UrlOps.registrableDomain(
          graft.functions.UrlOps.hostOf(col(urlCol))))
      if (uc.getOrElse("dedup", true) == true)
        df = graft.functions.UrlOps.urlDedup(df, urlCol, idCol)
      uc.get("max_docs_per_domain").foreach { m =>
        df = graft.functions.UrlOps.capPerDomain(df, urlCol, idCol,
          m.toString.toInt, uc.getOrElse("salt", "").toString)
      }
      results += StageResult("url_curation",
        (System.nanoTime() - t0) / 1e9, metrics.toMap)
    }

    // ---- tokenize: BPE tokenizer train+apply as a configured stage —
    // learn `num_merges` merges from the frame's text (or reuse a merge
    // table trained upstream in this session via the same parameters),
    // then add tokens/n_tokens columns through the native codegen'd
    // encode expression. The merge table attaches as a stage metric.
    conf.get("tokenize").foreach { v =>
      val tc = asConf(v)
      import org.apache.spark.sql.functions.col
      val textCol = tc.getOrElse("text_col", "text").toString
      val metrics = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
      val t0 = System.nanoTime()
      graft.plans.GraftFunctions.register(spark)
      val algo = tc.getOrElse("algo", "bpe").toString
      // fail fast on a typo'd algo: a silent fall-through to BPE would
      // ship the wrong tokenizer with no signal
      require(algo == "bpe" || algo == "unigram" || algo == "wordpiece",
        s"tokenize.algo must be 'bpe', 'unigram' or 'wordpiece', got '$algo'")
      algo match {
        case "wordpiece" =>
          // likelihood-scored merges (Schuster & Nakajima 2012) + greedy
          // longest-match inference over the induced piece vocabulary
          val maxWordLen = tc.getOrElse("max_word_len", 32).toString.toInt
          val merges = graft.functions.WordPieceTokenizer.trainMerges(
            df, textCol,
            numMerges = tc.getOrElse("num_merges", 64).toString.toInt,
            minPairFreq = tc.getOrElse("min_pair_freq", 2L).toString.toLong,
            maxWordLen = maxWordLen)
          locally {
            import spark.implicits._
            metrics("wordpiece_merges") = merges
              .map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.pairCount, m.score))
              .toDF("rank", "lhs", "rhs", "merged", "pair_count", "score")
          }
          // same greedy segmenter pieceEncode wraps, as a column so the
          // stage stays map-only with every input column carried through
          val vocab = graft.functions.WordPieceTokenizer.vocabFromMerges(merges)
          val toks = org.apache.spark.sql.functions.call_function("piece_encode",
            graft.functions.TextOps.normalizeText(col(textCol)),
            org.apache.spark.sql.functions.lit(vocab.mkString("\n")),
            org.apache.spark.sql.functions.lit(maxWordLen))
          df = df.withColumn("tokens", toks)
            .withColumn("n_tokens_wordpiece",
              org.apache.spark.sql.functions.size(col("tokens")))
          if (tc.getOrElse("keep_tokens", true) != true) df = df.drop("tokens")
        case "unigram" =>
          // unigram-LM (SentencePiece Viterbi-EM) train + encode
          val vocab = graft.functions.UnigramTokenizer.trainUnigram(
            df, textCol,
            vocabSize = tc.getOrElse("vocab_size", 64).toString.toInt,
            rounds = tc.getOrElse("rounds", 2).toString.toInt,
            maxPieceLen = tc.getOrElse("max_piece_len", 4).toString.toInt,
            maxWordLen = tc.getOrElse("max_word_len", 10).toString.toInt,
            minSeedCount = tc.getOrElse("min_seed_count", 3L).toString.toLong,
            seedSize = tc.getOrElse("seed_size", 300).toString.toInt)
          locally {
            import spark.implicits._
            metrics("unigram_vocab") = vocab
              .map(p => (p.rank, p.piece, p.n, p.logp))
              .toDF("rank", "piece", "n", "logp")
          }
          val toks = graft.functions.UnigramTokenizer.unigramTokens(
            col(textCol), vocab,
            maxWordLen = tc.getOrElse("max_word_len", 10).toString.toInt)
          df = df.withColumn("tokens", toks)
            .withColumn("n_tokens_unigram",
              org.apache.spark.sql.functions.size(col("tokens")))
          if (tc.getOrElse("keep_tokens", true) != true) df = df.drop("tokens")
        case _ =>
          val numMerges = tc.getOrElse("num_merges", 64).toString.toInt
          val merges = graft.functions.BpeTokenizer.trainMerges(
            df, textCol, numMerges,
            minPairFreq = tc.getOrElse("min_pair_freq", 2L).toString.toLong,
            maxWordLen = tc.getOrElse("max_word_len", 32).toString.toInt,
            mergesPerRound = tc.getOrElse("merges_per_round", 1).toString.toInt)
          locally {
            import spark.implicits._
            metrics("bpe_merges") = merges
              .map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.pairCount))
              .toDF("rank", "lhs", "rhs", "merged", "pair_count")
          }
          val toks = org.apache.spark.sql.functions.call_function("bpe_encode",
            graft.functions.TextOps.normalizeText(col(textCol)),
            org.apache.spark.sql.functions.lit(
              graft.functions.BpeTokenizer.mergesSpec(merges)),
            org.apache.spark.sql.functions.lit(
              tc.getOrElse("max_word_len", 32).toString.toInt))
          df = df.withColumn("tokens", toks)
            .withColumn("n_tokens_bpe",
              org.apache.spark.sql.functions.size(col("tokens")))
          if (tc.getOrElse("keep_tokens", true) != true) df = df.drop("tokens")
      }
      results += StageResult("tokenize",
        (System.nanoTime() - t0) / 1e9, metrics.toMap)
    }

    // ---- data_mixture: the pretraining data-mix step as ONE configured
    // stage, composing after curation the way a real pipeline ships:
    // per-source token targets (explicit DoReMi weights, or XLM-R
    // temperature weights derived from the corpus), the budgeted
    // deterministic mixture sample, then the shuffled-shard assignment
    // that fixes the reproducible training order for the shard write.
    conf.get("data_mixture").foreach { v =>
      val mc = asConf(v)
      import org.apache.spark.sql.functions.col
      val textCol = mc.getOrElse("text_col", "text").toString
      val idCol = mc.getOrElse("id_col", df.columns.head).toString
      val srcCol = mc.getOrElse("source_col", "source").toString
      df = timed("data_mixture") {
        val budget = mc.getOrElse("token_budget", 1000000L).toString.toLong
        val toks = graft.functions.TextOps.tokenCount(col(textCol))
        val targets = mc.get("weights") match {
          case Some(w) => graft.sources.Sampling.mixtureTargets(
            asConf(w).map { case (k, x) => k -> x.toString.toDouble }, budget)
          case None => graft.sources.Sampling.temperatureTargets(
            df, srcCol, toks, budget,
            mc.getOrElse("temperature", 0.5).toString.toDouble)
        }
        var out = graft.sources.Sampling.mixtureSample(
          df, srcCol, toks, Seq(idCol), targets,
          prefilterMargin = mc.get("prefilter_margin").map(_.toString.toDouble))
        mc.get("shuffled_shards").foreach { sv =>
          val sc = asConf(sv)
          out = graft.functions.Sharding.shuffledShards(out, idCol,
            sc.getOrElse("n_shards", 16).toString.toInt,
            sc.getOrElse("salt", "").toString)
        }
        out
      }
    }

    // ---- corpus_health: corpus-level distribution diagnostics — Zipf
    // vocabulary fit, length-mass Gini, source concentration (HHI/top
    // share) — attached as stage metrics; the frame flows through.
    conf.get("corpus_health").foreach { v =>
      val cc = asConf(v)
      val textCol = cc.getOrElse("text_col", "text").toString
      val metrics = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
      metrics("zipf_fit") = graft.functions.TextOps.zipfFit(df, textCol,
        cc.getOrElse("top_v", 100).toString.toInt)
      cc.get("length_col").foreach { lc =>
        metrics("length_gini") =
          graft.operators.StatsGenerator.giniCoefficient(df, Seq(lc.toString))
      }
      (cc.get("source_col"), cc.get("weight_col")) match {
        case (Some(sc), Some(wc)) =>
          metrics("source_concentration") = graft.operators.StatsGenerator
            .hhiConcentration(df, sc.toString, wc.toString)
        case _ => ()
      }
      timed("corpus_health", metrics.toMap) { () }
    }

    // ---- ts_diagnostics: the time-series diagnostic quartet over the
    // frame's (ts, value) — seasonal decomposition, ACF/PACF, CUSUM —
    // attached as stage metrics; the frame flows through unchanged.
    conf.get("ts_diagnostics").foreach { v =>
      val tc = asConf(v)
      val tsCol = tc.getOrElse("ts_col", "ts").toString
      val valCol = tc.getOrElse("value_col", "value").toString
      val seriesCols = tc.get("series_cols").map(strings).getOrElse(Nil) match {
        case Nil => Seq.empty[String]
        case s   => s
      }
      require(seriesCols.nonEmpty, "ts_diagnostics needs series_cols")
      val period = tc.getOrElse("period", 7).toString.toInt
      val maxLag = tc.getOrElse("max_lag", 7).toString.toInt
      import graft.functions.DatetimeOps
      val metrics = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
      if (tc.getOrElse("decompose", true) == true)
        metrics("seasonal_decompose") =
          DatetimeOps.seasonalDecompose(df, tsCol, valCol, seriesCols, period)
      if (tc.getOrElse("acf", true) == true)
        metrics("acf") = DatetimeOps.autocorrelation(df, tsCol, valCol, seriesCols, maxLag)
      if (tc.getOrElse("pacf", false) == true)
        metrics("pacf") = DatetimeOps.partialAutocorrelation(df, tsCol, valCol,
          seriesCols, math.min(maxLag, 5))
      if (tc.getOrElse("cusum", true) == true)
        metrics("cusum") = DatetimeOps.cusumChangepoints(df, tsCol, valCol, seriesCols,
          tc.getOrElse("cusum_threshold", 5.0).toString.toDouble)
      timed("ts_diagnostics", metrics.toMap) { () }
    }

    // ---- build_ann_index: persist an IVF-PQ serving index (model +
    // salted inverted code lists) of the current frame's embedding
    // column, so later runs can probe it without re-reading this corpus.
    // Rebuild-on-write semantics (the fit must see the whole corpus;
    // an incremental code append against stale centroids would skew
    // assignments — unlike the band index, which is fit-free).
    conf.get("build_ann_index").foreach { v =>
      val bc = asConf(v)
      val idCol = bc.getOrElse("id_col", df.columns.head).toString
      val vecCol = bc.getOrElse("vec_col", "embedding").toString
      val path = bc("path").toString
      timed("build_ann_index") {
        val (model, lists) = graft.functions.Similarity.buildIvfPqIndex(
          df, idCol, vecCol,
          cellCount = bc.getOrElse("cell_count", 8).toString.toInt,
          m = bc.getOrElse("subspaces", 4).toString.toInt,
          ksub = bc.getOrElse("codebook_size", 16).toString.toInt)
        model.write.mode("overwrite").parquet(s"$path/model")
        lists.write.mode("overwrite").parquet(s"$path/lists")
      }
    }

    // ---- ann_probe: query a SAVED IVF-PQ index with the current
    // frame's vectors. With `max_dist` set, rows whose ADC distance to
    // any stored neighbor is within the radius DROP (semantic near-dups
    // of the indexed corpus — the embedding-space analog of
    // dedup_against_index); otherwise the top-k neighbor frame attaches
    // as a stage metric and the frame flows through unchanged.
    conf.get("ann_probe").foreach { v =>
      val pc = asConf(v)
      val idCol = pc.getOrElse("id_col", df.columns.head).toString
      val vecCol = pc.getOrElse("vec_col", "embedding").toString
      val path = pc("index_path").toString
      val model = spark.read.parquet(s"$path/model")
      val lists = spark.read.parquet(s"$path/lists")
      val k = pc.getOrElse("k", 3).toString.toInt
      val nprobe = pc.getOrElse("nprobe", 3).toString.toInt
      pc.get("max_dist") match {
        case Some(md) =>
          val radius = md.toString.toDouble
          df = timed("ann_probe") {
            import org.apache.spark.sql.functions.col
            val probeSide = graft.functions.Dedup.materialize(df)
            // serving has no self-exclusion, so a probe frame whose id
            // space overlaps the indexed corpus (e.g. the corpus probing
            // its own freshly built index) would match every row to its
            // OWN stored entry at the ADC floor and silently drop the
            // whole frame. Retrieve k=2 and discard the self row first —
            // the drop decision then rests on the nearest OTHER stored
            // neighbor.
            val hit = graft.functions.Similarity.annAgainstIndex(
              probeSide, idCol, vecCol, model, lists, k = 2, nprobe = nprobe)
              .filter(col("neighbor_id") =!= col("query_id"))
              .filter(col("adist") <= radius)
              .select(col("query_id").as(idCol))
            probeSide.join(hit, Seq(idCol), "left_anti")
          }
        case None =>
          val topk = graft.functions.Similarity.annAgainstIndex(
            df, idCol, vecCol, model, lists, k = k, nprobe = nprobe)
          timed("ann_probe", Map("ann_topk" -> topk)) { () }
      }
    }

    // ---- graph_metrics: PageRank / triangle counts over an edge list —
    // either a separate parquet edge table (edges_path) or the current
    // frame's two key columns. Results attach as stage metrics (the
    // drift_detector pattern); the frame flows through unchanged.
    conf.get("graph_metrics").foreach { v =>
      val gm = asConf(v)
      val rawEdges = gm.get("edges_path") match {
        case Some(p) => spark.read.parquet(p.toString)
        case None    => df
      }
      val rawSrc = gm.getOrElse("src_col", "src").toString
      val rawDst = gm.getOrElse("dst_col", "dst").toString
      // fail fast on typo'd sub-config keys (the tokenize.algo
      // discipline): a misspelled knob must error, not silently run
      // with the pinned default
      def knownKeys(arm: String, c: Map[String, Any], allowed: Set[String]): Unit = {
        val unknown = c.keySet -- allowed
        val where = if (arm.isEmpty) "graph_metrics" else s"graph_metrics.$arm"
        require(unknown.isEmpty,
          s"$where: unknown key(s) ${unknown.mkString(", ")} " +
            s"(allowed: ${allowed.toSeq.sorted.mkString(", ")})")
      }
      // the same discipline one level up: a typo'd ARM name (e.g.
      // 'lable_propagation') must error, not ship a pipeline silently
      // missing its metric
      knownKeys("", gm, Set("edges_path", "src_col", "dst_col",
        "project_bipartite",
        "pagerank", "personalized_pagerank", "hits", "k_core",
        "connected_components", "label_propagation", "louvain",
        "community_profile", "neighborhood",
        "random_walks", "harmonic", "triangle_counts", "summary"))
      val metrics = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
      // project_bipartite turns MEMBERSHIP rows (src_col = left group,
      // dst_col = right member) into the weighted co-occurrence graph,
      // and every later arm runs ON THE PROJECTION (lo/hi/w) — the
      // membership→graph→metrics pipeline as one YAML stage
      val (edges, src, dst) = gm.get("project_bipartite") match {
        case Some(pv) =>
          val pc = asConf(pv)
          knownKeys("project_bipartite", pc, Set("max_per_group", "salt"))
          val proj = graft.functions.Graph.projectBipartite(
            rawEdges, rawSrc, rawDst,
            maxPerGroup = pc.getOrElse("max_per_group", 64).toString.toInt,
            salt = pc.getOrElse("salt", "").toString)
          metrics("project_bipartite") = proj
          (proj, "lo", "hi")
        case None => (rawEdges, rawSrc, rawDst)
      }
      gm.get("pagerank").foreach { pv =>
        val pc = asConf(pv)
        knownKeys("pagerank", pc, Set("iterations", "damping", "weight_col"))
        metrics("pagerank") = graft.functions.Graph.pageRank(edges, src, dst,
          iterations = pc.getOrElse("iterations", 5).toString.toInt,
          damping = pc.getOrElse("damping", 0.85).toString.toDouble,
          weightCol = pc.getOrElse("weight_col", "").toString)
      }
      gm.get("personalized_pagerank").foreach { pv =>
        val pc = asConf(pv)
        knownKeys("personalized_pagerank", pc,
          Set("seeds", "seeds_path", "iterations", "damping", "weight_col"))
        // seeds: an inline YAML id list (the curation allowlist case) or
        // a parquet of ids (data-sized seed sets) — exactly one
        val seedFrame = (pc.get("seeds"), pc.get("seeds_path")) match {
          case (Some(xs: java.util.List[_]), None) =>
            import scala.jdk.CollectionConverters._
            import spark.implicits._
            xs.asScala.map(_.toString.toLong).toSeq.toDF("node")
          case (None, Some(p)) => spark.read.parquet(p.toString)
          case _ => throw new IllegalArgumentException(
            "personalized_pagerank needs exactly one of seeds / seeds_path")
        }
        metrics("personalized_pagerank") =
          graft.functions.Graph.personalizedPageRank(edges, seedFrame, src, dst,
            iterations = pc.getOrElse("iterations", 4).toString.toInt,
            damping = pc.getOrElse("damping", 0.85).toString.toDouble,
            weightCol = pc.getOrElse("weight_col", "").toString)
      }
      gm.get("hits").foreach { hv =>
        val hc = asConf(hv)
        knownKeys("hits", hc, Set("iterations", "rescale_every"))
        metrics("hits") = graft.functions.Graph.hits(edges, src, dst,
          iterations = hc.getOrElse("iterations", 5).toString.toInt,
          rescaleEvery = hc.getOrElse("rescale_every", 2).toString.toInt)
      }
      gm.get("k_core").foreach { kv =>
        val kc = asConf(kv)
        knownKeys("k_core", kc, Set("k", "rounds"))
        metrics("k_core") = graft.functions.Graph.kCore(edges, src, dst,
          k = kc.getOrElse("k", 2).toString.toInt,
          rounds = kc.getOrElse("rounds", 5).toString.toInt)
      }
      gm.get("connected_components").foreach { cv =>
        val cc = asConf(cv)
        knownKeys("connected_components", cc, Set("rounds"))
        metrics("connected_components") =
          graft.functions.Graph.connectedComponents(edges, src, dst,
            rounds = cc.getOrElse("rounds", 5).toString.toInt)
      }
      gm.get("label_propagation").foreach { lv =>
        val lc = asConf(lv)
        knownKeys("label_propagation", lc, Set("rounds"))
        metrics("label_propagation") =
          graft.functions.Graph.labelPropagation(edges, src, dst,
            rounds = lc.getOrElse("rounds", 4).toString.toInt)
      }
      gm.get("louvain").foreach { lv =>
        val lc = asConf(lv)
        knownKeys("louvain", lc, Set("rounds", "weight_col", "levels"))
        val rounds = lc.getOrElse("rounds", 4).toString.toInt
        val wc = lc.getOrElse("weight_col", "").toString
        val levels = lc.getOrElse("levels", 1).toString.toInt
        metrics("louvain") =
          if (levels <= 1)
            graft.functions.Graph.louvainCommunities(edges, src, dst,
              rounds = rounds, weightCol = wc)
          else graft.functions.Graph.louvainMultiLevel(edges, src, dst,
            levels = levels, roundsPerLevel = rounds, weightCol = wc)
      }
      gm.get("community_profile").foreach { cv =>
        val cc = asConf(cv)
        knownKeys("community_profile", cc, Set("rounds", "weight_col"))
        val wc = cc.getOrElse("weight_col", "").toString
        val assign = graft.functions.Graph.louvainCommunities(edges, src, dst,
          rounds = cc.getOrElse("rounds", 4).toString.toInt, weightCol = wc)
        metrics("community_profile") =
          graft.functions.Graph.communityProfile(edges, assign, src, dst,
            weightCol = wc)
      }
      gm.get("neighborhood").foreach { nv =>
        val nc = asConf(nv)
        knownKeys("neighborhood", nc, Set("radius", "quantile", "approx", "lg_k"))
        val radius = nc.getOrElse("radius", 3).toString.toInt
        val quantile = nc.getOrElse("quantile", 0.9).toString.toDouble
        metrics("neighborhood") =
          if (nc.getOrElse("approx", false).toString.toBoolean)
            graft.functions.Graph.neighborhoodFunctionApprox(edges, src, dst,
              radius = radius, lgK = nc.getOrElse("lg_k", 12).toString.toInt,
              quantile = quantile)
          else graft.functions.Graph.neighborhoodFunction(edges, src, dst,
            radius, quantile)
      }
      gm.get("random_walks").foreach { wv =>
        val wc = asConf(wv)
        knownKeys("random_walks", wc,
          Set("length", "walks_per_node", "max_neighbors", "salt"))
        metrics("random_walks") = graft.functions.Graph.randomWalks(edges, src, dst,
          walkLength = wc.getOrElse("length", 3).toString.toInt,
          walksPerNode = wc.getOrElse("walks_per_node", 1).toString.toInt,
          maxNeighbors = wc.getOrElse("max_neighbors", 32).toString.toInt,
          salt = wc.getOrElse("salt", "").toString)
      }
      gm.get("harmonic").foreach { hv =>
        val hc = asConf(hv)
        knownKeys("harmonic", hc, Set("radius", "approx", "lg_k"))
        val radius = hc.getOrElse("radius", 3).toString.toInt
        metrics("harmonic") =
          if (hc.getOrElse("approx", false).toString.toBoolean)
            graft.functions.Graph.harmonicCentralityApprox(edges, src, dst,
              radius = radius, lgK = hc.getOrElse("lg_k", 12).toString.toInt)
          else graft.functions.Graph.harmonicCentrality(edges, src, dst, radius)
      }
      if (gm.getOrElse("triangle_counts", false) == true)
        metrics("triangle_counts") =
          graft.functions.Graph.triangleCounts(edges, src, dst)
      if (gm.getOrElse("summary", false) == true)
        metrics("summary") =
          graft.functions.Graph.graphSummary(edges, src, dst)
      timed("graph_metrics", metrics.toMap) { () }
    }

    // ---- bm25_retrieval: rank the frame's text column against the
    // configured query strings (query ids = list position); top-k per
    // query attaches as a stage metric.
    conf.get("bm25_retrieval").foreach { v =>
      val bc = asConf(v)
      val textCol = bc.getOrElse("text_col", "text").toString
      val idCol = bc.getOrElse("id_col", df.columns.head).toString
      val qs = strings(bc("queries")).zipWithIndex
        .map { case (q, i) => (i.toLong, q) }
      val topk = graft.functions.TextOps.bm25TopK(
        df, textCol, idCol, qs,
        k = bc.getOrElse("k", 10).toString.toInt,
        k1 = bc.getOrElse("k1", 1.2).toString.toDouble,
        b = bc.getOrElse("b", 0.75).toString.toDouble)
      timed("bm25_retrieval", Map("bm25_topk" -> topk)) { () }
    }

    // ---- heavy_hitters: Misra-Gries top values per configured column
    // (native bounded-state aggregate — one metric frame per column).
    conf.get("heavy_hitters").foreach { v =>
      val hh = asConf(v)
      val k = hh.getOrElse("k", 20).toString.toInt
      val cols = resolveCols(df, hh.getOrElse("list_of_cols", null))
      val metrics = cols.map { c =>
        s"heavy_hitters_$c" -> graft.functions.TextOps.heavyHitters(df, c, k)
      }.toMap
      timed("heavy_hitters", metrics) { () }
    }

    // ---- transformers
    conf.get("transformers").foreach { v =>
      val tc = asConf(v)
      timed("transformers") {
        tc.get("attribute_binning").foreach { d =>
          val dd = asConf(d)
          df = Transformers.attributeBinning(df,
            strings(dd("list_of_cols")),
            dd.getOrElse("method_type", "equal_range").toString,
            dd.getOrElse("bin_size", 10).toString.toInt)
        }
        tc.get("z_standardization").foreach(d =>
          df = Transformers.zStandardization(df, strings(asConf(d)("list_of_cols"))))
        tc.get("normalization").foreach(d =>
          df = Transformers.normalization(df, strings(asConf(d)("list_of_cols"))))
        tc.get("cat_to_num_unsupervised").foreach(d =>
          df = Transformers.labelEncoding(df, strings(asConf(d)("list_of_cols"))))
        // ref configs.yaml cat_to_num_transformer method_type: supervised
        // (target encoding against a label/event pair)
        tc.get("cat_to_num_supervised").foreach { d =>
          val dd = asConf(d)
          df = Transformers.catToNumTransformer(df,
            strings(dd("list_of_cols")),
            labelCol = Some(dd("label_col").toString),
            eventLabel = dd.getOrElse("event_label", "1").toString)
        }
        tc.get("outlier_categories").foreach { d =>
          val dd = asConf(d)
          df = Transformers.outlierCategories(df, strings(dd("list_of_cols")),
            dd.getOrElse("max_category", 10).toString.toInt)
        }
        tc.get("feature_transformation").foreach { d =>
          val dd = asConf(d)
          val method = dd.getOrElse("method_type", "ln").toString
          strings(dd("list_of_cols")).foreach { c =>
            df = df.withColumn(c,
              Transformers.featureTransformation(
                org.apache.spark.sql.functions.col(c), method))
          }
        }
        tc.get("boxcox_transformation").foreach { d =>
          val dd = asConf(d)
          val (out, _) = Transformers.boxcoxTransformation(df, strings(dd("list_of_cols")))
          df = out
        }
        tc.get("quantile_transform").foreach { d =>
          val dd = asConf(d)
          df = Transformers.quantileTransform(df, strings(dd("list_of_cols")),
            dd.getOrElse("n_quantiles", 101).toString.toInt)
        }
        tc.get("imputation_sklearn").foreach { d =>
          val dd = asConf(d)
          val cols = resolveCols(df, dd.getOrElse("list_of_cols", null))
            .filter(graft.core.ColumnRole.numericCols(df).contains)
          df = dd.getOrElse("method_type", "regression").toString match {
            case "KNN" => KnnImputer.imputationKnn(df, cols)
            case _ => graft.operators.IterativeImputer.imputationIterative(df, cols)
          }
        }
      }
    }

    // ---- association_evaluator (metrics attached to the stage result)
    conf.get("association_evaluator").foreach { v =>
      val ac = asConf(v)
      val metrics = scala.collection.mutable.Map.empty[String, DataFrame]
      ac.get("correlation_matrix").foreach { d =>
        val cols = resolveCols(df, asConf(d).getOrElse("list_of_cols", null))
          .filter(graft.core.ColumnRole.numericCols(df).contains)
        if (cols.size >= 2) metrics += "correlation_matrix" -> Association.correlationMatrix(df, cols)
      }
      ac.get("IV_calculation").foreach { d =>
        val dd = asConf(d)
        val label = dd("label_col").toString
        val event = dd.getOrElse("event_label", "1").toString
        val cols = resolveCols(df, dd.getOrElse("list_of_cols", null), Seq(label))
        metrics += "IV_calculation" -> Association.ivCalculation(df, cols,
          org.apache.spark.sql.functions.col(label) === event)
      }
      ac.get("IG_calculation").foreach { d =>
        val dd = asConf(d)
        val label = dd("label_col").toString
        val event = dd.getOrElse("event_label", "1").toString
        val cols = resolveCols(df, dd.getOrElse("list_of_cols", null), Seq(label))
        metrics += "IG_calculation" -> Association.igCalculation(df, cols,
          org.apache.spark.sql.functions.col(label) === event)
      }
      ac.get("spearman_matrix").foreach { d =>
        val cols = resolveCols(df, asConf(d).getOrElse("list_of_cols", null))
          .filter(graft.core.ColumnRole.numericCols(df).contains)
        if (cols.size >= 2)
          metrics += "spearman_matrix" -> Association.spearmanMatrix(df, cols)
      }
      ac.get("cat_association").foreach { d =>
        val cols = resolveCols(df, asConf(d).getOrElse("list_of_cols", null))
        if (cols.size >= 2)
          metrics += "cat_association" -> Association.catAssociation(df, cols)
      }
      ac.get("correlation_ratio").foreach { d =>
        val dd = asConf(d)
        val cats = resolveCols(df, dd.getOrElse("cat_cols", null))
        val nums = resolveCols(df, dd.getOrElse("num_cols", null))
          .filter(graft.core.ColumnRole.numericCols(df).contains)
        if (cats.nonEmpty && nums.nonEmpty)
          metrics += "correlation_ratio" -> Association.correlationRatio(df, cats, nums)
      }
      timed("association_evaluator", metrics.toMap) { () }
    }

    // ---- geospatial (ref workflow geospatial_controller analog)
    conf.get("geospatial").foreach { v =>
      val gc = asConf(v)
      timed("geospatial") {
        (gc.get("lat_col"), gc.get("lon_col")) match {
          case (Some(la), Some(lo)) =>
            val lat = org.apache.spark.sql.functions.col(la.toString)
            val lon = org.apache.spark.sql.functions.col(lo.toString)
            gc.get("geohash_precision").foreach { p =>
              graft.plans.GraftFunctions.register(spark)
              df = df.withColumn("geohash", org.apache.spark.sql.functions.expr(
                s"geohash_encode(cast(`${la.toString}` as double), " +
                  s"cast(`${lo.toString}` as double), ${p.toString.toInt})"))
            }
            // single-match variant: overlapping boxes must not multiply
            // the frame's cardinality for every downstream stage
            if (gc.getOrElse("in_country", false) == true)
              df = graft.functions.Geo.locationCountry(df, la.toString, lo.toString)
            strings(gc.getOrElse("country_flags", null)).foreach { code =>
              df = df.withColumn(s"in_$code",
                graft.functions.Geo.locationInCountry(lat, lon, code))
            }
            // both halves of the ref's cluster analysis
            // (geospatial_analyzer.py:390-733)
            gc.get("cluster_kmeans").foreach { k =>
              val (_, labeled) = graft.functions.Geo.clusterAnalysis(
                df, la.toString, lo.toString, maxK = k.toString.toInt)
              df = labeled
            }
            if (gc.getOrElse("cluster_dbscan", false) == true)
              df = graft.functions.Geo.dbscanClusterAnalysis(
                df, la.toString, lo.toString).labeled
          case _ =>
            throw new IllegalArgumentException("geospatial stage needs lat_col and lon_col")
        }
      }
    }

    // ---- drift_detector (target = current df, source read from path)
    conf.get("drift_detector").foreach { v =>
      val dc = asConf(v)
      val source = spark.read.parquet(dc("source_path").toString)
      val cols = resolveCols(df, dc.getOrElse("list_of_cols", null))
        .filter(graft.core.ColumnRole.numericCols(df).contains)
      val bins = dc.getOrElse("bin_size", 10).toString.toInt
      timed("drift_detector",
        Map("drift_statistics" -> Drift.driftStatistics(source, df, cols, bins))) { () }
    }

    // ---- report_preprocessing: the full BasicReport stats tables,
    // optionally persisted (the reference's chart-feeding stage)
    conf.get("report_preprocessing").foreach { v =>
      val rc = asConf(v)
      import org.apache.spark.sql.functions.col
      // optional chart-DATA frames alongside the stats tables (the
      // reference's plot_* precompute layer, figures excluded)
      val charts: Map[String, org.apache.spark.sql.DataFrame] =
        strings(rc.getOrElse("frequency_cols", null))
          .map(c => s"chart_frequency_$c" ->
            BasicReport.frequencyChartData(df, c)).toMap ++
        rc.get("outlier_chart").map { oc =>
          val o = asConf(oc)
          val c = o("col").toString
          s"chart_outlier_$c" -> BasicReport.outlierChartData(
            df, c, strings(o("key_cols")),
            sampleSize = o.getOrElse("sample_size", 500000L).toString.toLong)
        }.toMap ++
        rc.get("event_rate_chart").map { ec =>
          val e = asConf(ec)
          val c = e("col").toString
          s"chart_event_rate_$c" -> BasicReport.eventRateChartData(
            df, c, e("label_col").toString, e("event").toString)
        }.toMap
      val report = BasicReport.generate(df) ++ charts
      timed("report_preprocessing", report) {
        rc.get("save_path").foreach { p =>
          report.foreach { case (name, m) =>
            m.coalesce(1).write.mode("overwrite").parquet(s"$p/$name")
          }
        }
      }
    }

    // ---- checkpoint barrier (write + re-read, the reference's plan cut)
    conf.get("write_intermediate").foreach { v =>
      val wc = asConf(v)
      val path = wc("file_path").toString
      timed("write_intermediate") {
        Ingest.writeDataset(df, path, wc.getOrElse("file_type", "parquet").toString)
        df = spark.read.format(wc.getOrElse("file_type", "parquet").toString).load(path)
      }
    }

    // ---- final write (zorder_by → Z-order clustered parquet for
    // multi-dimension file skipping; cluster_by → range-clustered for
    // the leading key; else plain write_dataset)
    conf.get("write_main").foreach { v =>
      val wc = asConf(v)
      timed("write_main") {
        (wc.get("zorder_by"), wc.get("cluster_by")) match {
          case (Some(zb), _) =>
            Ingest.writeZOrdered(df, wc("file_path").toString, strings(zb),
              wc.getOrElse("num_files", 200).toString.toInt)
          case (None, Some(cb)) =>
            Ingest.writeClustered(df, wc("file_path").toString, strings(cb),
              wc.getOrElse("num_files", 200).toString.toInt)
          case (None, None) =>
            Ingest.writeDataset(df, wc("file_path").toString,
              wc.getOrElse("file_type", "parquet").toString,
              repartitionTo = wc.get("repartition").map(_.toString.toInt))
        }
      }
    }

    (df, results.toSeq)
  }
}
