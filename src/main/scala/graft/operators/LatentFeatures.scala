package graft.operators

import org.apache.spark.ml.feature.{PCA, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Advanced imputation + latent-feature transformers built on spark.ml
  * (ref: data_transformer/transformers.py §2.8 advanced ops).
  */
object LatentFeatures {

  /** ref: transformers.py:2915-3168 `PCA_latentFeatures` — z-standardize,
    * fit PCA, keep the smallest k whose cumulative explained variance
    * reaches the cutoff, emit latent_0..latent_{k-1}.
    */
  def pcaLatentFeatures(
      df: DataFrame,
      cols: Seq[String],
      explainedVarianceCutoff: Double = 0.95,
      keepOriginal: Boolean = false): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("__features")
      .setHandleInvalid("skip")
      .transform(df)
    val scaled = new StandardScaler()
      .setInputCol("__features").setOutputCol("__scaled")
      .setWithMean(true).setWithStd(true)
      .fit(assembled).transform(assembled)
    val full = new PCA().setInputCol("__scaled").setOutputCol("__pca")
      .setK(cols.size).fit(scaled)
    val cum = full.explainedVariance.toArray.scanLeft(0.0)(_ + _).tail
    val k = math.max(1, cum.indexWhere(_ >= explainedVarianceCutoff) + 1 match {
      case 0 => cols.size
      case n => n
    })
    // components are ordered by explained variance — projecting with the
    // full model and slicing the first k coordinates equals refitting
    // PCA(k), without a second fit pass
    val out = full.transform(scaled)
      .withColumn("__arr", vector_to_array(col("__pca")))
    val withLatents = (0 until k).foldLeft(out) { (d, i) =>
      d.withColumn(s"latent_$i", round(element_at(col("__arr"), i + 1), 4))
    }
    val dropped = withLatents.drop("__features", "__scaled", "__pca", "__arr")
    if (keepOriginal) dropped else dropped.drop(cols: _*)
  }

  /** ref: transformers.py:2022-2257 `imputation_matrixFactorization` —
    * melt id×attribute to (user, item, rating), ALS with the reference's
    * hyperparameters (maxIter 20, reg 0.01, coldStartStrategy drop),
    * predict the null cells, pivot back and coalesce over the original.
    */
  def imputationMatrixFactorization(
      df: DataFrame,
      idCol: String,
      cols: Seq[String],
      rank: Int = 10,
      maxIter: Int = 20,
      regParam: Double = 0.01,
      seed: Long = 42L): DataFrame = {
    import df.sparkSession.implicits._
    // ALS lineage grows per iteration; without a checkpoint dir its
    // periodic checkpointing (interval 10) is skipped and closure
    // serialization can StackOverflow on deep plans
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        System.getProperty("java.io.tmpdir", "/tmp") + "/graft-checkpoints")
    val itemIndex = cols.zipWithIndex.toMap
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    val long = df.select(col(idCol),
      expr(s"stack(${cols.size}, $stackArgs) as (attribute, rating)"))
    val itemDf = itemIndex.toSeq.toDF("attribute", "__item")
    val ratings = long.join(broadcast(itemDf), "attribute")
      .withColumn("__user", col(idCol).cast("int"))
    val train = ratings.filter(col("rating").isNotNull)
    val als = new ALS()
      .setUserCol("__user").setItemCol("__item").setRatingCol("rating")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setColdStartStrategy("drop").setSeed(seed)
    val model = als.fit(train)
    val missing = ratings.filter(col("rating").isNull)
    val predicted = model.transform(missing)
      .select(col(idCol), col("attribute"), col("prediction").cast("double").as("rating"))
    val filledLong = train.select(col(idCol), col("attribute"), col("rating"))
      .unionByName(predicted)
    filledLong.groupBy(col(idCol)).pivot("attribute", cols).agg(first("rating"))
  }

  /** MF imputation joined back onto the full frame. ALS with
    * coldStartStrategy="drop" loses rows whose EVERY target column is
    * null (no observed rating anchors the user factor) — a left join +
    * column-mean fallback keeps them, mirroring sklearn-style imputers.
    */
  def imputationMFJoined(
      df: DataFrame,
      idCol: String,
      cols: Seq[String]): DataFrame = {
    val filled = cols.foldLeft(imputationMatrixFactorization(df, idCol, cols)) {
      (d, c) => d.withColumnRenamed(c, s"__mf_$c")
    }
    val meanExprs = cols.map(c => avg(col(c)).as(s"m__$c"))
    val meanRow = df.agg(meanExprs.head, meanExprs.tail: _*).first()
    cols.foldLeft(df.join(filled, Seq(idCol), "left")) { (d, c) =>
      val m = Transformers.optD(meanRow, s"m__$c").getOrElse(0.0)
      d.withColumn(c, coalesce(col(s"__mf_$c"), col(c), lit(m)))
        .drop(s"__mf_$c")
    }
  }

  /** ref: transformers.py:2260-2521 `auto_imputation` — mask a fraction
    * of clean rows, run the candidate imputers, pick the one with the
    * least Σ_attr RMSE/attr_mean (the reference's unit-free metric).
    * Candidates match the reference's five: MMM-mean, MMM-median, KNN,
    * regression (iterative), and MF when an id column is given; with a
    * single numeric column only the two MMM methods run (ref behaviour).
    * Returns (bestMethod, normalized error per method).
    */
  def autoImputation(
      df: DataFrame,
      cols: Seq[String],
      nullPct: Double = 0.1,
      idCol: Option[String] = None,
      seed: Long = 42L,
      evalSampleCap: Option[Long] = Some(20000L)): (String, Map[String, Double]) = {
    // model selection runs 5 candidate imputers — evaluating them on a
    // capped sample keeps the fit cost constant at 100 TB (the chosen
    // method is then applied to the FULL frame by the caller)
    val clean = QualityChecker.sampleCapped(df.na.drop(cols), evalSampleCap, seed)
    // keep the originals, mask a seeded fraction PER CELL (a per-row mask
    // would null every attribute of the row at once, leaving MF/KNN/
    // regression no observed dimension to predict from — the reference
    // removes a % of values, not rows); persist so every candidate sees
    // the SAME mask (rand() re-evaluates per plan branch)
    val keep = idCol.toSeq.map(col) ++ cols.map(col) ++
      cols.map(c => col(c).as(s"__orig_$c"))
    val withMasks = cols.zipWithIndex.foldLeft(clean.select(keep: _*)) {
      case (d, (c, i)) => d.withColumn(s"__mask_$c", rand(seed + i) < nullPct)
    }
    val result = graft.core.Caching.withPersisted(withMasks) { m0 =>
      val withNulls = cols.foldLeft(m0) { (d, c) =>
        d.withColumn(c, when(col(s"__mask_$c"), lit(null)).otherwise(col(c)))
      }
      val multi = cols.size >= 2
      val candidates: Seq[(String, DataFrame => DataFrame)] =
        Seq[(String, DataFrame => DataFrame)](
          "mean" -> (d => Transformers.imputationMMM(d, cols, Nil, numMethod = "mean")),
          "median" -> (d => Transformers.imputationMMM(d, cols, Nil, numMethod = "median"))) ++
        (if (multi) Seq[(String, DataFrame => DataFrame)](
          "KNN" -> (d => KnnImputer.imputationKnn(d, cols, seed = seed)),
          "regression" -> (d => IterativeImputer.imputationIterative(d, cols, seed = seed)))
         else Nil) ++
        (if (multi && idCol.isDefined) Seq[(String, DataFrame => DataFrame)](
          "MF" -> (d => imputationMFJoined(d, idCol.get, cols)))
         else Nil)
      // candidates evaluate CONCURRENTLY: each fit+score is mostly small
      // sequential Spark jobs over the shared persisted masked frame, so
      // overlapping them hides per-job scheduling latency (Spark actions
      // are thread-safe; jobs from different threads interleave FIFO)
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      withNulls.count() // materialize the shared cache before racing on it
      val pool = java.util.concurrent.Executors.newFixedThreadPool(candidates.size)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val futures = candidates.map { case (m, f) =>
        Future {
          val imputed = f(withNulls)
          // per-attribute masked MSE and original mean in ONE agg
          val exprs = cols.flatMap(c => Seq(
            avg(when(col(s"__mask_$c"), pow(col(c) - col(s"__orig_$c"), 2))).as(s"mse__$c"),
            avg(col(s"__orig_$c")).as(s"mean__$c")))
          val row = imputed.agg(exprs.head, exprs.tail: _*).first()
          val err = cols.map { c =>
            // NULL masked-MSE means the candidate lost/failed the masked
            // rows — that is a failure, not a perfect score
            val mse = Transformers.optD(row, s"mse__$c").getOrElse(Double.PositiveInfinity)
            val mean = Transformers.optD(row, s"mean__$c").getOrElse(1.0)
            math.sqrt(mse) / math.max(math.abs(mean), 1e-12)
          }.sum
          m -> err
        }
      }
      val errors =
        try futures.map(Await.result(_, Duration.Inf)).toMap
        finally pool.shutdown()
      (errors.minBy(_._2)._1, errors)
    }
    result
  }

  /** Treatment wrapper: choose the best candidate on masked clean rows,
    * then impute the FULL frame with it (ref quality_checker.py:521-547
    * "auto" treatment path).
    */
  def autoImputationApply(
      df: DataFrame,
      cols: Seq[String],
      nullPct: Double = 0.1,
      idCol: Option[String] = None,
      seed: Long = 42L): (String, DataFrame) = {
    val (best, _) = autoImputation(df, cols, nullPct, idCol, seed)
    val imputed = best match {
      case "mean" | "median" => Transformers.imputationMMM(df, cols, Nil, numMethod = best)
      case "KNN" => KnnImputer.imputationKnn(df, cols, seed = seed)
      case "regression" => IterativeImputer.imputationIterative(df, cols, seed = seed)
      case "MF" => imputationMFJoined(df, idCol.get, cols)
    }
    (best, imputed)
  }
}
