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

  /** ref: transformers.py:2260-2521 `auto_imputation` — mask a fraction
    * of clean rows, run candidate imputers, pick the min-RMSE one.
    * Candidates: MMM-mean, MMM-median (extend with MF when ids exist).
    * Returns (bestMethod, rmse per method).
    */
  def autoImputation(
      df: DataFrame,
      cols: Seq[String],
      nullPct: Double = 0.1,
      seed: Long = 42L): (String, Map[String, Double]) = {
    val clean = df.na.drop(cols)
    // keep the originals, mask a seeded fraction, persist so every
    // candidate sees the SAME mask (rand() re-evaluates per plan branch)
    val masked = graft.core.Caching.withPersisted(
      clean
        .select(cols.map(col) ++ cols.map(c => col(c).as(s"__orig_$c")): _*)
        .withColumn("__mask", rand(seed) < nullPct)) { m0 =>
      val withNulls = cols.foldLeft(m0) { (d, c) =>
        d.withColumn(c, when(col("__mask"), lit(null)).otherwise(col(c)))
      }
      val methods = Seq("mean", "median")
      val rmses = methods.map { m =>
        val imputed = Transformers.imputationMMM(withNulls, cols, Nil, numMethod = m)
        val sqErr = cols
          .map(c => sum(when(col("__mask"), pow(col(c) - col(s"__orig_$c"), 2)).otherwise(0.0)))
          .reduce(_ + _)
        val nMasked = sum(when(col("__mask"), 1).otherwise(0)) * cols.size
        val row = imputed.agg((sqErr / nMasked).as("mse")).first()
        m -> math.sqrt(row.getDouble(0))
      }.toMap
      (rmses.minBy(_._2)._1, rmses)
    }
    masked
  }
}
