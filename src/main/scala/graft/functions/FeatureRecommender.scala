package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic feature search (ref: feature_recommender/ — the reference
  * embeds a feature corpus with sentence-transformers and ranks by cosine
  * similarity). Public-knowledge JVM stand-in: TF-IDF vectors over the
  * corpus + query, same cosine-ranked API shape. Pure DataFrame ops — the
  * corpus term stats are one aggregation, scoring is a broadcast join.
  */
object FeatureRecommender {

  /** Tokenized corpus → (id, token) pairs. */
  private def tokens(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("id"),
      explode(split(TextOps.normalizeText(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 1)

  /** Rank corpus entries against a free-text query by TF-IDF cosine.
    * Output: [id, name, score] top-k.
    */
  def search(
      corpus: DataFrame,
      idCol: String,
      nameCol: String,
      descCol: String,
      query: String,
      topK: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count().toDouble

    val tf = tokens(corpus, idCol, descCol)
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("token")
      .agg(countDistinct(col("id")).as("df"))
      .withColumn("idf", log(lit(n + 1) / (col("df") + 1)) + 1)
    val weighted = tf.join(idf, "token")
      .withColumn("w", col("tf") * col("idf"))

    val queryTokens = TextOps
      .normalizeTextString(query).split(" ").filter(_.length > 1)
      .groupBy(identity).map { case (t, xs) => (t, xs.length) }.toSeq
    val qDf = queryTokens.toDF("token", "qtf")
    val qWeighted = broadcast(qDf.join(idf, Seq("token"), "inner")
      .withColumn("qw", col("qtf") * col("idf")))

    val docNorms = weighted.groupBy("id").agg(sqrt(sum(pow(col("w"), 2))).as("dnorm"))
    // sum() is NULL when no query token is in the corpus vocabulary
    // (empty join) — guard before getDouble or it NPEs
    val qNormRow = qWeighted.agg(sum(pow(col("qw"), 2))).first()
    val qNorm = math.sqrt(
      if (qNormRow.isNullAt(0) || qNormRow.getDouble(0) <= 0) 1.0
      else qNormRow.getDouble(0))

    weighted.join(qWeighted.select("token", "qw"), "token")
      .groupBy("id").agg(sum(col("w") * col("qw")).as("dot"))
      .join(docNorms, "id")
      .withColumn("score", round(col("dot") / (col("dnorm") * lit(qNorm)), 4))
      .join(corpus.select(col(idCol).as("id"), col(nameCol).as("name")), "id")
      .select("id", "name", "score")
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)
  }
}
