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

    // Materialized once: idf, doc norms, and the query dot product all
    // read this token-frequency frame, and Spark SQL replays lineage per
    // consumer — without the cut the corpus tokenize-explode runs three
    // times (measured ~2x the whole query at sf0.1). Token-level rows,
    // far smaller than the corpus text it distills.
    val tf = tokens(corpus, idCol, descCol)
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // tf is unique on (id, token), so count(*) per token IS the document
    // frequency — no countDistinct expand. The idf frame is
    // dictionary-vocabulary-sized (this operator's contract is a feature
    // registry / data dictionary, not a web corpus), so it broadcasts:
    // the corpus-token-sized weighted join never shuffles.
    val idf = tf.groupBy("token")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", log(lit(n + 1) / (col("df") + 1)) + 1)
    val weighted = tf.join(broadcast(idf), "token")
      .withColumn("w", col("tf") * col("idf"))

    val queryTokens = TextOps
      .normalizeTextString(query).split(" ").filter(_.length > 1)
      .groupBy(identity).map { case (t, xs) => (t, xs.length) }.toSeq
    val qDf = queryTokens.toDF("token", "qtf")
    val qWeighted = broadcast(qDf.join(idf, Seq("token"), "inner")
      .withColumn("qw", col("qtf") * col("idf")))

    // the query norm stays IN the plan as a broadcast 1-row frame (a
    // driver-side .first() here would re-execute the whole
    // tokenize→tf→idf chain as a second full corpus pass — Spark SQL
    // re-plans per action, no reuse across actions). sum() is NULL when
    // no query token is in the corpus vocabulary (empty join) → norm 1.0.
    val qSq = sum(pow(col("qw"), 2))
    val qNormDf = broadcast(qWeighted.agg(
      sqrt(coalesce(when(qSq > 0, qSq), lit(1.0))).as("qnorm")))

    // ONE pass over the corpus-token frame computes the doc norm AND the
    // query dot product together (a broadcast left join attaches qw; a
    // doc with no query token sums to NULL and is dropped, exactly the
    // rows the former inner-join dots pass excluded)
    weighted.join(broadcast(qWeighted.select("token", "qw")), Seq("token"), "left")
      .groupBy("id").agg(sqrt(sum(pow(col("w"), 2))).as("dnorm"),
        sum(col("w") * col("qw")).as("dot"))
      .filter(col("dot").isNotNull)
      .crossJoin(qNormDf)
      .withColumn("score", round(col("dot") / (col("dnorm") * col("qnorm")), 4))
      .join(corpus.select(col(idCol).as("id"), col(nameCol).as("name")), "id")
      .select("id", "name", "score")
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)
  }

  /** ref: feature_explorer.py:23-59 list_all_industry/usecase/pair —
    * the corpus facet listings (distinct values / value pairs).
    */
  def listFacets(corpus: DataFrame, facetCols: Seq[String]): DataFrame =
    corpus.select(facetCols.map(col): _*).distinct()
      .orderBy(facetCols.map(col): _*)

  /** ref: feature_explorer.py:61-137 process_usecase/process_industry —
    * the facet-name resolver: the normalized input wins when it exactly
    * matches an existing facet value; otherwise (semantic mode) the
    * nearest existing value by Jaro-Winkler similarity — the engine's
    * codegen'd record-linkage scorer standing in for the reference's
    * sentence-transformer cosine — with a deterministic value
    * tie-break. The facet vocabulary is collected (explorer contract:
    * tens of industries/usecases, not data-scale).
    */
  def processFacet(
      corpus: DataFrame,
      facetCol: String,
      input: String,
      semantic: Boolean = true): String = {
    // punctuation → space FIRST, then collapse/trim: trimming before the
    // substitution leaves residual spaces from edge punctuation
    // ("telecom!" → "telecom ") that would miss every exact match
    val norm = input.toLowerCase.replaceAll("[^a-z0-9 ]+", " ")
      .replaceAll("\\s+", " ").trim
    val values = corpus.select(col(facetCol).cast("string")).na.drop().distinct()
      .collect().map(_.getString(0))
    if (!semantic || values.contains(norm) || values.isEmpty) norm
    else values.maxBy(v => (graft.plans.JaroWinklerExpr.similarity(norm, v), v))
  }

  /** ref: feature_explorer.py:181-271 list_feature_by_industry/usecase —
    * resolve the facet name ([[processFacet]]) and return its features,
    * capped at `numFeat` in deterministic name order.
    */
  def listFeaturesByFacet(
      corpus: DataFrame,
      facetCol: String,
      nameCol: String,
      value: String,
      numFeat: Int = 100,
      semantic: Boolean = true): DataFrame = {
    val resolved = processFacet(corpus, facetCol, value, semantic)
    corpus.filter(col(facetCol) === resolved)
      .orderBy(col(nameCol).asc)
      .limit(numFeat)
  }

  /** ref: feature_mapper.py:322-463 find_attr_by_relevance — map a
    * user's data-dictionary attributes onto a feature-building corpus:
    * for EVERY target corpus description, rank the user's attributes by
    * similarity and keep those at/above `threshold`. The reference's
    * sentence-transformer similarity is replaced by the same TF-IDF
    * cosine stand-in as [[search]] (idf fit on the ATTRIBUTE corpus;
    * each building-corpus entry scores as a query against it — one
    * aggregation for term stats, one broadcast join for all queries at
    * once, no per-query job).
    *
    * Output: [input_feature_desc, attribute_name, attribute_desc,
    * score], score desc within each input description.
    */
  def findAttrByRelevance(
      attrs: DataFrame,
      idCol: String,
      nameCol: String,
      descCol: String,
      buildingCorpus: Seq[String],
      threshold: Double = 0.3): DataFrame = {
    val spark = attrs.sparkSession
    import spark.implicits._
    require(buildingCorpus.nonEmpty, "need at least one building-corpus entry")
    // the pivot below builds one aggregate column + one stack() slot per
    // corpus entry — fine for the driver-side lists the reference passes
    // (tens of entries), pathological to COMPILE at hundreds; fail loudly
    // instead of handing Catalyst a thousand-column aggregate
    require(buildingCorpus.size <= 256,
      s"buildingCorpus has ${buildingCorpus.size} entries; the pivoted " +
        "single-pass plan generates one column per entry and is meant for " +
        "driver-side lists (<= 256) — split the corpus into batches")
    val base = attrs.select(col(idCol).as("id"), col(nameCol).as("name"),
      col(descCol).as("desc"),
      concat_ws(" ", col(nameCol), col(descCol)).as("__text"))
    val n = base.count().toDouble
    // same materialize-once rationale as search(): idf, doc norms, and
    // the per-query dots all replay this frame's corpus tokenize otherwise
    val tf = tokens(base, "id", "__text")
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // same df-via-count(*) + broadcast-idf rationale as search(): tf is
    // unique on (id, token) and the vocabulary is dictionary-sized
    val idf = tf.groupBy("token")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", log(lit(n + 1) / (col("df") + 1)) + 1)
    val weighted = tf.join(broadcast(idf), "token")
      .withColumn("w", col("tf") * col("idf"))

    val qRows = buildingCorpus.zipWithIndex.flatMap { case (q, qi) =>
      TextOps.normalizeTextString(q).split(" ").filter(_.length > 1)
        .groupBy(identity).map { case (t, xs) => (qi, q, t, xs.length) }
    }
    val qDf = qRows.toDF("qid", "qtext", "token", "qtf")
    val qWeighted = broadcast(qDf.join(idf, Seq("token"), "inner")
      .withColumn("qw", col("qtf") * col("idf")))
    // per-query norms stay a tiny frame: |buildingCorpus| rows
    val qNorms = qWeighted.groupBy("qid", "qtext")
      .agg(sqrt(sum(pow(col("qw"), 2))).as("qnorm"))

    // pivot the query weights to one column per building-corpus entry so
    // the doc norm AND every query's dot product come out of ONE pass
    // over the corpus-token frame (|buildingCorpus| is a driver-side
    // list — tens of entries, never data-sized)
    val qis = buildingCorpus.indices
    val qPivot = broadcast(qWeighted.groupBy("token")
      .agg(sum(when(col("qid") === 0, col("qw"))).as("qw0"),
        qis.drop(1).map(qi =>
          sum(when(col("qid") === qi, col("qw"))).as(s"qw$qi")): _*))
    val dotAggs = sqrt(sum(pow(col("w"), 2))).as("dnorm") +:
      qis.map(qi => sum(col("w") * col(s"qw$qi")).as(s"dot$qi"))
    val perDoc = weighted.join(qPivot, Seq("token"), "left")
      .groupBy("id").agg(dotAggs.head, dotAggs.tail: _*)
    // unpivot to (id, dnorm, qid, dot); a doc with no overlap with a
    // query sums to NULL — exactly the rows the former per-query
    // inner-join dots pass excluded
    val stackExpr = s"stack(${qis.size}, " +
      qis.map(qi => s"$qi, dot$qi").mkString(", ") + ") AS (qid, dot)"
    perDoc.select(col("id"), col("dnorm"), expr(stackExpr))
      .filter(col("dot").isNotNull)
      .join(broadcast(qNorms), "qid")
      .withColumn("score", round(col("dot") / (col("dnorm") * col("qnorm")), 4))
      .filter(col("score") >= threshold)
      .join(base.select("id", "name", "desc"), "id")
      .select(col("qtext").as("input_feature_desc"), col("name").as("attribute_name"),
        col("desc").as("attribute_desc"), col("score"))
      .orderBy(col("input_feature_desc"), col("score").desc, col("attribute_name"))
  }
}
