package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer TRAINING — the third tokenizer family
  * next to BPE ([[BpeTokenizer]]) and unigram-LM ([[UnigramTokenizer]]).
  * Public knowledge: Schuster & Nakajima 2012 ("Japanese and Korean
  * voice search") as popularized by BERT (Devlin et al. 2019) — the
  * merge loop is BPE's, but each round picks the pair maximizing the
  * unigram-likelihood GAIN `count(lhs,rhs) / (count(lhs)·count(rhs))`
  * instead of the raw pair frequency, so rare-but-cohesive pairs merge
  * before frequent-but-independent ones.
  *
  * Spark shape (mirrors [[BpeTokenizer.trainMerges]]): ONE corpus-sized
  * pass builds the eligible-word frequency table; every round after is
  * vocab-sized — pair weights and symbol weights are two map-side-
  * combined aggregates over the (freq, syms) frame, scored by a
  * broadcast-joined ratio, and the single best pair comes back through
  * a TakeOrdered(1). Driver state per round: ONE row.
  *
  * Cross-engine determinism of the score: `pc`, `lsc`, `rsc` are exact
  * BIGINTs; each is cast to DOUBLE (exact below 2^53), then ONE IEEE
  * multiply and ONE IEEE divide — both correctly rounded, so Spark and
  * DuckDB compute bit-identical scores at any corpus size (no BIGINT
  * overflow path: the multiply happens in double space). Ties break on
  * (lhs, rhs) ascending — the same total order the oracle replays.
  *
  * INFERENCE is the greedy longest-match segmenter the engine already
  * ships ([[BpeTokenizer.pieceEncode]] over the induced vocabulary) —
  * WordPiece's canonical decode rule.
  */
object WordPieceTokenizer {

  /** One learned merge: rank, the pair, its corpus pair weight and its
    * likelihood score at merge time.
    */
  final case class WpMerge(
      rank: Int, lhs: String, rhs: String, pairCount: Long, score: Double)

  /** Train `numMerges` likelihood-scored merges; stops early when no
    * remaining pair reaches `minPairFreq`. Returns the merge list in
    * rank order.
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairFreq: Long = 2L,
      maxWordLen: Int = 32): Seq[WpMerge] = {
    require(numMerges >= 1, "numMerges must be positive")
    require(minPairFreq >= 1, "minPairFreq must be positive")
    val syms = col("syms")
    var words = BpeTokenizer.wordFrequencies(df, textCol, maxWordLen)
      .select(col("freq"), BpeTokenizer.charSyms.as("syms"))
      .localCheckpoint(true) // the one corpus-sized stage ends here
    val pairsOf = BpeTokenizer.adjacentPairs(syms)
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    var done = false
    while (merges.length < numMerges && !done) {
      val pairs = words.select(col("freq"), explode(pairsOf).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("pc"))
        .filter(col("pc") >= minPairFreq)
      // symbol weights: ≤ 27 + rank distinct symbols — a broadcast frame
      val symCounts = broadcast(
        words.select(col("freq"), explode(syms).as("sym"))
          .groupBy("sym").agg(sum(col("freq")).as("sc")))
      val top = pairs
        .join(symCounts.select(col("sym").as("lhs"), col("sc").as("lsc")), "lhs")
        .join(symCounts.select(col("sym").as("rhs"), col("sc").as("rsc")), "rhs")
        .withColumn("score",
          col("pc").cast("double") / (col("lsc").cast("double") * col("rsc").cast("double")))
        .orderBy(col("score").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        val (a, b) = (r.getAs[String]("lhs"), r.getAs[String]("rhs"))
        val folded = BpeTokenizer.foldMerges(syms, Seq((a, b)))
        words = words.select(col("freq"), folded.as("syms")).localCheckpoint(true)
        merges += WpMerge(merges.length + 1, a, b,
          r.getAs[Long]("pc"), r.getAs[Double]("score"))
      }
    }
    merges.toSeq
  }

  /** Piece vocabulary induced by a WordPiece merge table: every merged
    * piece, the 26 base characters, and the terminal marker — feeds
    * [[BpeTokenizer.pieceEncode]] (greedy longest match = canonical
    * WordPiece inference).
    */
  def vocabFromMerges(merges: Seq[WpMerge]): Seq[String] =
    (merges.map(m => m.lhs + m.rhs) ++ ('a' to 'z').map(_.toString) :+ "</w>").distinct

  /** Train-then-encode convenience: greedy longest-match tokens per row
    * over the trained vocabulary. Output: keyCol, tokens, n_tokens.
    */
  def wordPieceEncode(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      merges: Seq[WpMerge],
      maxWordLen: Int = 32): DataFrame =
    BpeTokenizer.pieceEncode(df, textCol, keyCol, vocabFromMerges(merges), maxWordLen)
}
