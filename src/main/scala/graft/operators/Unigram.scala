package graft.operators

import graft.functions.UnigramSegment
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer (SentencePiece's default algorithm,
  * Kudo 2018) — the second real-world subword family next to [[Vocab]]'s
  * BPE, trained distributed and hard-EM simplified:
  *
  *  1. SEED: every substring (length <= maxPieceLen) of every corpus word,
  *     weighted by word count — one explode over the DISTINCT-word table
  *     (map-side arithmetic row generation), one key aggregate, top-k; all
  *     single characters are kept unconditionally (coverage guarantee).
  *  2. E-step: Viterbi-best segmentation of each distinct word under the
  *     current piece log-probs ([[graft.functions.UnigramSegment]] — the
  *     model rides inside the expression, broadcast-without-a-join).
  *  3. M-step: piece counts from the segmentations weighted by word count
  *     (one key aggregate), renormalized to log-probs. Hard-EM: each round
  *     is monotone in the Viterbi corpus log-likelihood (spec-pinned).
  *  4. PRUNE to `vocabSize`: keep every single character plus the top
  *     multi-character pieces by probability, renormalize.
  *
  * Scale shape: everything heavy runs over the DISTINCT-word dictionary
  * (vocabulary-sized, the [[Vocab.bpeTokenCounts]] discipline), never the
  * corpus rows; per-round shuffles carry (piece, count) pairs. The model
  * itself is collected driver-side — it is the OUTPUT, bounded by
  * seedSize, same as the BPE merge table / k-means centroids.
  *
  * Determinism: counts are exact longs; log-probs are rounded to 6
  * decimals (engine-internal only — no oracle compares them, so libm `ln`
  * is acceptable here where tfidf avoided it); all top-k cuts tie-break on
  * the piece string.
  */
object Unigram {

  /** (word, cnt) over the corpus — the same word classes as the BPE
    * family, so the two tokenizers are trained on identical pre-tokens.
    */
  def words(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(expr(
        s"regexp_extract_all($textCol, '${Vocab.wordPattern}', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Seed pieces: count-weighted substrings, top `seedSize` multi-char by
    * weight (piece-string tie-break) plus ALL single characters. Returns
    * (piece, weight).
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int, seedSize: Int): DataFrame = {
    val subs = words
      .select(explode(expr(
        s"""flatten(transform(sequence(0, length(word) - 1),
           |  i -> transform(sequence(1, least($maxPieceLen, length(word) - i)),
           |       l -> substr(word, i + 1, l))))""".stripMargin)).as("piece"),
        col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("weight"))
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(desc("weight"), asc("piece")).limit(seedSize)
    subs.filter(length(col("piece")) === 1).unionAll(multi)
  }

  private def normalize(counts: Seq[(String, Long)]): Map[String, Double] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) =>
      p -> BigDecimal(math.log(c / total))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** A floor below every real piece: unknown single chars segment but never
    * beat a real piece of any length that covers them.
    */
  private def oovFloor(vocab: Map[String, Double]): Double =
    (if (vocab.isEmpty) 0.0 else vocab.values.min) - 20.0

  private def segCol(vocab: Map[String, Double], maxLen: Int): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.columnOf
    import org.apache.spark.sql.graft.GraftSqlShims.expressionOf
    columnOf(UnigramSegment(expressionOf(col("word")),
      vocab.toSeq.sortBy(_._1), maxLen, oovFloor(vocab)))
  }

  /** Train the piece model. Returns (piece, logp) ordered by descending
    * probability (piece tie-break) — the persistable model table.
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 512,
      maxPieceLen: Int = 8, seedSize: Int = 4096, emIters: Int = 2)
      : DataFrame = {
    val spark = df.sparkSession
    val w = words(df, textCol).localCheckpoint(eager = true)
    val seed = seedVocab(w, maxPieceLen, seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // character coverage (SentencePiece's guarantee): every corpus char
    // stays a piece forever, floored at count 1 — a char no Viterbi path
    // uses must not vanish, or unseen-at-train words become OOV-only later
    val charSet = seed.collect { case (p, _) if p.length == 1 => p }.toSet
    def withCoverage(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
      val have = counts.map(_._1).toSet
      counts ++ charSet.diff(have).toSeq.sorted.map(_ -> 1L)
    }
    var vocab = normalize(seed)
    for (_ <- 1 to emIters) {
      val counts = w
        .select(explode(segCol(vocab, maxPieceLen)).as("piece"), col("cnt"))
        .groupBy("piece").agg(sum("cnt").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      vocab = normalize(withCoverage(counts))
    }
    // prune: all single chars + top multi-char pieces by prob
    val (chars, multi) = vocab.toSeq.partition(_._1.length == 1)
    val kept = chars ++ multi.sortBy { case (p, lp) => (-lp, p) }
      .take(math.max(0, vocabSize - chars.size))
    // renormalize over the kept set (probs, then back to rounded logp)
    val renorm = {
      val mass = kept.map { case (_, lp) => math.exp(lp) }.sum
      kept.map { case (p, lp) =>
        p -> BigDecimal(lp - math.log(mass))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    import spark.implicits._
    renorm.sortBy { case (p, lp) => (-lp, p) }.toDF("piece", "logp")
  }

  /** Viterbi-segment the corpus's distinct words under a trained model:
    * (word, cnt, pieces). The dictionary-join input for both the check
    * gate and per-document counting.
    */
  def segmentWords(df: DataFrame, textCol: String,
      vocab: Map[String, Double], maxPieceLen: Int = 8): DataFrame =
    words(df, textCol)
      .withColumn("pieces", segCol(vocab, maxPieceLen))

  /** Per-document token counts under the trained model — dictionary join
    * (distinct words segmented once, joined back onto exploded doc words),
    * the [[Vocab.bpeTokenCounts]] shape.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Double], maxPieceLen: Int = 8): DataFrame = {
    val dict = segmentWords(df, textCol, vocab, maxPieceLen)
      .select(col("word"), size(col("pieces")).as("word_tokens"))
    df.select(col(idCol), explode(expr(
        s"regexp_extract_all($textCol, '${Vocab.wordPattern}', 0)")).as("word"))
      .join(dict, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("word_tokens")).as("n_tokens"))
  }

  /** Corpus Viterbi log-likelihood under a model (the hard-EM objective;
    * the monotonicity spec reads it per round). One segment pass + one
    * 1-row aggregate; 4-decimal rounding on the sum.
    */
  def corpusLogLik(df: DataFrame, textCol: String,
      vocab: Map[String, Double], maxPieceLen: Int = 8): Double = {
    val oov = oovFloor(vocab)
    val lpMap = typedLit(vocab)
    val r = words(df, textCol)
      .select(col("cnt"), explode(segCol(vocab, maxPieceLen)).as("piece"))
      .select((col("cnt") * coalesce(lpMap(col("piece")), lit(oov))).as("wlp"))
      .agg(round(sum(col("wlp")), 4)).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }
}
