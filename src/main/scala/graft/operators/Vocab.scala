package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary extraction: top-k word n-grams by raw count or document
  * frequency — the first step of tokenizer/vocab training and a cheap corpus
  * drift monitor.
  *
  * Shape at scale: explode to (ngram) rows, hash-aggregate with map-side
  * partial counts (the shuffle carries one row per distinct term per
  * partition, not per occurrence), then a total order on (count desc, term)
  * over the vocab-sized aggregate — the only full sort is over distinct
  * terms, never the corpus. Ties at the k boundary are deterministic via the
  * term tiebreak.
  */
object Vocab {

  /** Unigrams are a plain codegen'd split; only n >= 2 needs the
    * higher-order shingle assembly (interpreted lambda per element).
    */
  private def ngrams(textCol: String, n: Int) =
    if (n == 1) expr(s"split(lower(trim($textCol)), '\\\\s+')")
    else Dedup.shingles(textCol, n)

  /** Top-k n-grams by occurrence count. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(ngrams(textCol, n)).as("ngram"))
      .filter(length(col("ngram")) > 0)
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)

  /** Top-k n-grams by document frequency (each document counts a term once —
    * array_distinct before the explode keeps the dedup map-side).
    */
  def topNgramsByDocFreq(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(array_distinct(ngrams(textCol, n))).as("ngram"))
      .filter(length(col("ngram")) > 0)
      .groupBy(col("ngram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram").asc)
      .limit(k)

  /** Per-document top-k terms by TF-IDF — keyword extraction / classifier
    * features over the corpus's own statistics. The score is
    * `tf * n_docs / doc_freq` (the log-free rational form of TF-IDF):
    * monotone in the classic `tf * ln(N/df)` for fixed tf, built from one
    * integer product and one IEEE division, so every engine computes the
    * identical double — `ln` differs across libm implementations in the
    * last ulp, which would make a rounded score (and hence tie-breaks at
    * the k boundary) engine-dependent.
    *
    * Shape at scale: one explode for per-doc term counts (map-side partial
    * aggregation compresses the shuffle to distinct (doc, term) rows), the
    * corpus doc-frequency aggregate over array_distinct terms (vocab-sized,
    * AQE-broadcast back onto the per-doc counts — df rows per term, not per
    * occurrence), then a per-doc top-k window whose partition is the doc id:
    * the sort is per-document over its distinct terms, never global.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val words = expr(s"filter(split(lower(trim($textCol)), '\\\\s+'), w -> w <> '')")
    // corpus size as a single-row aggregate INSIDE the plan (broadcast-joined
    // below) — not a driver-side count() action, so the operator stays one
    // lazy plan and the scan is shared under exchange reuse where possible
    val nDocs = df.agg(count(lit(1)).as("_n"))
    val tf = df.select(col(idCol), explode(words).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = df.select(explode(array_distinct(words)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(docFreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * col("_n").cast("double") / col("doc_freq").cast("double"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"),
        round(col("score"), 6).as("score"))
  }
}
