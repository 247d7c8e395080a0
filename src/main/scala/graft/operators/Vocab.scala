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
}
