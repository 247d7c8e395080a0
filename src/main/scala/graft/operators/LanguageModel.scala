package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language-model scoring for quality filtering — the
  * same shape as CCNet's KenLM perplexity filter (Wenzek et al. 2020), with
  * a deterministic, engine-portable formulation: the model is conditional
  * trigram probabilities P(c3 | c1c2) = count(g) / count(prefix2(g)), and a
  * document's score is the average negative log-probability of its trigrams
  * (low = looks like the training corpus, high = gibberish relative to it).
  *
  * Scale shape: the model build is one count aggregate over exploded
  * trigrams; the model itself is bounded by the ALPHABET cubed, not the
  * corpus — for real text a few hundred thousand rows at any corpus size —
  * so scoring is a BROADCAST join: one map pass over the corpus, no
  * corpus-side shuffle except the per-doc sum.
  *
  * Determinism: floating-point sums are order-dependent, so summing raw
  * log-probs per document would not reproduce across engines or
  * partitionings. Instead each gram's negative log-prob is quantized ONCE,
  * model-side, to an integer (round(-ln(p) * 1e6)); per-document sums are
  * then exact integer arithmetic in any order, and the single final
  * division is deterministic IEEE — which is what makes `text_perplexity`
  * DuckDB-oracle-able bit for bit.
  */
object LanguageModel {

  /** Character trigrams of lowercased, trimmed text; empty array when the
    * text has fewer than 3 characters (`sequence` DESCENDS when stop <
    * start — the guard is load-bearing).
    */
  def charTrigrams(text: Column): Column = {
    val s = lower(trim(text))
    // let-bind s: it is referenced per trigram position inside the lambda
    element_at(transform(array(s), b =>
      when(length(b) >= 3,
        transform(sequence(lit(1), length(b) - 2), i => b.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))), 1)
  }

  /** Model rows from an exploded (gram) frame — shared by
    * [[charTrigramModel]] and [[selfScore]].
    */
  private def modelFromGrams(grams: DataFrame): DataFrame = {
    val c3 = grams.groupBy(col("gram")).agg(count(lit(1)).as("c3"))
    val c2 = c3
      .groupBy(substring(col("gram"), 1, 2).as("p2"))
      .agg(sum(col("c3")).as("c2"))
    c3.join(c2, substring(col("gram"), 1, 2) === col("p2"))
      .select(col("gram"), col("c3"), col("c2"),
        (-round(log(col("c3") / col("c2")) * 1e6)).cast("long").as("nlp_q"))
  }

  /** Per-doc aggregation of scored (id, gram) rows — shared by
    * [[perplexityScore]] and [[selfScore]].
    */
  private def scoreGrams(grams: DataFrame, idCol: String, model: DataFrame,
      oovNlpQ: Long): DataFrame = {
    grams
      .join(broadcast(model.select(col("gram"), col("nlp_q"))), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(col("gram")).as("n_grams"),
        coalesce(sum(coalesce(col("nlp_q"), lit(oovNlpQ))), lit(0L)).as("_s"))
      .select(col(idCol), col("n_grams"),
        when(col("n_grams") > 0,
          round(col("_s").cast("double") / (col("n_grams") * lit(1e6)), 6))
          .otherwise(lit(0.0)).as("avg_nll"))
  }

  /** Train the trigram model: one row per distinct trigram with its corpus
    * count `c3`, its 2-char-prefix total `c2`, and the quantized negative
    * log conditional probability `nlp_q = round(-ln(c3/c2) * 1e6)`.
    */
  def charTrigramModel(corpus: DataFrame, textCol: String): DataFrame =
    modelFromGrams(corpus.select(explode(charTrigrams(col(textCol))).as("gram")))

  /** Score documents against a [[charTrigramModel]]: per doc, the trigram
    * count and the average negative log-prob `avg_nll` (0.0 for docs with no
    * trigrams). Grams absent from the model cost `oovNlpQ` (defaults to ~
    * -ln(1e-9), i.e. treat unseen grams as 1-in-a-billion). The model side
    * is broadcast — alphabet-bounded, see the object scaladoc.
    */
  def perplexityScore(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, oovNlpQ: Long = 20723266L): DataFrame =
    scoreGrams(
      df.select(col(idCol), explode_outer(charTrigrams(col(textCol))).as("gram")),
      idCol, model, oovNlpQ)

  /** Score a corpus against a model trained on ITSELF (the common
    * filter-bootstrap shape): identical results to charTrigramModel +
    * perplexityScore, but the expensive trigram explode runs ONCE — a lazy
    * checkpoint feeds both the model counts and the scoring join (Catalyst
    * would otherwise re-evaluate the HOF per consumer). No OOV parameter:
    * every gram of the corpus is in its own model by construction.
    */
  def selfScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = df
      .select(col(idCol), explode_outer(charTrigrams(col(textCol))).as("gram"))
      .localCheckpoint(eager = false) // model build + scoring join
    scoreGrams(grams, idCol,
      modelFromGrams(grams.where(col("gram").isNotNull)), oovNlpQ = 0L)
  }
}
