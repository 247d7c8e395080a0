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
  * so scoring BROADCASTS the collected model inside a single map-side
  * expression ([[graft.functions.TrigramScore]]): one projection over the
  * corpus, zero scoring-side shuffles, no per-gram rows anywhere outside
  * the model build's partial aggregation. (The bounded model collect is
  * the same class of driver action as the IVF centroid seed.)
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
    * text has fewer than 3 characters. One tight loop per row
    * ([[graft.functions.CharTrigrams]]) instead of an interpreted lambda
    * per character position — measured 2x on the sf1 model build.
    */
  def charTrigrams(text: Column): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    columnOf(graft.functions.CharTrigrams(expressionOf(text)))
  }

  /** The original higher-order-function formulation of [[charTrigrams]],
    * kept (test-scoped) as the parity reference for the expression —
    * OperatorsSpec asserts both produce identical arrays on unicode,
    * whitespace and sub-3-char edge cases.
    */
  private[graft] def charTrigramsHof(text: Column): Column = {
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

  /** Map-side scoring shared by [[perplexityScore]] and [[selfScore]]: the
    * model (alphabet-bounded, see the object scaladoc) is collected once
    * and broadcast INSIDE a [[graft.functions.TrigramScore]] expression, so
    * scoring is a pure projection — no per-gram rows, no join, no scoring
    * shuffle at any corpus size. The quantized integer sums are the same
    * arithmetic the old explode→join→re-aggregate pipeline produced
    * (order-free by construction), asserted equal in OperatorsSpec.
    */
  private def scoreWithModel(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, oovNlpQ: Long): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    val entries = model.select(col("gram"), col("nlp_q")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = df.sparkSession.sparkContext.broadcast(entries)
    df
      .select(col(idCol),
        columnOf(graft.functions.TrigramScore(
          expressionOf(col(textCol)), bc, oovNlpQ)).as("_ts"))
      .select(col(idCol),
        coalesce(col("_ts.n_grams"), lit(0L)).as("n_grams"),
        when(coalesce(col("_ts.n_grams"), lit(0L)) > 0,
          round(col("_ts.nlp_sum").cast("double")
            / (col("_ts.n_grams") * lit(1e6)), 6))
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
    scoreWithModel(df, idCol, textCol, model, oovNlpQ)

  /** Score a corpus against a model trained on ITSELF (the common
    * filter-bootstrap shape): identical results to charTrigramModel +
    * perplexityScore. The corpus is read twice (model counts, then the
    * map-side scoring projection) but per-gram ROWS exist only inside the
    * model build's partial aggregation — nothing gram-sized is ever
    * materialized or joined. No OOV parameter: every gram of the corpus is
    * in its own model by construction.
    */
  def selfScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreWithModel(df, idCol, textCol,
      charTrigramModel(df, textCol), oovNlpQ = 0L)
}
