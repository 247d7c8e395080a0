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

  /** Interpolated Kneser-Ney trigram model (Kneser & Ney 1995, in the
    * interpolated form Chen & Goodman 1999 found best — the smoothing KenLM
    * itself uses, which makes this the faithful CCNet-filter estimator
    * where [[charTrigramModel]] is the plain MLE): each seen trigram's
    * probability is its discounted MLE plus the context's freed mass times
    * the CONTINUATION bigram probability — "how many contexts does this
    * continuation complete" rather than "how often did it occur", the
    * correction that stops high-count-but-one-context grams from being
    * overestimated.
    *
    *   P(c|ab) = max(c(abc)-D,0)/c(ab·) + D·N1+(ab·)/c(ab·) · Pc(c|b)
    *   Pc(c|b) = max(N1+(·bc)-D,0)/N1+(·b·) + D·N1+(b·)/N1+(·b·) · Pc(c)
    *   Pc(c)   = N1+(·c) / N1+(··)      (over distinct suffix-bigram types)
    *
    * Every N1+ table is an aggregate over the distinct-trigram-TYPE table,
    * so the whole build stays alphabet-bounded like the MLE model: one
    * corpus count aggregate, then type-level (broadcast-sized) joins.
    * Same quantized `nlp_q` output contract, so [[perplexityScore]] /
    * [[selfScoreKN]] scoring is unchanged map-side arithmetic. Unseen
    * trigrams still cost the flat `oovNlpQ` at scoring time — the full
    * three-level backoff lookup for unseen grams would need a multi-level
    * broadcast map; the interpolated values above already carry the
    * continuation mass for every SEEN gram, which is where the estimator
    * differs from MLE.
    */
  def knTrigramModel(corpus: DataFrame, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val grams = corpus.select(explode(charTrigrams(col(textCol))).as("gram"))
    val c3 = grams.groupBy(col("gram")).agg(count(lit(1)).as("c3"))
      .select(col("gram"), col("c3"),
        substring(col("gram"), 1, 2).as("p2"),
        substring(col("gram"), 2, 2).as("s2"),
        substring(col("gram"), 2, 1).as("b"),
        substring(col("gram"), 3, 1).as("c"))
    val ctx = c3.groupBy(col("p2"))
      .agg(sum(col("c3")).as("c2"), count(lit(1)).as("n_after"))
    val sfx = c3.groupBy(col("s2")).agg(count(lit(1)).as("n_left"))
    val mid = sfx.groupBy(substring(col("s2"), 1, 1).as("b"))
      .agg(sum(col("n_left")).as("cbdot"), count(lit(1)).as("n_s2_b"))
    val endc = sfx.groupBy(substring(col("s2"), 2, 1).as("c"))
      .agg(count(lit(1)).as("n_end"))
    val tot = sfx.agg(count(lit(1)).as("n_tot"))
    val d = lit(discount)
    val pcont1 = col("n_end").cast("double") / col("n_tot")
    val pcont2 = greatest(col("n_left") - d, lit(0.0)) / col("cbdot") +
      d * col("n_s2_b") / col("cbdot") * pcont1
    val pkn = greatest(col("c3") - d, lit(0.0)) / col("c2") +
      d * col("n_after") / col("c2") * pcont2
    c3.join(ctx, Seq("p2"))
      .join(broadcast(sfx), Seq("s2"))
      .join(broadcast(mid), Seq("b"))
      .join(broadcast(endc), Seq("c"))
      .crossJoin(broadcast(tot))
      .select(col("gram"), col("c3"), pkn.as("p_kn"),
        (-round(log(pkn) * 1e6)).cast("long").as("nlp_q"))
  }

  /** [[selfScore]] with the Kneser-Ney estimator: score a corpus against
    * its own interpolated-KN trigram model. No OOV parameter — every gram
    * of the corpus is in its own model by construction.
    */
  def selfScoreKN(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    scoreWithModel(df, idCol, textCol,
      knTrigramModel(df, textCol, discount), oovNlpQ = 0L)

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
