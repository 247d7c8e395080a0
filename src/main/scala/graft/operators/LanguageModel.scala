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
  * the same class of driver action as the IVF centroid seed.) The
  * "alphabet-bounded" claim is Latin-centric — a genuinely multilingual
  * corpus can reach 1e7+ distinct char trigrams — so every scorer is
  * size-guarded: past [[MaxBroadcastModelRows]] it switches to a
  * broadcast-join plan with identical (spec-pinned) scores and no
  * driver-side model.
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

  /** Model row count above which scoring falls back from the collected
    * driver map to a broadcast-join plan. The in-expression map is the
    * fast path — one projection, zero scoring shuffles — but it holds the
    * WHOLE model on the driver and in every executor's deserialized task:
    * ~50 B/entry means 2e6 rows ≈ 100 MB of JVM map, the point where the
    * "alphabet-bounded" assumption (Latin-centric: a genuinely
    * multilingual corpus reaches 1e7+ distinct char trigrams) stops
    * holding and driver memory becomes the limiting factor. Above it the
    * model stays a DataFrame and scoring joins exploded grams against it
    * — per-gram rows exist, but only inside one join+aggregate stage, and
    * the integer-quantized arithmetic is identical (spec-pinned).
    */
  val MaxBroadcastModelRows: Long = 2000000L

  /** Map-side scoring shared by [[perplexityScore]], [[selfScore]] and the
    * KN scorers: the model (alphabet-bounded, see the object scaladoc) is
    * collected once and broadcast INSIDE a
    * [[graft.functions.TrigramScore]] / `TrigramScoreBackoff` expression,
    * so scoring is a pure projection — no per-gram rows, no join, no
    * scoring shuffle at any corpus size. The quantized integer sums are
    * the same arithmetic the old explode→join→re-aggregate pipeline
    * produced (order-free by construction), asserted equal in
    * OperatorsSpec.
    *
    * SIZE-GUARDED: the guard and the model fetch are ONE job — a
    * collect-limit of `maxBroadcastRows + 1` rows over the (lazily
    * checkpointed) model. Under the limit, the collected rows ARE the
    * model (no separate count pass); at the limit, the scorer switches to
    * [[scoreWithModelJoin]] — same scores (integer sums commute), no
    * driver-side model — and the join path reuses the already-materialized
    * checkpoint instead of recomputing the model build. The BACKOFF frame
    * (KN scoring) is probed with the same cap: either side exceeding it
    * routes the whole score through the join path.
    */
  private def scoreWithModel(df: DataFrame, idCol: String, textCol: String,
      model0: DataFrame, oovNlpQ: Long,
      backoff: Option[DataFrame] = None,
      maxBroadcastRows: Long = MaxBroadcastModelRows): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    val model = model0.localCheckpoint(eager = false)
    val probeN = maxBroadcastRows + 1
    val probed =
      if (probeN > Int.MaxValue) null
      else model.select(col("gram"), col("nlp_q")).limit(probeN.toInt).collect()
    if (probed == null || probed.length >= probeN)
      return scoreWithModelJoin(df, idCol, textCol, model, backoff, oovNlpQ)
    val entries = probed.map(r => r.getString(0) -> r.getLong(1)).toMap
    val sc = df.sparkSession.sparkContext
    val bc = sc.broadcast(entries)
    val scoreExpr = backoff match {
      case None =>
        graft.functions.TrigramScore(expressionOf(col(textCol)), bc, oovNlpQ)
      case Some(bt) =>
        // the BACKOFF is size-guarded with the same cap as the main model:
        // today it is the lower-order grams of the same model (strictly
        // smaller), but the guard contract must hold without that
        // assumption — an oversized backoff falls back to the join path
        // exactly like an oversized model (probe and fetch are one job,
        // the checkpoint is reused by the join on fallback)
        val bck = bt.localCheckpoint(eager = false)
        val rows = bck.select(col("kind"), col("key"), col("nlp_q"))
          .limit(probeN.toInt).collect()
        if (rows.length >= probeN)
          return scoreWithModelJoin(df, idCol, textCol, model, Some(bck), oovNlpQ)
        val byKind = rows.groupBy(_.getString(0))
        def m(kind: String) =
          byKind.getOrElse(kind, Array.empty[org.apache.spark.sql.Row])
            .map(r => r.getString(1) -> r.getLong(2)).toMap
        val maps = graft.functions.KnBackoffMaps(
          m("ctx"), m("cbg"), m("blam"), m("uni"))
        graft.functions.TrigramScoreBackoff(
          expressionOf(col(textCol)), bc, sc.broadcast(maps), oovNlpQ)
    }
    df
      .select(col(idCol), columnOf(scoreExpr).as("_ts"))
      .select(col(idCol),
        coalesce(col("_ts.n_grams"), lit(0L)).as("n_grams"),
        when(coalesce(col("_ts.n_grams"), lit(0L)) > 0,
          round(col("_ts.nlp_sum").cast("double")
            / (col("_ts.n_grams") * lit(1e6)), 6))
          .otherwise(lit(0.0)).as("avg_nll"))
  }

  /** The size-guard fallback: scoring as explode → broadcast-join against
    * the model DataFrame → per-doc integer re-aggregate. The model never
    * touches the driver; the backoff chain (when present) is the same
    * priority ladder as `TrigramScoreBackoff`, restated with left joins on
    * the (still alphabet-bounded, hence broadcast) per-level tables.
    * Identical scores to the map path — every factor is quantized to an
    * integer model-side, and integer sums commute.
    */
  private def scoreWithModelJoin(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, backoff: Option[DataFrame],
      oovNlpQ: Long): DataFrame = {
    val base = df.select(col(idCol), charTrigrams(col(textCol)).as("_gs"))
      .localCheckpoint(eager = false)
    val per = base.select(col(idCol), explode(col("_gs")).as("gram"))
      .join(model.select(col("gram"), col("nlp_q").as("_t")), Seq("gram"), "left")
    val withNlp = backoff match {
      case None => per.withColumn("_nlp", coalesce(col("_t"), lit(oovNlpQ)))
      case Some(bt) =>
        def tbl(kind: String, keyName: String, valName: String) =
          broadcast(bt.filter(col("kind") === kind)
            .select(col("key").as(keyName), col("nlp_q").as(valName)))
        val chained = per
          .withColumn("_ab", substring(col("gram"), 1, 2))
          .withColumn("_bc", substring(col("gram"), 2, 2))
          .withColumn("_b", substring(col("gram"), 2, 1))
          .withColumn("_c", substring(col("gram"), 3, 1))
          .join(tbl("ctx", "_ab", "_l2"), Seq("_ab"), "left")
          .join(tbl("cbg", "_bc", "_pcbg"), Seq("_bc"), "left")
          .join(tbl("blam", "_b", "_l1"), Seq("_b"), "left")
          .join(tbl("uni", "_c", "_p1"), Seq("_c"), "left")
        val chain = coalesce(col("_pcbg"),
          when(col("_l1").isNotNull && col("_p1").isNotNull,
            col("_l1") + col("_p1")),
          col("_p1"))
        chained.withColumn("_nlp", coalesce(col("_t"),
          when(chain.isNull, lit(oovNlpQ))
            .otherwise(when(col("_l2").isNotNull, col("_l2") + chain)
              .otherwise(chain))))
    }
    val sums = withNlp.groupBy(col(idCol))
      .agg(count(lit(1)).as("_n"), sum(col("_nlp")).as("_sum"))
    base.select(col(idCol)).join(sums, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_n"), lit(0L)).as("n_grams"),
        when(coalesce(col("_n"), lit(0L)) > 0,
          round(col("_sum").cast("double") / (col("_n") * lit(1e6)), 6))
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
      model: DataFrame, oovNlpQ: Long = 20723266L,
      maxBroadcastRows: Long = MaxBroadcastModelRows): DataFrame =
    scoreWithModel(df, idCol, textCol, model, oovNlpQ,
      maxBroadcastRows = maxBroadcastRows)

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
    * [[selfScoreKN]] scoring is unchanged map-side arithmetic. UNSEEN
    * trigrams at scoring time take the full backoff chain when the
    * [[knBackoffTables]] ride along ([[perplexityScoreKN]]); without them
    * they cost the flat `oovNlpQ`.
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

  /** The per-level Kneser-Ney backoff tables as one `(kind, key, nlp_q)`
    * frame, each value independently quantized (`round(-ln(x) * 1e6)`) so
    * chained scores are integer sums (see
    * [[graft.functions.TrigramScoreBackoff]] for the chain):
    *
    *  - `ctx`  (key = 2-char prefix):   lambda2 = D * N1+(ab.) / c(ab.)
    *  - `cbg`  (key = 2-char suffix):   Pc(c|b), the continuation bigram
    *  - `blam` (key = middle char):     lambda1 = D * N1+(b.) / N1+(.b.)
    *  - `uni`  (key = last char):       Pc(c) = N1+(.c) / N1+(..)
    *
    * All four are aggregates over the distinct-trigram-TYPE table —
    * |A|^2 + |A|^2 + |A| + |A| rows, strictly smaller than the trigram
    * model they complete.
    */
  def knBackoffTables(corpus: DataFrame, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val grams = corpus.select(explode(charTrigrams(col(textCol))).as("gram"))
    val c3 = grams.groupBy(col("gram")).agg(count(lit(1)).as("c3"))
      .select(col("gram"), col("c3"),
        substring(col("gram"), 1, 2).as("p2"),
        substring(col("gram"), 2, 2).as("s2"))
      .localCheckpoint(eager = false)
    val d = lit(discount)
    def q(p: Column): Column = (-round(log(p) * 1e6)).cast("long")
    val ctx = c3.groupBy(col("p2"))
      .agg(sum(col("c3")).as("c2"), count(lit(1)).as("n_after"))
      .select(lit("ctx").as("kind"), col("p2").as("key"),
        q(d * col("n_after") / col("c2")).as("nlp_q"))
    val sfx = c3.groupBy(col("s2")).agg(count(lit(1)).as("n_left"))
      .localCheckpoint(eager = false)
    val mid = sfx.groupBy(substring(col("s2"), 1, 1).as("b"))
      .agg(sum(col("n_left")).as("cbdot"), count(lit(1)).as("n_s2_b"))
    val endc = sfx.groupBy(substring(col("s2"), 2, 1).as("c"))
      .agg(count(lit(1)).as("n_end"))
    val tot = sfx.agg(count(lit(1)).as("n_tot"))
    val pcont1 = col("n_end").cast("double") / col("n_tot")
    val cbg = sfx
      .select(col("s2"), col("n_left"),
        substring(col("s2"), 1, 1).as("b"), substring(col("s2"), 2, 1).as("c"))
      .join(broadcast(mid), Seq("b"))
      .join(broadcast(endc), Seq("c"))
      .crossJoin(broadcast(tot))
      .select(lit("cbg").as("kind"), col("s2").as("key"),
        q(greatest(col("n_left") - d, lit(0.0)) / col("cbdot") +
          d * col("n_s2_b") / col("cbdot") * pcont1).as("nlp_q"))
    val blam = mid.select(lit("blam").as("kind"), col("b").as("key"),
      q(d * col("n_s2_b") / col("cbdot")).as("nlp_q"))
    val uni = endc.crossJoin(broadcast(tot))
      .select(lit("uni").as("kind"), col("c").as("key"), q(pcont1).as("nlp_q"))
    ctx.unionAll(cbg).unionAll(blam).unionAll(uni)
  }

  /** Score documents against a [[knTrigramModel]] WITH the backoff chain
    * for unseen grams: a gram absent from the model costs the interpolated
    * continuation estimate ([[graft.functions.TrigramScoreBackoff]]'s
    * priority ladder) instead of the flat `oovNlpQ`, which only remains as
    * the floor for grams whose every backoff level is unseen. Same output
    * contract and the same size guard as [[perplexityScore]].
    */
  def perplexityScoreKN(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, backoff: DataFrame, oovNlpQ: Long = 20723266L,
      maxBroadcastRows: Long = MaxBroadcastModelRows): DataFrame =
    scoreWithModel(df, idCol, textCol, model, oovNlpQ, Some(backoff),
      maxBroadcastRows)

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
