package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShims.unpersistCheckpoint

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

  /** Per-document out-of-vocabulary rate against the corpus' own top-k word
    * vocabulary — the tokenizer-health metric an operator tracks per source
    * and per epoch: a rising OOV rate means the vocabulary (or the BPE
    * merge table trained from it) no longer fits the incoming distribution.
    * The vocab is [[topNgrams]] (deterministic count-then-term ordering);
    * the per-doc pass explodes words once and left-joins the k-row vocab —
    * Spark broadcasts the tiny side, so the corpus never reshuffles for
    * the membership test; the only corpus-sized shuffles are the per-doc
    * regroup and the id-aligned rejoin. Every input document appears in the
    * report: a document with zero non-empty tokens (which the explode+filter
    * would otherwise drop) is rejoined with n_tokens=0, n_oov=0 and a NULL
    * oov_rate (0/0 is undefined, not 0%) — a health report must distinguish
    * "empty document" from "document missing". Output:
    * (id, n_tokens, n_oov, oov_rate).
    */
  def oovReport(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val vocab = topNgrams(df, textCol, n = 1, k)
      .select(col("ngram").as("_w"), lit(1).as("_in_vocab"))
    val counted = df.select(col(idCol), explode(ngrams(textCol, 1)).as("_w"))
      .filter(length(col("_w")) > 0)
      .join(broadcast(vocab), Seq("_w"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_nt"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("_no"))
    df.select(col(idCol)).distinct()
      .join(counted, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("_nt"), lit(0L)).as("n_tokens"),
        coalesce(col("_no"), lit(0L)).as("n_oov"),
        when(col("_nt").isNotNull,
          round(col("_no").cast("double") / col("_nt"), 6)).as("oov_rate"))
  }

  /** Vocabulary coverage curve — the tokenizer-sizing question "how many
    * words cover X% of the corpus": for each requested share, the smallest
    * k such that the top-k words (count desc, word asc, the [[topNgrams]]
    * order) cover at least that share of word occurrences. Output:
    * (share, vocab_size, covered_cnt, total_cnt, coverage), one row per
    * requested share.
    *
    * Shape: the word-count aggregate compresses the corpus to vocab rows
    * with map-side partials; the cumulative sum is ONE global-order window
    * over that VOCAB-sized table — bounded by distinct words (1e7-1e8 at
    * 100 TB), never corpus rows, the same boundedness argument as
    * [[topNgrams]]' total order — and the per-share argmin is a
    * |shares|-row aggregate. Total order (count desc, word asc) has no
    * ties, so the RANGE frame equals ROWS and both engines walk the same
    * prefix.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
      shares: Seq[Double]): DataFrame = {
    require(shares.nonEmpty && shares.forall(s => s > 0.0 && s <= 1.0),
      s"shares must be in (0, 1], got $shares")
    val counts = df.select(explode(ngrams(textCol, 1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("w").asc)
    val ranked = counts
      .withColumn("_k", row_number().over(win))
      .withColumn("_cum", sum(col("cnt")).over(win))
    val total = counts.agg(sum(col("cnt")).as("_total"))
    ranked.crossJoin(broadcast(total))
      .select(explode(typedLit(shares)).as("share"), col("_k"), col("_cum"),
        col("_total"))
      .filter(col("_cum") >= col("share") * col("_total"))
      .groupBy(col("share"))
      .agg(min_by(struct(col("_k").as("vocab_size"),
        col("_cum").as("covered_cnt"), col("_total").as("total_cnt")),
        col("_k")).as("_r"))
      .select(col("share"), col("_r.vocab_size"), col("_r.covered_cnt"),
        col("_r.total_cnt"),
        round(col("_r.covered_cnt").cast("double") / col("_r.total_cnt"), 6)
          .as("coverage"))
      .orderBy(col("share"))
  }

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

  /** BPE pre-tokenization classes: maximal letter runs (CASE-PRESERVING —
    * a production tokenizer never normalizes; byte-level BPE has no
    * lowercasing, and "The" / "the" must stay distinct trainable tokens),
    * digit runs, and non-alphanumeric non-whitespace runs (the GPT-2-style
    * class split — "v2.0" pre-tokenizes as `v` / `2` / `.` / `0`, never
    * merging across a class boundary). Whitespace is spelled as an
    * explicit character set (space, tab, newline, carriage return) rather
    * than `\\s` because Java and RE2 disagree on `\\s`'s exact membership
    * and the DuckDB oracle must tokenize bit-identically. Symbols
    * therefore never contain a space — the invariant the sentinel-replace
    * merge trick and the cross-engine oracle both rely on. A merged symbol
    * can also never collide with the `</w>` marker: forming the three
    * characters `<`,`/`,`w` adjacently would need a letter (either case)
    * inside a punctuation run, which the class split forbids.
    */
  private[graft] val wordPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]+"

  /** Pre-tokenize to the distinct-word table with per-class runs split to
    * single-character symbols plus a separate end-of-word marker (the
    * `</w>` variant of Sennrich et al. 2016 §3.2 — the marker is its own
    * symbol rather than glued to the last character, so word-final and
    * word-internal merges stay distinguishable and every initial symbol is
    * one character).
    */
  private def wordSymbols(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(expr(
        s"regexp_extract_all($textCol, '$wordPattern', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      // split on the zero-width '(?!^)' also matches at end-of-string, so
      // Spark (limit -1) keeps a trailing '' element — filter it, or the
      // ('', '</w>') pair occurs once per word and wins merge rank 1
      .select(expr(
          "concat(filter(split(word, '(?!^)'), s -> s <> ''), array('</w>'))")
        .as("syms"), col("cnt"))

  /** Greedy left-to-right non-overlapping merge of adjacent pair (a, b) into
    * the single symbol a+b — one BPE merge applied to a symbol array, as a
    * single codegen-friendly `aggregate` fold (O(L) comparisons per word; the
    * array-copy cost is O(L^2) but words are tens of characters, and each
    * merge only shrinks them). The left fold IS the greedy scan: the
    * accumulator's last element equals `a` exactly when the scan would merge
    * here, and a just-merged a+b can never re-match `a` (b is non-empty, so
    * a+b is strictly longer than a).
    */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(slice(syms, lit(2), size(syms) - 1), slice(syms, lit(1), lit(1)),
      (acc, x) => when(x === lit(b) && element_at(acc, -1) === lit(a),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Apply a FIXED merge table in one codegen'd pass. The symbol array is
    * joined into a sentinel-spaced string (`[a,b,</w>]` -> `" a  b  </w> "`),
    * each merge becomes ONE built-in `replace` (StringReplace — whole-stage
    * codegen), and the result splits back to tokens. Equivalent to folding
    * [[mergePair]] once per merge: symbols never contain spaces (the
    * [[wordPattern]] classes all exclude it, plus `</w>`), so `' l  r '`
    * only matches the two
    * whole symbols adjacent, and `replace` scans left-to-right resuming
    * AFTER each replacement — the same greedy non-overlapping semantics as
    * the fold (and as the DuckDB oracle, which uses this identical string
    * form; see the equivalence note on PipelineQueries.bpeCtes).
    *
    * Exists because a `merges.length`-deep nest of `aggregate` lambdas runs
    * interpreted (higher-order functions are CodegenFallback) and copies
    * the accumulator array per element: the 8-fold nest measured 57 s on
    * text_bpe_docs at sf0.1; this form is a flat chain of 8 string
    * replaces.
    */
  private[graft] def applyMerges(syms: Column,
      merges: Seq[(String, String)]): Column = {
    val s0 = concat(lit(" "), array_join(syms, "  "), lit(" "))
    val sN = merges.foldLeft(s0) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    filter(split(sN, " "), t => t =!= "")
  }

  /** Distributed BPE merge training (Sennrich et al. 2016): iterate (count
    * adjacent symbol pairs weighted by word frequency, take the global
    * argmax, merge it everywhere) `numMerges` times. Returns the ordered
    * merge table `(merge_rank, lhs, rhs, pair_cnt)` — the trained tokenizer.
    * Ties at the argmax break deterministically on (count desc, lhs, rhs).
    *
    * Shape at scale: the corpus is scanned ONCE (pre-tokenization with
    * map-side partial word counts); every iteration then runs over the
    * distinct-WORD table — vocab-sized (~1e7-1e8 rows at 100 TB), never
    * corpus-sized. The per-iteration strategy is ADAPTIVE on the measured
    * vocab size (one count after the pre-tokenization scan):
    *
    *  - below [[DeltaVocabCutoff]] distinct words, the full recount
    *    ([[bpeTrainRecount]]): re-explode every word's pairs and
    *    re-aggregate — two Spark jobs per iteration, and at a small vocab
    *    the explode is trivial, so fixed job overhead dominates and
    *    anything fancier LOSES (measured in PLANS.md: the delta form is
    *    ~2.4x slower on the ~50-word sf0.01 corpus);
    *  - at or above the cutoff, delta pair-count maintenance
    *    ([[bpeTrainDelta]]), the classic BPE trainer optimization: after
    *    choosing merge (a, b), only words whose symbol array CONTAINS the
    *    pair re-count (pre-merge pairs subtract, post-merge pairs add,
    *    folded into the running counts), and the argmax reads the
    *    maintained table instead of re-exploding the whole vocab — the
    *    regime every real tokenizer-training corpus is in (measured ~3x
    *    at a 200k-word vocab, PLANS.md).
    *
    * Both loops are merge-for-merge IDENTICAL (property-spec-pinned over
    * seeded corpora): the maintained table holds exactly the recount's
    * values, so the deterministic (count desc, lhs, rhs) argmax picks the
    * same pair, and the adaptive switch can never change a result.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val words = wordSymbols(df, textCol).localCheckpoint()
    if (words.count() < DeltaVocabCutoff) recountLoop(words, numMerges)
    else deltaLoop(words, numMerges)
  }

  /** WORDPIECE-scored merge training (Schuster & Nakajima 2012; the BERT
    * tokenizer family): identical loop shape to [[bpeTrain]]'s recount
    * path, but each rank merges the pair maximizing LIKELIHOOD GAIN
    * `count(l,r) / (count(l) * count(r))` over the current symbol state —
    * the pointwise-association score that prefers pairs occurring together
    * disproportionately often, where BPE's raw-frequency argmax just
    * follows bulk counts. Ties break (raw count desc, l, r) so the pick is
    * total-ordered. Output schema matches [[bpeTrain]]:
    * (merge_rank, lhs, rhs, pair_cnt).
    *
    * Scale shape: everything runs over the distinct-WORD dictionary, never
    * the corpus (one [[wordSymbols]] aggregate up front), and each rank
    * adds ONE dictionary-sized symbol-unigram aggregate next to the pair
    * count BPE already pays. The score division is IEEE double in exactly
    * the form the DuckDB oracle states (CAST(c) / (CAST(ul) * CAST(ur))),
    * so cross-engine argmax agrees bitwise. Encoding reuses the BPE
    * replay/encode machinery unchanged — a merge table is a merge table.
    */
  def wordpieceTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    var words = wordSymbols(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to numMerges if !exhausted) {
      val uni = words.select(explode(col("syms")).as("sym"), col("cnt"))
        .groupBy("sym").agg(sum("cnt").as("u"))
      val top = pairsOf(words)
        .join(uni.select(col("sym").as("l"), col("u").as("ul")), Seq("l"))
        .join(uni.select(col("sym").as("r"), col("u").as("ur")), Seq("r"))
        .withColumn("score",
          col("c").cast("double") / (col("ul").cast("double") * col("ur").cast("double")))
        .orderBy(col("score").desc, col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        val r0 = top(0)
        val (a, b, c) = (r0.getAs[String]("l"), r0.getAs[String]("r"), r0.getAs[Long]("c"))
        merges += ((rank, a, b, c))
        val prev = words
        words = words.withColumn("syms", mergePair(col("syms"), a, b))
          .localCheckpoint()
        unpersistCheckpoint(prev)
      }
    }
    unpersistCheckpoint(words)
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "lhs", "rhs", "pair_cnt")
  }

  /** The inference vocabulary a trained WordPiece merge table induces:
    * each merge's composed symbol with the `</w>` end marker stripped
    * (BERT vocabs carry continuation marks, not end marks — the marking
    * is applied at segmentation time) plus the dictionary's single-character
    * alphabet — the standard coverage guarantee that keeps in-corpus words
    * segmentable, so `[UNK]` fires only on characters never seen at train
    * time. Deterministic: distinct + sorted.
    */
  private[graft] def wordpieceVocab(merges: Seq[(String, String)],
      alphabet: Seq[String]): Seq[String] =
    (merges.map { case (l, r) => (l + r).replace("</w>", "") }
      .filter(_.nonEmpty) ++ alphabet).distinct.sorted

  /** The single-character alphabet of a corpus' word dictionary —
    * model-sized collect (dozens of rows, never data-sized). This is the
    * TRAINING-time coverage alphabet when run over the training corpus;
    * a drift monitor over a SERVING corpus must pass the training-time
    * result in explicitly (see `trainAlphabet` below), or `[UNK]` becomes
    * unreachable for in-corpus characters.
    */
  private def corpusAlphabet(words: DataFrame): Seq[String] =
    words.select(explode(expr(
        "filter(split(word, '(?!^)'), s -> s <> '')")).as("ch"))
      .distinct().collect().map(_.getString(0)).toSeq

  /** Corpus piece frequencies under greedy longest-match WordPiece
    * INFERENCE ([[graft.functions.WordPieceMatch]]) with the vocab induced
    * by a trained merge table — the deployed-tokenizer view of the corpus,
    * vs [[bpeEncode]]'s merge-replay view (the two agree on what training
    * saw but diverge on novel words, which is exactly what this query
    * monitors). Output: (piece, piece_cnt), `##`-marked continuations.
    *
    * `trainAlphabet` is the single-character coverage alphabet FIXED AT
    * TRAIN TIME (the deployed vocab's alphabet): characters outside it
    * segment to `unk`, surfacing novel characters instead of silently
    * admitting them. The default (None) derives the alphabet from the
    * corpus being ENCODED — correct only when encode corpus == train
    * corpus (the self-oracled gates here), where the two definitions
    * coincide and `[UNK]` is unreachable BY CONSTRUCTION; a deployed
    * drift monitor must pass the training-time alphabet.
    *
    * Shape at scale: ONE word-dictionary aggregate compresses the corpus;
    * the alphabet collect is alphabet-sized (dozens of rows — model-sized,
    * not data-sized); segmentation runs once per DISTINCT word with the
    * vocab riding inside the expression; the final regroup is piece-vocab
    * sized. The corpus itself is touched exactly once.
    */
  def wordpieceMatchEncode(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], unk: String = "[UNK]",
      trainAlphabet: Option[Seq[String]] = None): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    val words = df.select(explode(expr(
        s"regexp_extract_all($textCol, '$wordPattern', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val alphabet = trainAlphabet.getOrElse(corpusAlphabet(words))
    val vocab = wordpieceVocab(merges, alphabet)
    words
      .select(explode(columnOf(graft.functions.WordPieceMatch(
        expressionOf(col("word")), vocab, unk))).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("piece_cnt"))
  }

  /** The deployed-tokenizer drift monitor: corpus-weighted fertility of
    * merge-REPLAY encoding vs longest-match INFERENCE under the same
    * trained merges, in one dictionary pass. The two agree on words whose
    * greedy segmentation retraces the merge history and diverge on novel
    * compositions — a rising divergence share means the serving tokenizer
    * (longest-match, what BERT runtime does) no longer reflects what
    * training measured. Replay counts exclude a standalone `</w>` token
    * (the marker carries no emission), aligning the two definitions.
    * Output: ONE summary row (n_words, n_occurrences, replay_tokens,
    * match_tokens, diverging_words, diverging_occurrences).
    *
    * `trainAlphabet` — the training-time coverage alphabet, same contract
    * as [[wordpieceMatchEncode]]: pass it when monitoring a corpus other
    * than the one the merges were trained on, so novel characters surface
    * as `unk` instead of being silently admitted into the vocab.
    *
    * Shape at scale: the same single word-dictionary aggregate as
    * [[wordpieceMatchEncode]]; both fertilities are row-local projections
    * over it; the summary is a 1-row global aggregate.
    */
  def wordpieceFertilityCompare(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], unk: String = "[UNK]",
      trainAlphabet: Option[Seq[String]] = None): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    val words = df.select(explode(expr(
        s"regexp_extract_all($textCol, '$wordPattern', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val alphabet = trainAlphabet.getOrElse(corpusAlphabet(words))
    val vocab = wordpieceVocab(merges, alphabet)
    val syms = expr(
      "concat(filter(split(word, '(?!^)'), s -> s <> ''), array('</w>'))")
    val fert = words
      .withColumn("replay_n", size(filter(applyMerges(syms, merges),
        t => t =!= lit("</w>"))).cast("bigint"))
      .withColumn("match_n", size(columnOf(graft.functions.WordPieceMatch(
        expressionOf(col("word")), vocab, unk))).cast("bigint"))
    fert.agg(
      count(lit(1)).as("n_words"),
      sum(col("cnt")).as("n_occurrences"),
      sum(col("cnt") * col("replay_n")).as("replay_tokens"),
      sum(col("cnt") * col("match_n")).as("match_tokens"),
      sum(when(col("replay_n") =!= col("match_n"), 1L).otherwise(0L))
        .as("diverging_words"),
      sum(when(col("replay_n") =!= col("match_n"), col("cnt")).otherwise(0L))
        .as("diverging_occurrences"))
  }

  /** The tokenizer-SIZING curve: corpus token mass and distinct-piece
    * count under the first k trained merges, one row per requested k —
    * the "how much fertility does each merge buy" question asked before
    * committing to a vocab size (the merge-table twin of
    * [[vocabCoverage]]'s word-level curve). Each k is one dictionary-sized
    * replay (the corpus is never re-read: one [[wordSymbols]] aggregate is
    * shared via checkpoint) plus a piece-vocab-sized regroup. Output:
    * (n_merges, corpus_tokens, vocab_pieces), `</w>` markers excluded as
    * in [[wordpieceFertilityCompare]].
    */
  def wordpieceFertilityCurve(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 0 && k <= merges.length),
      s"ks must be within [0, ${merges.length}], got $ks")
    val words = wordSymbols(df, textCol).localCheckpoint()
    val curve = ks.map { k =>
      words
        .select(explode(filter(applyMerges(col("syms"), merges.take(k)),
          t => t =!= lit("</w>"))).as("token"), col("cnt"))
        .groupBy("token").agg(sum("cnt").as("c"))
        .agg(count(lit(1)).as("vocab_pieces"), sum(col("c")).as("corpus_tokens"))
        .select(lit(k).as("n_merges"), col("corpus_tokens"), col("vocab_pieces"))
    }.reduce(_ unionAll _).orderBy(col("n_merges")).localCheckpoint()
    unpersistCheckpoint(words)
    curve
  }

  /** Vocab size above which [[bpeTrain]] switches from full recount to
    * delta pair-count maintenance. The crossover is where the per-iteration
    * pair explode of the WHOLE word table stops being trivial relative to
    * the fixed cost of the delta loop's one extra Spark job — order 1e5 by
    * the PLANS.md measurements (recount wins clearly at 5e1, delta at 2e5).
    */
  private[graft] val DeltaVocabCutoff = 100000L

  private def pairExpr = expr(
    """zip_with(slice(syms, 1, size(syms)-1), slice(syms, 2, size(syms)-1),
      |         (a, b) -> named_struct('l', a, 'r', b))""".stripMargin)

  private def pairsOf(ws: DataFrame): DataFrame = ws
    .select(explode(pairExpr).as("p"), col("cnt"))
    .groupBy(col("p.l").as("l"), col("p.r").as("r"))
    .agg(sum("cnt").as("c"))

  /** Adjacent-pair containment test, built with Column literals rather than
    * SQL text: symbols from the punctuation class may contain quotes or
    * regex metacharacters.
    */
  private def hasPair(a: String, b: String): Column = exists(
    zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
      slice(col("syms"), lit(2), size(col("syms")) - 1),
      (x, y) => x === lit(a) && y === lit(b)),
    p => p)

  /** Delta-maintenance training loop over a prepared (syms, cnt) word table
    * — see [[bpeTrain]] for when it wins. Each iteration: a bounded 1-row
    * argmax collect on the MAINTAINED pair table, one map-only checkpointed
    * step that carries the pre-merge array, merged array and affected flag
    * together (partition and job count stay constant per iteration — a
    * filter+union split here would double the partitions every rank,
    * measured blow-up), and one pair-vocab-sized counts merge reading old
    * and new pairs from the same materialized rows.
    */
  private def deltaLoop(words0: DataFrame, numMerges: Int): DataFrame = {
    val spark = words0.sparkSession
    var words = words0
    // the CHECKPOINT frame backing `words` — unpersistCheckpoint is
    // leaf-only by contract, so releases must go through this handle:
    // `words` itself becomes a Project over the step checkpoint below, and
    // passing that would be a silent no-op (the r17 advice finding — every
    // superseded word table retained until ContextCleaner GC)
    var wordsCk = words0
    var counts = pairsOf(words).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to numMerges if !exhausted) {
      val top = counts
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, c))
        val prevWordsCk = wordsCk
        val prevCounts = counts
        val step = words
          .withColumn("_had", hasPair(a, b))
          .withColumn("_old", col("syms"))
          .withColumn("syms",
            when(col("_had"), mergePair(col("syms"), a, b)).otherwise(col("syms")))
          .localCheckpoint()
        val changed = step.filter(col("_had"))
        counts = counts
          .unionAll(pairsOf(changed))
          .unionAll(pairsOf(changed.withColumn("syms", col("_old")))
            .select(col("l"), col("r"), (-col("c")).as("c")))
          .groupBy(col("l"), col("r")).agg(sum("c").as("c"))
          .filter(col("c") > 0)
          .localCheckpoint()
        // next iteration's words: a projection OVER the materialized step,
        // not a fresh checkpoint — but the release handle is the step itself
        words = step.select(col("syms"), col("cnt"))
        wordsCk = step
        Seq(prevWordsCk, prevCounts).foreach(unpersistCheckpoint(_))
      }
    }
    unpersistCheckpoint(wordsCk)
    unpersistCheckpoint(counts)
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "lhs", "rhs", "pair_cnt")
  }

  /** Full-recount training loop over a prepared (syms, cnt) word table:
    * every iteration re-explodes every word's pairs and re-aggregates from
    * scratch — the definitionally-correct form, and the FASTER one below
    * the vocab cutoff (see [[bpeTrain]]). The word table is eagerly
    * localCheckpoint'ed each iteration — same fixpoint discipline as
    * [[Dedup.components]]: the next pair count reads materialized
    * partitions instead of replaying the whole merge lineage.
    */
  private def recountLoop(words0: DataFrame, numMerges: Int): DataFrame = {
    val spark = words0.sparkSession
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to numMerges if !exhausted) {
      val top = pairsOf(words)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, c))
        val prev = words
        words = words.withColumn("syms", mergePair(col("syms"), a, b))
          .localCheckpoint()
        unpersistCheckpoint(prev)
      }
    }
    unpersistCheckpoint(words)
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "lhs", "rhs", "pair_cnt")
  }

  /** The two loops behind [[bpeTrain]]'s adaptive switch, exposed for the
    * property spec (which pins them merge-for-merge identical on seeded
    * corpora) and for the PLANS.md crossover measurement.
    */
  private[graft] def bpeTrainDelta(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    deltaLoop(wordSymbols(df, textCol).localCheckpoint(), numMerges)
  }

  private[graft] def bpeTrainRecount(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    recountLoop(wordSymbols(df, textCol).localCheckpoint(), numMerges)
  }

  /** Apply a trained merge table to a corpus: tokenize every distinct word by
    * replaying the merges in rank order, then weight each token by total word
    * occurrences. Returns `(token, token_cnt)` — the corpus token-frequency
    * table under the trained tokenizer (vocab-size estimation, compression-
    * ratio tracking, drift monitoring between training epochs).
    *
    * Deliberately a different code path from [[bpeTrain]]'s loop: all merges
    * apply in ONE codegen'd map pass over the distinct-word table (a flat
    * [[applyMerges]] replace chain — no per-merge shuffle or checkpoint),
    * which is the right shape for applying a FIXED tokenizer: encode cost
    * is one scan regardless of merge count. Per-document tokenization at
    * scale is the same dictionary join: encode distinct words once,
    * broadcast/join back onto (doc, word) rows ([[bpeTokenCounts]]).
    */
  def bpeEncode(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    wordSymbols(df, textCol)
      .select(explode(applyMerges(col("syms"), merges)).as("token"), col("cnt"))
      .groupBy("token").agg(sum("cnt").as("token_cnt"))

  /** Per-document token counts under a trained merge table — the
    * context-budget input the packing/chunking steps consume ("how many
    * tokens is this doc under OUR tokenizer", not the whitespace proxy of
    * `TextAnalysis.tokenCount`). Output: `(idCol, n_words, n_tokens)` for
    * every document with at least one [[wordPattern]] word.
    *
    * Dictionary-join shape: the corpus's DISTINCT words are encoded once
    * (`merges.length` nested folds over the vocab-sized word table — the
    * same one-pass encode as [[bpeEncode]]), then joined back onto the
    * exploded (doc, word) rows and summed per document. The expensive fold
    * runs |vocab| times, never |corpus-words| times; the join key is the
    * word, where the dictionary side is vocab-sized — AQE broadcasts it
    * while it fits (any realistic merges table keeps word_tokens at a few
    * bytes/row), and degrades to a word-keyed shuffle join beyond that. The
    * per-doc sum partially aggregates map-side on the doc id.
    */
  /** Tokenize whole documents in one codegen'd map pass: per-document token
    * SEQUENCES in reading order — the emission shape packing/serialization
    * consumes — and, being a pure row-local projection, it runs UNCHANGED
    * on streams (tokenize-at-ingest).
    *
    * The document becomes ONE sentinel-spaced symbol string: every
    * [[wordPattern]] run gains a trailing U+0001 terminator (regex `$$0`
    * replacement — runs are maximal because the classes are disjoint),
    * whitespace drops, characters space out, and each terminator becomes
    * the run's own `</w>` symbol; the merge table then applies as the same
    * flat replace chain as [[applyMerges]]. Everything is regexp_replace /
    * replace / split — whole-stage codegen, where the equivalent
    * flatten-transform-over-runs form runs interpreted per word (measured
    * 2.2x slower on text_bpe_tokenize at sf0.1). Input U+0001 itself is
    * stripped up front (a control char has no tokenization value; keeping
    * it would collide with the terminator).
    *
    * Tokenizing the concatenation equals concatenating the per-word
    * tokenizations because no merge can act across a run boundary: a
    * trained merge never has `</w>` as its LEFT operand (pair extraction
    * ends at the word marker, so `</w>` only ever appears as a right
    * element), and any other cross-run pair is separated by the `</w>`
    * symbol between the runs — including runs adjacent in the raw text
    * ("abc123" splits into two marked runs with no whitespace needed).
    * Documents with no [[wordPattern]] match tokenize to the empty array.
    */
  def bpeTokenizeDocs(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val sep = "\u0001"
    val marked = regexp_replace(
      regexp_replace(col(textCol), sep, ""), wordPattern, "$0" + sep)
    val squeezed = regexp_replace(marked, "[ \\t\\n\\r]+", "")
    val spaced = regexp_replace(squeezed, "(.)", " $1 ")
    val s0 = replace(spaced, lit(s" $sep "), lit(" </w> "))
    val sN = merges.foldLeft(s0) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    df.select(col(idCol),
      filter(split(sN, " "), t => t =!= "").as("tokens"))
  }

  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = expr(s"regexp_extract_all($textCol, '$wordPattern', 0)")
    val syms = expr(
      "concat(filter(split(word, '(?!^)'), s -> s <> ''), array('</w>'))")
    val dict = df.select(explode(words).as("word")).distinct()
      .select(col("word"), size(applyMerges(syms, merges)).as("word_tokens"))
    df.select(col(idCol), explode(words).as("word"))
      .join(dict, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("word_tokens").as("n_tokens"))
  }
}
