package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (marker-based heuristic), quality scoring, token counting, document
  * fingerprinting. Pure column expressions — map-side, codegen-friendly, no
  * shuffles, no UDFs; they compose freely with the security layer and scale
  * linearly with the corpus.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word pieces and single punctuation marks counted
    * separately (a cheap, deterministic proxy for subword tokenizers).
    * One byte walk per row ([[graft.functions.BpeishCount]]) instead of a
    * regex engine pass.
    */
  def bpeishTokenCount(textCol: String): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    columnOf(graft.functions.BpeishCount(expressionOf(col(textCol))))
  }

  /** The regex formulation of [[bpeishTokenCount]], kept (test-scoped) as
    * the parity reference for the expression.
    */
  private[graft] def bpeishTokenCountRegex(textCol: String): Column =
    size(expr(s"regexp_extract_all($textCol, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\\\s]', 0)"))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", ""))

  /** Readability via Flesch-Kincaid grade (Kincaid et al. 1975) with fully
    * SQL-expressible components: sentences are `[.!?]+` runs (min 1), words
    * are whitespace tokens (min 1), syllables are `[aeiouy]+` vowel groups
    * in the lowercased text — the standard closed-form heuristic; words
    * with no vowels contribute zero, which the scaladoc owns rather than
    * hiding behind a per-word clamp no oracle could restate. One scan,
    * three regex passes, no shuffle — a quality FEATURE in the same band
    * family as [[qualityScore]] (edu-style classifiers consume it as a
    * column). Output: (idCol, n_words, n_sentences, n_syllables, fk_grade).
    */
  def readabilityReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = greatest(tokenCount(t), lit(1)).cast("double")
    val sents = greatest(
      size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")), lit(1))
      .cast("double")
    val syll = size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)"))
      .cast("double")
    df.select(col(idCol),
      words.cast("long").as("n_words"),
      sents.cast("long").as("n_sentences"),
      syll.cast("long").as("n_syllables"),
      round(lit(0.39) * (words / sents) + lit(11.8) * (syll / words)
        - lit(15.59), 6).as("fk_grade"))
  }

  /** DEFLATE length of the column's UTF-8 bytes
    * ([[graft.functions.DeflateLength]]). */
  def deflateLen(c: Column, level: Int = 6): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    columnOf(graft.functions.DeflateLength(expressionOf(c), level))
  }

  /** Shannon byte entropy (bits/byte) of the column's UTF-8 bytes
    * ([[graft.functions.ByteEntropy]]). */
  def byteEntropy(c: Column): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    columnOf(graft.functions.ByteEntropy(expressionOf(c)))
  }

  /** Per-document compression-ratio quality signals: DEFLATE ratio and byte
    * entropy — the two-tailed garbage detector (repetitive boilerplate
    * compresses far below natural prose; random-looking bytes barely
    * compress). Pure map-side byte loops over the scanned rows; values are
    * deterministic for a given zlib build, so gates assert ORDERINGS
    * between planted entropy classes, never raw byte counts.
    * Output: (idCol, n_bytes, deflate_bytes, compress_ratio, byte_entropy).
    */
  def compressionReport(df: DataFrame, idCol: String, textCol: String,
      level: Int = 6): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      octet_length(t).as("n_bytes"),
      deflateLen(t, level).as("deflate_bytes"),
      round(deflateLen(t, level).cast("double") /
        greatest(octet_length(t), lit(1)).cast("double"), 6)
        .as("compress_ratio"),
      round(byteEntropy(t), 6).as("byte_entropy"))
  }

  /** Keep documents whose compression ratio sits in the natural-language
    * band — drops both tails (repetitive below `minRatio`, random-ish above
    * `maxRatio`). A plain pushable filter over [[compressionReport]]'s
    * columns.
    */
  def compressionFilter(df: DataFrame, textCol: String,
      minRatio: Double, maxRatio: Double, level: Int = 6): DataFrame = {
    val ratio = deflateLen(col(textCol), level).cast("double") /
      greatest(octet_length(col(textCol)), lit(1)).cast("double")
    df.filter(ratio.between(minRatio, maxRatio))
  }

  private val StopWords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was", "on",
    "for", "with", "as", "by", "at", "it", "this", "that")

  /** Count of stopword tokens (lowercased whitespace tokens). */
  def stopwordCount(textCol: String): Column = {
    val words = s"split(lower(trim($textCol)), '\\\\s+')"
    val list = StopWords.map(w => s"'$w'").mkString("array(", ", ", ")")
    expr(s"size(filter($words, w -> array_contains($list, w)))")
  }

  /** Heuristic quality score in [0,1]: rewards mid-length documents, a sane
    * mean token length and the presence of (a few) stopwords; punishes
    * punctuation soup. The components are exposed by `qualityColumns` so the
    * score is auditable.
    */
  def qualityScore(textCol: String): Column = {
    val text = col(textCol)
    val nChars = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val meanTokLen = nChars / greatest(nTok, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val stopRatio = stopwordCount(textCol).cast("double") / greatest(nTok, lit(1.0))
    val lenScore = least(nChars / lit(200.0), lit(1.0))
    val tokLenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val stopScore = least(stopRatio * lit(5.0), lit(1.0))
    val punctPenalty = least(punctRatio * lit(2.0), lit(1.0))
    round((lenScore * 0.4 + tokLenScore * 0.3 + stopScore * 0.3) * (lit(1.0) - punctPenalty), 6)
  }

  /** Marker-based language ID: CJK codepoints => zh, else the first language
    * whose marker words appear, else en. Deterministic and expressible in
    * plain SQL (the oracle replicates it verbatim).
    */
  def langId(text: Column): Column = {
    def hasWord(ws: Seq[String]): Column =
      lower(text).rlike(ws.mkString("\\b(", "|", ")\\b"))
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(hasWord(Seq("der", "die", "und", "nicht", "ist")), "de")
      .when(hasWord(Seq("le", "les", "et", "est", "une")), "fr")
      .when(hasWord(Seq("el", "los", "las", "es", "una")), "es")
      .otherwise("en")
  }

  /** Stable 128-bit document fingerprint over whitespace-normalized,
    * lowercased text. Grouping/joining on this instead of the body keeps
    * shuffles narrow at scale.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Canonical text normalization for dedup/join keys: Unicode NFC (via the
    * graft_nfc expression, so 'é' composed and decomposed compare equal),
    * trimmed, inner whitespace collapsed. Map-side; DuckDB's nfc_normalize
    * oracles it.
    */
  def normalize(textCol: String): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    // build the expression directly — no dependence on VectorFunctions
    // having been registered in this session (graft_nfc stays available for
    // SQL-text callers)
    val nfc = columnOf(graft.functions.NfcNormalize(expressionOf(col(textCol))))
    regexp_replace(trim(nfc), "\\s+", " ")
  }

  /** PII patterns redacted by [[redactPii]], applied in order. Kept in the
    * RE2-compatible regex subset so the same patterns run in other engines
    * (the DuckDB oracle uses them verbatim). Order matters: cards before
    * phones (a 16-digit card is phone-shaped), emails before bare domains.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    // 15-19 digits: covers Amex (15), Visa/MC (16) and UnionPay/Visa (19);
    // a fixed 16 would let 15/19-digit cards fall through to the phone
    // pattern and leak their trailing digits
    "\\b(?:\\d[ -]?){14,18}\\d\\b" -> "[CARD]",
    "\\b\\+?\\d{1,3}[ -]?\\(?\\d{2,4}\\)?[ -]?\\d{3,4}[ -]?\\d{3,4}\\b" -> "[PHONE]",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "[IP]")

  /** Redact common PII (emails, card numbers, phone-shaped digit runs, IPv4)
    * with typed placeholders — the pipeline-side complement of the policy
    * mask layer: masking policies protect governed columns, this scrubs
    * free-text bodies before training. Chained regexp_replace: map-side,
    * codegen'd, no UDF.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** Lowercased whitespace words of a text column, empties dropped. */
  def wordsOf(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w =!= "")

  /** Let-binding for column expressions: evaluates `value` exactly once per
    * row and hands it to `body` as a cheap lambda-bound reference (a
    * single-element `transform`). Needed because Catalyst's subexpression
    * elimination does not cross `when()` branches or HOF lambda bodies, and
    * ProjectCollapsing re-inlines intermediate columns — so an expensive
    * array expression referenced N times (or inside a per-element lambda) is
    * otherwise re-evaluated N times (or once per element).
    */
  private def bindOnce(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Word n-grams joined by single spaces; empty array when the text has
    * fewer than `n` words. (The short-text guard matters: Spark's `sequence`
    * DESCENDS when stop < start, which would fabricate grams.) Pure HOFs —
    * map-side, no explode, no shuffle. The words array is let-bound so the
    * split/lower/filter pipeline runs once per row, not once per gram.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"wordNgrams: n must be >= 1, got $n")
    bindOnce(wordsOf(text))(ngramsOf(_, n))
  }

  /** N-grams from an already-bound words array (see [[wordNgrams]]). */
  private def ngramsOf(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - lit(n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Winnowing fingerprint (Schleimer, Wilkerson, Aiken, "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD 2003), at word
    * granularity: md5-hash every word k-gram, slide a window of w
    * consecutive gram hashes, and let each window contribute its MINIMUM
    * hash (lexicographic on the hex string — portable across engines);
    * the fingerprint is the sorted distinct minima. The paper's guarantee
    * transfers: any shared run of >= w + k - 1 words between two documents
    * produces at least one shared fingerprint hash, while expected
    * fingerprint density is only ~2/(w+1) of windows — the local,
    * position-independent sampling that makes all-pairs overlap detection
    * affordable. Degenerate inputs: fewer than w grams (but >= 1) collapse
    * to one whole-array window; no grams -> empty fingerprint.
    *
    * Output: (id, n_grams, n_windows, n_selected, digest), digest = md5 of
    * the concatenated fingerprint (one portable string naming the set —
    * equal digests <=> equal fingerprints). Pure map-side HOFs over a
    * let-bound hash array: no explode, no shuffle; overlap detection
    * downstream is a join on exploded fingerprint hashes, carrying 32-byte
    * strings instead of documents.
    */
  /** The windowed-minima selection over a bound gram-hash array — the ONE
    * definition of the winnowing rule, shared by [[winnow]] (digest form)
    * and [[winnowHashes]] (exploded form) so the two can never
    * desynchronize.
    */
  private def winnowSelect(hs: Column, w: Int): Column =
    when(size(hs) >= w,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(hs) - lit(w - 1)),
        i => array_min(slice(hs, i, lit(w)))))))
      .when(size(hs) > 0, array(array_min(hs)))
      .otherwise(array().cast("array<string>"))

  def winnow(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnow: k and w must be >= 1, got k=$k w=$w")
    val row = bindOnce(transform(wordNgrams(col(textCol), k), g => md5(g))) { hs =>
      bindOnce(winnowSelect(hs, w)) { sel =>
        struct(size(hs).as("n_grams"),
          when(size(hs) >= w, size(hs) - lit(w - 1))
            .when(size(hs) > 0, lit(1)).otherwise(lit(0)).as("n_windows"),
          size(sel).as("n_selected"),
          md5(array_join(sel, "")).as("digest"))
      }
    }
    df.select(col(idCol), row.as("_w"))
      .select(col(idCol), col("_w.n_grams"), col("_w.n_windows"),
        col("_w.n_selected"), col("_w.digest"))
  }

  /** The exploded (id, fingerprint-hash) pairs of [[winnow]] — the join
    * side for overlap detection: documents sharing any selected hash are
    * overlap candidates (verify with exact comparison on the candidate
    * pairs, the same candidates-then-verify shape as the LSH families).
    */
  def winnowHashes(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowHashes: k and w must be >= 1, got k=$k w=$w")
    val sel = bindOnce(transform(wordNgrams(col(textCol), k), g => md5(g)))(
      winnowSelect(_, w))
    df.select(col(idCol), explode(sel).as("fp_hash"))
  }

  /** `1 - distinct/total` over an array, rounded to 6 places; 0.0 for an
    * empty array. Single evaluation of `arr` and a single O(g log g) pass:
    * sort, then one fold counting elements and boundaries (positions where
    * the value differs from its predecessor). The naive
    * `size(array_distinct(a)) / size(a)` form references the array three
    * times and re-evaluates it each time (see [[bindOnce]]).
    */
  private def dupFrac(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0).as("tot"), lit(0).as("dst")),
      (acc, x) => struct(
        x.as("prev"),
        (acc.getField("tot") + lit(1)).as("tot"),
        (acc.getField("dst") +
          when(acc.getField("prev").isNull || x =!= acc.getField("prev"), 1)
            .otherwise(0)).as("dst")),
      acc => when(acc.getField("tot") > 0,
        round(lit(1.0) - acc.getField("dst").cast("double")
          / acc.getField("tot").cast("double"), 6))
        .otherwise(lit(0.0)))

  /** Fraction of non-empty lines that are repeats of an earlier line
    * (Gopher-style repetition signal). One map-side pass — no explode, no
    * shuffle, and the line array is evaluated exactly once per row.
    */
  def dupLineFrac(text: Column): Column =
    dupFrac(filter(transform(split(text, "\n"), l => trim(l)), l => l =!= ""))

  /** Fraction of word n-grams that are repeats of an earlier n-gram — the
    * second Gopher repetition signal (catches within-line loops that
    * [[dupLineFrac]] misses). 0 when the text has fewer than `n` words.
    */
  def dupNgramFrac(text: Column, n: Int): Column =
    dupFrac(wordNgrams(text, n))

  /** Token-window document chunking for training prep: each document splits
    * into chunks of at most `maxTokens` whitespace tokens, consecutive chunks
    * sharing `overlap` tokens of context (stride = maxTokens - overlap).
    * Output: one row per chunk with (chunk_id, chunk_text, n_tokens);
    * chunk_text re-joins tokens with single spaces. Documents with no tokens
    * produce no chunks; every chunk carries at least one token not in the
    * previous chunk, so the chunk count is ceil-linear in the token count.
    *
    * Map-side + one generator: the words array is let-bound (split runs once
    * per document), chunk assembly is a per-row transform, and explode is
    * the only row-multiplying step — no shuffle at any point, so the
    * operator scales with corpus bytes like any projection.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String, maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"chunk: maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"chunk: overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    // original-case tokens (unlike wordsOf): chunk text is training payload
    val words = filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")
    val chunks = bindOnce(words) { ws =>
      val nw = size(ws)
      val nChunks = when(nw === 0, 0)
        .when(nw <= maxTokens, 1)
        .otherwise(lit(1) +
          ceil((nw - lit(maxTokens)).cast("double") / lit(stride)).cast("int"))
      // sequence DESCENDS when stop < start — guard the empty case explicitly
      when(nChunks > 0,
        transform(sequence(lit(0), nChunks - 1), i => struct(
          i.as("chunk_id"),
          array_join(slice(ws, i * stride + 1, lit(maxTokens)), " ").as("chunk_text"),
          least(lit(maxTokens), nw - i * lit(stride)).as("n_tokens"))))
        .otherwise(array().cast("array<struct<chunk_id:int,chunk_text:string,n_tokens:int>>"))
    }
    df.select(col(idCol), explode(chunks).as("_c"))
      .select(col(idCol), col("_c.chunk_id"), col("_c.chunk_text"), col("_c.n_tokens"))
  }

  /** The required-stopword list of the Gopher quality rules (Rae et al. 2021
    * §A1.1): a document must contain at least two of these to pass.
    */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher quality-rule report: per-document metrics plus the
    * combined `keep` verdict (word count in [minWords, maxWords], mean word
    * length in [3, 10], symbol-to-word ratio < 0.1, < 90% bullet lines,
    * < 30% ellipsis lines, > 80% words with an alphabetic character, >= 2
    * required stopwords).
    *
    * Scale shape: everything is a per-row map pass — no shuffle, no UDF. The
    * word and line arrays feed several metrics each, so the split/trim
    * projection sits behind a lazy checkpoint (Catalyst's ProjectCollapsing
    * would otherwise re-inline and re-evaluate the splits per consumer — the
    * same barrier [[graft.operators.Boilerplate]] uses). `keep` is derived
    * from the UNROUNDED doubles; the reported fractions are rounded to 6
    * places for stable cross-engine comparison.
    */
  /** The checkpointed array projection shared by [[gopherReport]] and
    * [[curate]]: words, trimmed non-empty lines, non-whitespace char count,
    * symbol count, plus any `extra` columns the caller wants computed in the
    * SAME single pass over the text. `derived` columns may reference the
    * bound columns (`_ws`, `_ls`, ...) and are materialized BEFORE the
    * checkpoint — the way for a caller to evaluate an expensive array fold
    * exactly once and reuse it across several downstream consumers.
    */
  private def gopherBound(df: DataFrame, idCol: String, textCol: String,
      extra: Seq[Column], derived: Seq[Column] = Seq.empty): DataFrame = {
    val text = col(textCol)
    def removed(s: String) = length(text) - length(replace(text, lit(s), lit("")))
    // '…' is one char, '...' removes three per hit — both count one ellipsis
    val symbols = removed("#") + removed("…") + removed("...") / lit(3)
    val bound = df.select(col(idCol) +:
      wordsOf(text).as("_ws") +:
      filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "").as("_ls") +:
      length(regexp_replace(text, "\\s", "")).cast("double").as("_nws") +:
      symbols.cast("double").as("_sym") +: extra: _*)
    (if (derived.isEmpty) bound else bound.select(col("*") +: derived: _*))
      .localCheckpoint(eager = false)
  }

  /** The Gopher metric columns over a [[gopherBound]] frame (unrounded). */
  /** The Gopher metric columns over bound words/lines/char-count/symbol
    * columns. Defaults read the [[gopherBound]] helper columns; callers
    * without a checkpointed frame (the streaming-safe [[qualityFilter]])
    * pass [[bindOnce]]-bound lambda references instead.
    */
  private final class GopherMetrics(minWords: Int, maxWords: Int,
      minStopHits: Int, ws: Column = col("_ws"), ls: Column = col("_ls"),
      nws: Column = col("_nws"), sym: Column = col("_sym")) {
    private val nw = size(ws).cast("double")
    private val nl = size(ls).cast("double")
    private def overWords(c: Column) = when(nw > 0, c / nw).otherwise(lit(0.0))
    private def overLines(c: Column) = when(nl > 0, c / nl).otherwise(lit(0.0))
    val meanWordLen: Column = overWords(nws)
    val symbolRatio: Column = overWords(sym)
    val bulletFrac: Column = overLines(size(filter(ls,
      l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))).cast("double"))
    val ellipsisFrac: Column = overLines(size(filter(ls,
      l => l.endsWith("...") || l.endsWith("…"))).cast("double"))
    val alphaFrac: Column = overWords(size(filter(ws,
      w => w.rlike("[a-z]"))).cast("double"))
    val stopHits: Column = size(filter(
      array(GopherStopWords.map(lit): _*),
      sw => array_contains(ws, sw)))
    val keep: Column =
      size(ws).between(minWords, maxWords) &&
        meanWordLen.between(3.0, 10.0) &&
        symbolRatio < 0.1 &&
        bulletFrac < 0.9 &&
        ellipsisFrac < 0.3 &&
        alphaFrac > 0.8 &&
        stopHits >= minStopHits
  }

  def gopherReport(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minStopHits: Int = 2): DataFrame = {
    val m = new GopherMetrics(minWords, maxWords, minStopHits)
    gopherBound(df, idCol, textCol, Seq.empty).select(col(idCol),
      size(col("_ws")).as("n_words"),
      round(m.meanWordLen, 6).as("mean_word_len"),
      round(m.symbolRatio, 6).as("symbol_word_ratio"),
      round(m.bulletFrac, 6).as("bullet_line_frac"),
      round(m.ellipsisFrac, 6).as("ellipsis_line_frac"),
      round(m.alphaFrac, 6).as("alpha_word_frac"),
      m.stopHits.as("stop_hits"),
      m.keep.as("keep"))
  }

  /** The curation funnel as ONE pass over the text: Gopher rules AND both
    * repetition fractions gate the corpus, survivors exact-dedup to the
    * minimum id per fingerprint. Semantically identical to composing
    * [[gopherReport]] + [[dupLineFrac]]/[[dupNgramFrac]] + a fingerprint
    * group-by, but the words/lines arrays and the fingerprint are computed
    * in a single checkpointed projection — at 100 TB that is one scan of the
    * text instead of two, and the only shuffle is the dedup group-by on the
    * 128-bit fingerprint. Output: (idCol, n_words, dup_line_frac).
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000, minStopHits: Int = 2,
      maxDupLineFrac: Double = 0.3, maxDupNgramFrac: Double = 0.3,
      ngram: Int = 5): DataFrame = {
    val m = new GopherMetrics(minWords, maxWords, minStopHits)
    // the repetition fractions are O(g log g) array folds: materialized as
    // checkpointed columns so the filter and the min_by struct below read
    // the same evaluation instead of re-running the fold per consumer
    gopherBound(df, idCol, textCol, Seq(fingerprint(col(textCol)).as("_fp")),
        derived = Seq(dupFrac(col("_ls")).as("_dlf"),
          dupFrac(ngramsOf(col("_ws"), ngram)).as("_dgf")))
      .filter(m.keep && col("_dlf") < maxDupLineFrac && col("_dgf") < maxDupNgramFrac)
      .groupBy(col("_fp"))
      .agg(min_by(struct(col(idCol), size(col("_ws")).as("n_words"),
        col("_dlf").as("dup_line_frac")), col(idCol)).as("_r"))
      .select(col(s"_r.$idCol"), col("_r.n_words"), col("_r.dup_line_frac"))
  }

  /** Per-source curation report — the table a mixture decision is made
    * from (which provenance buckets to up/down-sample before training):
    * per source, document count, exact-duplicate fraction (by content
    * fingerprint), Gopher keep rate, mean quality score and mean word
    * count. One pass over the text computes every per-doc signal; the only
    * shuffle is the group-by on the source key (the fingerprint rides it
    * for the exact distinct count). Score sums go through DECIMAL so the
    * aggregate is order-free and cross-engine exact.
    */
  def sourceReport(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minWords: Int = 50, maxWords: Int = 100000,
      minStopHits: Int = 2): DataFrame = {
    val m = new GopherMetrics(minWords, maxWords, minStopHits)
    val n = count(lit(1)).cast("double")
    gopherBound(df, idCol, textCol,
        Seq(col(sourceCol), fingerprint(col(textCol)).as("_fp"),
          qualityScore(textCol).cast("decimal(18,6)").as("_score")))
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(lit(1.0) - countDistinct(col("_fp")).cast("double") / n, 6)
          .as("dup_frac"),
        round(sum(m.keep.cast("int")).cast("double") / n, 6).as("keep_frac"),
        round(sum(col("_score")).cast("double") / n, 6).as("avg_score"),
        round(sum(size(col("_ws"))).cast("double") / n, 6).as("avg_words"))
  }

  /** The [[curate]] quality gate as a STATELESS filter: Gopher rules plus
    * both repetition thresholds, no exact-dedup stage — so there is no
    * checkpoint, no shuffle and no state, and the same operator runs
    * UNCHANGED on a streaming DataFrame (quality gating at ingest, like
    * [[Contamination.dropContaminated]]). Pass-through schema: survivors
    * keep every input column. In batch pipelines that continue into dedup,
    * prefer [[curate]]/[[curateFuzzy]], which share one checkpointed array
    * projection across the gate AND the dedup stages; here each row is
    * touched exactly once, so there is nothing to share.
    */
  def qualityFilter(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000, minStopHits: Int = 2,
      maxDupLineFrac: Double = 0.3, maxDupNgramFrac: Double = 0.3,
      ngram: Int = 5): DataFrame = {
    val text = col(textCol)
    def removed(s: String) = length(text) - length(replace(text, lit(s), lit("")))
    val symbols = removed("#") + removed("…") + removed("...") / lit(3)
    // no checkpointed frame here (streams cannot localCheckpoint), so the
    // words/lines arrays are let-bound with bindOnce — without it,
    // ProjectCollapsing would re-inline wordsOf(text) into every one of the
    // ~6 metrics that reference it (measured 10x slower)
    val keep = bindOnce(wordsOf(text)) { ws =>
      bindOnce(filter(transform(split(text, "\n"), l => trim(l)),
          l => l =!= "")) { ls =>
        val m = new GopherMetrics(minWords, maxWords, minStopHits,
          ws = ws, ls = ls,
          nws = length(regexp_replace(text, "\\s", "")).cast("double"),
          sym = symbols.cast("double"))
        m.keep &&
          dupFrac(ls) < maxDupLineFrac &&
          dupFrac(ngramsOf(ws, ngram)) < maxDupNgramFrac
      }
    }
    df.filter(keep)
  }

  /** Within-document repeated-line removal — the boilerplate dedup step
    * CCNet/RefinedWeb-style pipelines run on web pages (navigation chrome
    * and footers repeat verbatim inside a page): keeps the FIRST occurrence
    * of each distinct trimmed non-empty line, preserving document order.
    * Output: (idCol, n_lines, n_kept, clean_text).
    *
    * Pure map pass, O(L log L) in LINES PER DOCUMENT: sort (line, index)
    * pairs, keep each pair whose predecessor holds a different line (= the
    * first occurrence of each distinct line), then sort the surviving
    * indices to restore document order. Array `element_at` is O(1) on
    * Spark's ArrayData, so nothing here is quadratic — a pathological
    * scraped page with 10^5 lines costs ~10^6 comparisons in one task, not
    * 10^10 (the naive `array_position`-per-line form this replaces).
    * Linear in documents, no shuffle — the same scan-bound shape as every
    * text filter here.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val row = bindOnce(filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => l =!= "")) { ls =>
      bindOnce(array_sort(transform(ls,
          (l, i) => struct(l.as("l"), i.as("i"))))) { sorted =>
        // filter's index j is 0-based; element_at is 1-based, so
        // element_at(sorted, j) IS the predecessor of the pair at j
        bindOnce(array_sort(transform(
            filter(sorted, (p, j) =>
              (j === lit(0)) || element_at(sorted, j)("l") =!= p("l")),
            p => p("i")))) { keptIdx =>
          bindOnce(transform(keptIdx, i => element_at(ls, i + lit(1)))) { kept =>
            struct(size(ls).as("n_lines"), size(kept).as("n_kept"),
              array_join(kept, "\n").as("clean_text"))
          }
        }
      }
    }
    df.select(col(idCol), row.as("_d"))
      .select(col(idCol), col("_d.n_lines"), col("_d.n_kept"), col("_d.clean_text"))
  }

  /** Document phrases that disqualify a whole page under the C4 rules:
    * boilerplate legalese markers and code indicators (Raffel et al. 2020
    * §2.2). Callers can extend the list; matching is lowercase substring.
    */
  val C4BadPhrases: Seq[String] = Seq("lorem ipsum", "{")

  /** The C4 line keep-predicate (Raffel et al. 2020 §2.2): a retained line
    * is non-empty, ends in a terminal punctuation mark (period, exclamation,
    * question mark, or closing quote), has at least `minLineWords` words,
    * and does not mention javascript (the cookie/JS-warning boilerplate
    * rule). Applied to already-trimmed lines.
    */
  private def c4LineKeep(l: Column, minLineWords: Int): Column =
    l =!= "" &&
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
      size(filter(split(l, "\\s+"), w => w =!= "")) >= minLineWords &&
      !contains(lower(l), lit("javascript"))

  /** C4-style heuristic cleaning (Raffel et al. 2020 §2.2), the classic
    * line-level web-corpus filter: lines are kept only if they end in
    * terminal punctuation, carry at least `minLineWords` words and are not
    * javascript boilerplate; a document is kept only if at least
    * `minSentences` lines survive and no [[C4BadPhrases]] phrase (lorem
    * ipsum placeholder text, curly braces marking code) appears anywhere in
    * the original text. Output: (idCol, n_lines, n_kept, keep, clean_text)
    * where clean_text re-joins the surviving lines.
    *
    * Scale shape: one map-side pass — the trimmed-line array is let-bound
    * ([[bindOnce]]) so split/trim runs once per row even though four output
    * columns consume it; no shuffle, no UDF, whole plan is a projection over
    * the scan. The cross-document three-sentence-span dedup step of the C4
    * paper is the separate [[Dedup.substringPairs]] operator.
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minSentences: Int = 3,
      badPhrases: Seq[String] = C4BadPhrases): DataFrame = {
    val text = col(textCol)
    val noBad = badPhrases
      .map(p => !contains(lower(text), lit(p.toLowerCase)))
      .reduceOption(_ && _).getOrElse(lit(true))
    val row = bindOnce(transform(split(text, "\n"), l => trim(l))) { ls =>
      bindOnce(filter(ls, l => c4LineKeep(l, minLineWords))) { kept =>
        struct(
          size(filter(ls, l => l =!= "")).as("n_lines"),
          size(kept).as("n_kept"),
          (size(kept) >= minSentences && noBad).as("keep"),
          array_join(kept, "\n").as("clean_text"))
      }
    }
    df.select(col(idCol), row.as("_c"))
      .select(col(idCol), col("_c.n_lines"), col("_c.n_kept"),
        col("_c.keep"), col("_c.clean_text"))
  }

  /** Sketch-based per-source statistics — the constant-memory form of
    * [[sourceReport]]'s counting for corpora where exact per-group state
    * does not fit. `approx_count_distinct` (HyperLogLog++, `rsd` relative
    * error) replaces the exact distinct-fingerprint count, and
    * `percentile_approx` (KLL-style quantile sketch, rank error `<= 1 /
    * accuracy`) replaces exact word-count percentiles. Both sketches are
    * fixed-size mergeable aggregation buffers: the map side combines
    * locally and the group-by shuffles only sketch bytes per (partition,
    * source) — at 100 TB that is KBs per source instead of one shuffle row
    * per document. Deterministic (both sketches are insertion-order-free),
    * gated against the exact values by the `_check` companion query.
    */
  def sketchStats(df: DataFrame, textCol: String, sourceCol: String,
      rsd: Double = 0.05, accuracy: Int = 1000): DataFrame =
    df.select(col(sourceCol).as("source"),
        fingerprint(col(textCol)).as("_fp"),
        tokenCount(col(textCol)).as("_nw"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("_fp"), rsd).as("approx_distinct"),
        percentile_approx(col("_nw"), lit(0.5), lit(accuracy)).as("p50_words"),
        percentile_approx(col("_nw"), lit(0.95), lit(accuracy)).as("p95_words"))

  /** Distinct-n diversity (the Texygen distinct-n metric, Zhu et al. 2018):
    * per group and per n, the ratio of DISTINCT word n-grams to total word
    * n-gram occurrences — the standard repetitiveness / mode-collapse
    * signal tracked per source and per training epoch (a shrinking
    * distinct-2 under constant volume means the corpus is filling with
    * templated text).
    *
    * Exact on purpose (it is the oracled gate); the n-gram explode shuffles
    * one row per occurrence for the per-group countDistinct. At 100 TB
    * track it with the [[sketchStats]] discipline instead — swap
    * `countDistinct` for `approx_count_distinct` and the shuffle carries
    * sketch bytes per (partition, group); the ratio's drift, not its 6th
    * decimal, is the decision input.
    */
  def distinctN(df: DataFrame, textCol: String, groupCol: String,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be >= 1, got $ns")
    val base = df.select(col(groupCol).as("group"),
      wordsOf(col(textCol)).as("_ws"))
    ns.map { n =>
      val grams =
        if (n == 1) col("_ws")
        else bindOnce(col("_ws")) { ws =>
          // sequence DESCENDS when stop < start — guard the short case
          when(size(ws) >= n,
            transform(sequence(lit(1), size(ws) - (n - 1)),
              i => concat_ws(" ", slice(ws, i, lit(n)))))
            .otherwise(array().cast("array<string>"))
        }
      base.select(col("group"), explode(grams).as("_g"))
        .groupBy(col("group"))
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("_g")).as("distinct_ngrams"))
        .select(col("group"), lit(n).as("n"), col("total_ngrams"),
          col("distinct_ngrams"),
          round(col("distinct_ngrams").cast("double") /
            col("total_ngrams"), 6).as("distinct_ratio"))
    }.reduce(_ unionAll _)
  }

  /** [[curate]] plus the near-dup stage every published pretraining funnel
    * runs after exact dedup (C4, Gopher/MassiveText, RefinedWeb): survivors
    * of the quality gate + exact dedup flow through MinHash-LSH candidate
    * discovery, exact-Jaccard verification at `jaccardThreshold`, and
    * connected components; only each duplicate group's minimum-id
    * representative survives. Output shape matches [[curate]]:
    * (idCol, n_words, dup_line_frac).
    *
    * Still ONE pass over the text: the shingle-hash arrays ride in the same
    * checkpointed projection as the Gopher/repetition arrays and the
    * fingerprint, survive the exact-dedup min_by as a struct field, and feed
    * the fuzzy stage directly — so the near-dup stage costs banding + verify
    * shuffles sized to the SURVIVOR set (hashes only on the wire), never a
    * second corpus scan. Semantically identical to composing curate -> join
    * text back -> [[Dedup.minhashDedup]] -> [[Dedup.components]] -> drop
    * non-representatives (asserted by the equivalence property test).
    */
  def curateFuzzy(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000, minStopHits: Int = 2,
      maxDupLineFrac: Double = 0.3, maxDupNgramFrac: Double = 0.3,
      ngram: Int = 5, shingleSize: Int = 3, bands: Int = 16,
      rowsPerBand: Int = 4, maxBucket: Int = 100,
      jaccardThreshold: Double = 0.7): DataFrame =
    curateFuzzyPick(df, idCol, textCol, minWords, maxWords, minStopHits,
      maxDupLineFrac, maxDupNgramFrac, ngram, shingleSize, bands,
      rowsPerBand, maxBucket, jaccardThreshold, best = false)

  /** [[curateFuzzy]] with the canonical-representative policy of
    * [[Dedup.canonicalPick]]: each near-dup cluster keeps its LONGEST
    * surviving member (word count, min-id tiebreak) instead of the minimum
    * id — what the published funnels do when duplicates differ in
    * completeness (a page and its truncated syndication copy: the min id is
    * arbitrary, the longest copy is the keeper). Same output shape and the
    * same survivor-sized shuffles; the pick adds one max_by hash aggregate
    * over the duplicate graph.
    */
  def curateFuzzyBest(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000, minStopHits: Int = 2,
      maxDupLineFrac: Double = 0.3, maxDupNgramFrac: Double = 0.3,
      ngram: Int = 5, shingleSize: Int = 3, bands: Int = 16,
      rowsPerBand: Int = 4, maxBucket: Int = 100,
      jaccardThreshold: Double = 0.7): DataFrame =
    curateFuzzyPick(df, idCol, textCol, minWords, maxWords, minStopHits,
      maxDupLineFrac, maxDupNgramFrac, ngram, shingleSize, bands,
      rowsPerBand, maxBucket, jaccardThreshold, best = true)

  /** [[curateFuzzy]] with the leakage-guard policy: near-dup clusters are
    * NOT collapsed — every survivor is kept, and each gets a train/val/test
    * split keyed by md5 of its CLUSTER label ([[Sampling.splitCol]]), so a
    * cluster moves to one side of the eval boundary as a unit. This is the
    * policy for corpora where near-dups are intentional (translations,
    * versioned pages) but eval contamination still must be impossible.
    * Output: (idCol, n_words, dup_line_frac, grp, split).
    */
  def curateFuzzySplit(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000, minStopHits: Int = 2,
      maxDupLineFrac: Double = 0.3, maxDupNgramFrac: Double = 0.3,
      ngram: Int = 5, shingleSize: Int = 3, bands: Int = 16,
      rowsPerBand: Int = 4, maxBucket: Int = 100,
      jaccardThreshold: Double = 0.7,
      trainHexUpper: String = "cc", valHexUpper: String = "e6"): DataFrame = {
    val (survivors, labels) = fuzzySurvivorsAndLabels(df, idCol, textCol,
      minWords, maxWords, minStopHits, maxDupLineFrac, maxDupNgramFrac,
      ngram, shingleSize, bands, rowsPerBand, maxBucket, jaccardThreshold)
    val l = labels.select(col("id").as("_gid"), col("label").as("_glabel"))
    survivors.join(l, survivors(idCol) === l("_gid"), "left")
      .withColumn("grp", coalesce(col("_glabel"), col(idCol)))
      .select(col(idCol), col("n_words"), col("dup_line_frac"), col("grp"),
        Sampling.splitCol(col("grp"), trainHexUpper, valHexUpper).as("split"))
  }

  /** Shared head of the fuzzy funnel: quality gates + exact dedup
    * (survivors, with shingle sets), then minhash pair discovery and
    * components labels over the survivor graph. Every fuzzy policy
    * (min-id collapse, best-pick collapse, leakage-guard split) consumes
    * this same (survivors, labels) pair, so the policies cannot drift.
    */
  private def fuzzySurvivorsAndLabels(df: DataFrame, idCol: String,
      textCol: String, minWords: Int, maxWords: Int, minStopHits: Int,
      maxDupLineFrac: Double, maxDupNgramFrac: Double,
      ngram: Int, shingleSize: Int, bands: Int,
      rowsPerBand: Int, maxBucket: Int,
      jaccardThreshold: Double): (DataFrame, DataFrame) = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val m = new GopherMetrics(minWords, maxWords, minStopHits)
    // checkpoint: survivors feed the pair-discovery stage AND the final
    // representative anti-join
    val survivors =
      gopherBound(df, idCol, textCol,
          Seq(fingerprint(col(textCol)).as("_fp"),
            expr(s"graft_shingle_hashes($textCol, $shingleSize)").as("_sh")),
          derived = Seq(dupFrac(col("_ls")).as("_dlf"),
            dupFrac(ngramsOf(col("_ws"), ngram)).as("_dgf")))
        .filter(m.keep && col("_dlf") < maxDupLineFrac && col("_dgf") < maxDupNgramFrac)
        .groupBy(col("_fp"))
        .agg(min_by(struct(col(idCol), size(col("_ws")).as("n_words"),
          col("_dlf").as("dup_line_frac"), col("_sh").as("sh")), col(idCol)).as("_r"))
        .select(col(s"_r.$idCol"), col("_r.n_words"), col("_r.dup_line_frac"),
          col("_r.sh").as("sh"))
        .localCheckpoint(eager = false)
    val pairs = graft.operators.Dedup.minhashDedupFromSets(
      survivors.select(col(idCol), col("sh")), idCol,
      bands, rowsPerBand, maxBucket, jaccardThreshold)
    // components labels every id in the pair graph with its minimum
    // reachable id; singletons (absent from the graph) always keep.
    (survivors, graft.operators.Dedup.components(pairs))
  }

  private def curateFuzzyPick(df: DataFrame, idCol: String, textCol: String,
      minWords: Int, maxWords: Int, minStopHits: Int,
      maxDupLineFrac: Double, maxDupNgramFrac: Double,
      ngram: Int, shingleSize: Int, bands: Int,
      rowsPerBand: Int, maxBucket: Int,
      jaccardThreshold: Double, best: Boolean): DataFrame = {
    // The pick policy decides which graph member survives: the label holder
    // (min id), or the group's longest member (canonicalPick semantics).
    val (survivors, labels) = fuzzySurvivorsAndLabels(df, idCol, textCol,
      minWords, maxWords, minStopHits, maxDupLineFrac, maxDupNgramFrac,
      ngram, shingleSize, bands, rowsPerBand, maxBucket, jaccardThreshold)
    val dropIds =
      if (!best) labels.filter(col("id") =!= col("label")).select(col("id").as(idCol))
      else {
        val picks = graft.operators.Dedup
          .canonicalPickFromLabels(labels, survivors, idCol, col("n_words"))
          .select(col("keep_id").as("id"))
        labels.select(col("id")).join(picks, Seq("id"), "left_anti")
          .select(col("id").as(idCol))
      }
    survivors.join(dropIds, Seq(idCol), "left_anti")
      .select(col(idCol), col("n_words"), col("dup_line_frac"))
  }

  /** The complete published pretraining funnel: benchmark decontamination,
    * then quality gating + exact dedup + fuzzy dedup ([[curateFuzzy]]).
    * Decontamination runs FIRST — it is the cheapest stage by construction
    * (see below), so running it before the heavier gates shrinks everything
    * downstream — and in the two-phase shape that deploys at 100 TB:
    *
    *  1. [[Contamination.reportBloom]] over the full corpus — scan →
    *     project, ZERO shuffles; flags a superset of contaminated docs.
    *  2. [[Contamination.report]] (exact) only on the flagged slice, which
    *     is benchmark-overlap-sized, not corpus-sized.
    *  3. Anti-join the confirmed ids (exact-contaminated only — Bloom false
    *     positives survive) and hand the clean corpus to [[curateFuzzy]].
    *
    * Because Bloom filters have no false negatives, flagged ⊇ contaminated
    * and steps 1-3 return EXACTLY the docs the exact-only pass would — the
    * DuckDB oracle for the whole funnel composes the exact decontam CTE
    * with the fuzzy-funnel SQL, and the output hash-matches.
    */
  def curateFull(df: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, decontamN: Int = 5, fpp: Double = 0.001,
      minWords: Int = 50, maxWords: Int = 100000, minStopHits: Int = 2,
      maxBucket: Int = 100, jaccardThreshold: Double = 0.7): DataFrame = {
    val flaggedIds = Contamination
      .reportBloom(df, bench, idCol, textCol, decontamN, fpp)
      .filter(col("contaminated")).select(col(idCol))
    val candidates = df.join(flaggedIds, Seq(idCol), "left_semi")
    val confirmedIds = Contamination
      .report(candidates, bench, idCol, textCol, decontamN)
      .filter(col("contaminated")).select(col(idCol))
    val clean = df.join(confirmedIds, Seq(idCol), "left_anti")
    curateFuzzy(clean, idCol, textCol, minWords = minWords,
      maxWords = maxWords, minStopHits = minStopHits, maxBucket = maxBucket,
      jaccardThreshold = jaccardThreshold)
  }
}
