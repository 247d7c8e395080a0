package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.GraftSqlShims
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark corpus, the standard pre-training
  * hygiene step (n-gram overlap decontamination as published for GPT-3
  * appendix C / PaLM / Llama data pipelines).
  *
  * Scale shape: the benchmark side is SMALL by nature (eval suites, not
  * corpora) — its distinct grams are broadcast, so the 100 TB corpus is
  * never shuffled: one map-side pass builds grams per doc (HOFs, no UDF),
  * the broadcast hash join keeps only hits, and the per-doc aggregate
  * shuffles just the hit set (<< corpus). The final left join attaching
  * zero-counts to clean docs is a plain join: `hits` has one row per
  * contaminated doc, which is unbounded on a dirty corpus, so AQE decides
  * at runtime whether it is small enough to broadcast.
  */
object Contamination {

  /** Per-document overlap report against a benchmark corpus: one row per
    * input doc — `(idCol, n_overlap, contaminated)` where `n_overlap` counts
    * DISTINCT shared n-grams and `contaminated = n_overlap > 0`. Callers
    * typically then drop/quarantine contaminated docs; keeping the full
    * report (zeros included) makes the pass auditable.
    */
  def report(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    reportAgainstGrams(docs, benchNgrams(bench, textCol, n), idCol, textCol, n)

  /** The bench side of [[report]] — one `gram` column, distinct. Callers
    * that confirm repeatedly against the SAME benchmark (a streaming
    * funnel's per-micro-batch exact confirm) should derive this once,
    * localCheckpoint it, and pass it to [[reportAgainstGrams]]: the
    * explode + distinct over the bench corpus is the confirm's dominant
    * cost and is invariant across batches.
    */
  def benchNgrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()

  /** [[report]] against a pre-derived [[benchNgrams]] frame. */
  def reportAgainstGrams(docs: DataFrame, benchGrams: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val docGrams = docs.select(col(idCol),
      explode(array_distinct(TextAnalysis.wordNgrams(col(textCol), n))).as("gram"))
    val hits = docGrams.join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** Build the serialized bench-side Bloom filter ONCE over the benchmark's
    * distinct n-gram HASHES (xxhash64 — Catalyst's
    * `BloomFilterMightContain` probes longs, so the filter domain is the
    * 64-bit gram hash, with the filter's internal hashing on top of it).
    *
    * This is an EAGER method — it runs two driver actions on the SMALL
    * bench side at call time: a count to size the filter honestly, then
    * the `BloomFilterAggregate` build (a tree of fixed-size bit-set
    * merges). Callers composing several Bloom passes over the same bench
    * corpus — [[reportBloom]] + [[dropContaminated]], a per-micro-batch
    * streaming ingest, or a funnel that also runs the exact [[report]] —
    * should build once here and pass the bytes to the prebuilt overloads
    * instead of letting each call rebuild and re-scan the bench side.
    *
    * The sizing honors Spark's runtime-filter caps
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`,
    * defaults 4M items / 64 Mbit): a bench side beyond them gets a clamped
    * filter — a higher effective fpp, never a false negative.
    */
  def buildBloom(bench: DataFrame, textCol: String, n: Int,
      fpp: Double = 0.001): Array[Byte] = {
    val hashes = bench
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
      .select(xxhash64(col("gram")).as("h"))
    val expected = math.max(hashes.count(), 1L)
    val numBits = math.max(64L, BloomFilter.optimalNumOfBits(expected, fpp))
    val agg = GraftSqlShims.columnOf(new BloomFilterAggregate(
      GraftSqlShims.expressionOf(col("h")),
      GraftSqlShims.expressionOf(lit(expected)),
      GraftSqlShims.expressionOf(lit(numBits))).toAggregateExpression())
    // the aggregate evals to null over zero rows (empty bench): fall back
    // to an explicit empty filter so probes compile and never match
    Option(hashes.agg(agg).head().getAs[Array[Byte]](0)).getOrElse {
      val empty = BloomFilter.create(expected, fpp)
      val out = new java.io.ByteArrayOutputStream()
      empty.writeTo(out)
      out.toByteArray
    }
  }

  /** Bloom-filter decontamination — the 100 TB fast path. [[report]] already
    * avoids shuffling the corpus (broadcast hash join on bench grams), but it
    * still materializes every distinct corpus gram as a join-probe row and
    * ships the full bench gram STRINGS to every executor. Here the bench side
    * is collapsed to a constant-size bit set (~1.8 MB at one million grams /
    * 0.1% fpp) and the corpus pass is a pure map: per doc, count distinct
    * grams the filter might contain. ZERO shuffles, zero joins, zero UDFs —
    * the probe is Catalyst's `BloomFilterMightContain` over xxhash64 gram
    * hashes inside a higher-order filter, so the plan is scan → project and
    * composes into any curation funnel for free.
    *
    * EAGER at call time: this overload (re)builds the filter via
    * [[buildBloom]] — two actions on the small bench side per call. Use
    * `buildBloom` + the `Array[Byte]` overload to build once and reuse.
    *
    * Guarantee: Bloom filters have no false negatives, so per doc
    * `n_flagged >= n_overlap` ([[report]]'s exact count) and every exactly
    * contaminated doc is flagged; `fpp` bounds the per-gram false-positive
    * rate (the 64-bit xxhash64 pre-hash adds a ~2^-64 collision term, far
    * below any practical fpp). The standard deployment is bloom-first at
    * full scale, then the exact [[report]] on the (tiny) flagged slice —
    * compose the two with a semi-join on the flagged ids.
    */
  def reportBloom(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, fpp: Double = 0.001): DataFrame =
    reportBloom(docs, buildBloom(bench, textCol, n, fpp), idCol, textCol, n)

  /** [[reportBloom]] over a prebuilt [[buildBloom]] filter — fully lazy:
    * no bench-side scan, no driver action, just the map-side probe.
    */
  def reportBloom(docs: DataFrame, filterBytes: Array[Byte], idCol: String,
      textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol),
        flaggedGramCount(filterBytes, textCol, n).as("n_flagged"))
      .withColumn("contaminated", col("n_flagged") > 0)

  /** Column counting the doc's distinct n-grams the filter might contain.
    * Pure map-side Catalyst expressions end to end — usable on batch AND
    * streaming DataFrames alike.
    */
  private def flaggedGramCount(filterBytes: Array[Byte], textCol: String,
      n: Int): Column = {
    val flagged = filter(
      array_distinct(TextAnalysis.wordNgrams(col(textCol), n)),
      g => GraftSqlShims.columnOf(BloomFilterMightContain(
        GraftSqlShims.expressionOf(lit(filterBytes)),
        GraftSqlShims.expressionOf(xxhash64(g)))))
    // size(null) is null (null text has no grams): count it as zero, and
    // keep the column LONG as the exact report's n_overlap is
    coalesce(size(flagged).cast("long"), lit(0L))
  }

  /** Boolean flag column over a prebuilt [[buildBloom]] filter: true when
    * the doc MIGHT share an n-gram with the bench (superset of exact
    * contamination — no false negatives). Pure map-side Catalyst, batch and
    * streaming alike; the two-phase deployments ([[TextAnalysis.curateFull]],
    * [[graft.streaming.StreamOps.streamingCurate]]) flag with this at full
    * scale and exact-confirm only the flagged slice.
    */
  def flaggedCol(filterBytes: Array[Byte], textCol: String, n: Int): Column =
    flaggedGramCount(filterBytes, textCol, n) > lit(0L)

  /** Drop every doc that MIGHT share an n-gram with the benchmark —
    * conservative quarantine semantics: Bloom false positives (rate
    * bounded by `fpp` per gram) are dropped too; route the flagged slice
    * through [[report]] instead when exact confirmation matters (see
    * [[TextAnalysis.curateFull]]).
    *
    * Stateless and map-side, so it works UNCHANGED on a streaming
    * DataFrame: the filter is built once from the static bench side when
    * this is called (an EAGER bench-side action — see [[buildBloom]]) and
    * embedded in the plan; each micro-batch then filters with no state
    * store, no watermark and no shuffle — decontamination at ingest, in
    * line with the engine's batch/streaming parity.
    */
  def dropContaminated(docs: DataFrame, bench: DataFrame,
      textCol: String, n: Int, fpp: Double = 0.001): DataFrame =
    dropContaminated(docs, buildBloom(bench, textCol, n, fpp), textCol, n)

  /** [[dropContaminated]] over a prebuilt [[buildBloom]] filter — fully
    * lazy; the overload for callers sharing one filter across passes.
    */
  def dropContaminated(docs: DataFrame, filterBytes: Array[Byte],
      textCol: String, n: Int): DataFrame =
    docs.filter(flaggedGramCount(filterBytes, textCol, n) === 0L)

  /** PARAGRAPH-granularity decontamination: drop every document sharing a
    * whole (blank-line-delimited, trimmed) paragraph with the benchmark,
    * probing a [[Dedup.paragraphWriteBucketed]] index built over the EVAL
    * set. The complementary trade to the 13-gram gates: grams catch
    * partial/reworded overlap but need a Bloom bound or a heavy join;
    * whole-paragraph identity has ZERO false positives, and the eval-side
    * index is tiny (benchmarks are small by definition), so the probe is
    * one semi-join of the corpus' 16-byte paragraph hashes against a
    * pre-bucketed scan — followed by an id-keyed anti-join that drops
    * flagged documents whole (quarantine semantics, like
    * [[dropContaminated]]; not paragraph excision, which
    * [[Dedup.dedupParagraphsIncremental]] already provides).
    */
  def dropParagraphContaminated(docs: DataFrame, evalIndexTable: String,
      idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val flagged = Dedup.explodeParagraphs(docs, idCol, textCol)
      .select(col(idCol), md5(col("_para")).as("content_hash"))
      .join(spark.table(evalIndexTable).select(col("content_hash")),
        Seq("content_hash"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination — the fifth mode (exact n-gram / Bloom /
    * paragraph / fuzzy winnow / THIS): drop every corpus row whose
    * embedding reaches cosine `threshold` against ANY eval-set vector.
    * Catches the overlap the lexical modes cannot: paraphrased or
    * re-formatted benchmark items that embed next to their source (the
    * SemDeDup/decontamination argument of Abbas 2023 applied eval-side).
    *
    * Eval sets are small by definition, so the normalized eval side
    * BROADCASTS and the corpus is scanned once, each row scoring its
    * |eval| cosines map-side — a broadcast nested-loop threshold probe, no
    * corpus shuffle. The flagged-id set (contaminated rows only) is the
    * only thing that shuffles for the anti-join. For an eval set too big
    * to broadcast, build an IVF index over the EVAL set and probe with
    * [[Dedup.semanticDedupIncremental]] instead — same quarantine
    * semantics, cell-blocked recall trade.
    *
    * Zero-norm vectors on either side are skipped (cosine undefined —
    * 0/0), matching [[Dedup.cosinePairs]]: a zero-norm corpus row can
    * never be flagged.
    */
  def dropSemanticContaminated(corpus: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, evalVecCol: String,
      threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val ev = eval.select(col(evalVecCol).as("_ev"))
      .filter(expr("sqrt(graft_vec_dot(_ev, _ev))") > 0)
    val flagged = corpus
      .select(col(idCol), col(vecCol).as("_cv"))
      .filter(expr("sqrt(graft_vec_dot(_cv, _cv))") > 0)
      .crossJoin(broadcast(ev))
      .filter(Similarity.cosine("_cv", "_ev") >= threshold)
      .select(col(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
