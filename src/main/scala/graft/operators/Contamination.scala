package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
      textCol: String, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
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

  /** Bloom-filter decontamination — the 100 TB fast path. [[report]] already
    * avoids shuffling the corpus (broadcast hash join on bench grams), but it
    * still materializes every distinct corpus gram as a join-probe row and
    * ships the full bench gram STRINGS to every executor. Here the bench side
    * is collapsed to a constant-size bit set (`DataFrameStatFunctions
    * .bloomFilter`, ~1.2 MB at one million grams / 0.1% fpp) and the corpus
    * pass is a pure map: per doc, count distinct grams the filter might
    * contain. ZERO shuffles, zero joins — the plan is scan → project,
    * so it composes into any curation funnel for free.
    *
    * Guarantee: Bloom filters have no false negatives, so per doc
    * `n_flagged >= n_overlap` ([[report]]'s exact count) and every exactly
    * contaminated doc is flagged; `fpp` bounds the per-gram false-positive
    * rate. The standard deployment is bloom-first at full scale, then the
    * exact [[report]] on the (tiny) flagged slice — compose the two with a
    * semi-join on the flagged ids.
    */
  def reportBloom(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, fpp: Double = 0.001): DataFrame =
    docs
      .select(col(idCol),
        flaggedGramCount(bench, textCol, n, fpp).as("n_flagged"))
      .withColumn("contaminated", col("n_flagged") > 0)

  /** Column counting the doc's distinct n-grams that might be in `bench`,
    * against a Bloom filter built ONCE (an eager batch action on the small
    * bench side) and broadcast. Pure map-side — usable on batch AND
    * streaming DataFrames alike.
    */
  private def flaggedGramCount(bench: DataFrame, textCol: String, n: Int,
      fpp: Double): Column = {
    val benchGrams = bench
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    // one aggregate over the small side to size the filter honestly; the
    // builder itself is a treeAggregate of fixed-size bit sets
    val expected = math.max(benchGrams.count(), 1L)
    val filter = benchGrams.stat.bloomFilter("gram", expected, fpp)
    val bcFilter = bench.sparkSession.sparkContext.broadcast(filter)
    val nFlagged = udf { grams: Seq[String] =>
      if (grams == null) 0L else grams.count(bcFilter.value.mightContain).toLong
    }
    nFlagged(array_distinct(TextAnalysis.wordNgrams(col(textCol), n)))
  }

  /** Drop every doc that MIGHT share an n-gram with the benchmark —
    * conservative quarantine semantics: Bloom false positives (rate
    * bounded by `fpp` per gram) are dropped too; route the flagged slice
    * through [[report]] instead when exact confirmation matters (see
    * [[TextAnalysis.curateFull]]).
    *
    * Stateless and map-side, so it works UNCHANGED on a streaming
    * DataFrame: the filter is built once from the static bench side at
    * plan time and broadcast; each micro-batch then filters with no
    * state store, no watermark and no shuffle — decontamination at
    * ingest, in line with the engine's batch/streaming parity.
    */
  def dropContaminated(docs: DataFrame, bench: DataFrame,
      textCol: String, n: Int, fpp: Double = 0.001): DataFrame =
    docs
      .withColumn("_graft_flagged", flaggedGramCount(bench, textCol, n, fpp))
      .filter(col("_graft_flagged") === 0L)
      .drop("_graft_flagged")
}
