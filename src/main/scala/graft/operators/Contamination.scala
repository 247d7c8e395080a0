package graft.operators

import org.apache.spark.sql.DataFrame
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
}
