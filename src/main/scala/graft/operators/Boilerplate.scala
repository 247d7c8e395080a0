package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate detection: flag word n-grams that recur in
  * many documents (headers, footers, license blurbs, navigation chrome) and
  * score each document by the fraction of its distinct n-grams that are
  * corpus-wide boilerplate — the cross-document counterpart of the
  * within-document repetition signals in [[TextAnalysis.dupNgramFrac]]
  * (repeated-n-gram hygiene as published for C4 / Gopher / the
  * deduplicating-training-data line of work).
  *
  * Scale shape: one map-side HOF pass builds distinct grams per doc (no
  * UDF), locally checkpointed so neither the self-referencing hit join nor
  * the n_grams projection re-runs the tokenizer — the cached arrays are the
  * same order of magnitude as the input text, and the lineage truncation
  * also keeps the re-read off the source scan; the gram-frequency count is
  * a groupBy with map-side partial
  * aggregation, so the first shuffle carries combined (gram, count) rows,
  * not the exploded corpus. The hit join then reshuffles the exploded grams
  * once, keyed on gram — deliberately a join rather than a count-over-window
  * (the window form would shuffle the same rows but a stop-gram appearing in
  * every document would pin that gram's entire row set to one task with no
  * recourse, whereas AQE's skew-join splitting handles the hot gram key in
  * the join form). The per-doc rollup shuffles only hit rows. For corpora
  * where the gram strings dominate the wire, `hashGrams` replaces each gram
  * with its xxhash64 before the shuffles — counts are unchanged up to
  * 64-bit collisions and the rows shrink to (id, 8 bytes).
  */
object Boilerplate {

  /** Per-document boilerplate report: one row per input doc —
    * `(idCol, n_grams, n_frequent, boilerplate_frac)` where `n_grams` counts
    * the doc's DISTINCT word n-grams, `n_frequent` counts those occurring in
    * at least `minDocs` documents (self included), and `boilerplate_frac` is
    * their ratio rounded to 6 places (0.0 for docs with fewer than `n`
    * words). Callers typically quarantine docs above a fraction threshold or
    * strip the flagged grams; keeping the full report makes the pass
    * auditable.
    */
  def report(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minDocs: Int, hashGrams: Boolean = false): DataFrame = {
    require(minDocs >= 1, s"Boilerplate: minDocs must be >= 1, got $minDocs")
    // Tokenize + slice once per doc; the checkpoint pins that single HOF
    // pass so the three consumers below (frequency count, hit probe, n_grams
    // projection) re-read the cached gram arrays instead of re-deriving them
    // from text.
    val perDoc = docs.select(col(idCol),
      array_distinct(TextAnalysis.wordNgrams(col(textCol), n)).as("grams"))
      .localCheckpoint(eager = false)
    // explode must be the top-level projection expression (a generator can't
    // nest under xxhash64), so hash in a follow-up select — it collapses
    // into the same stage
    val exploded = perDoc.select(col(idCol), explode(col("grams")).as("gram"))
    val docGrams =
      if (hashGrams) exploded.select(col(idCol), xxhash64(col("gram")).as("gram"))
      else exploded
    val frequent = docGrams
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs")) // grams are distinct per doc => doc count
      .filter(col("n_docs") >= minDocs)
      .select(col("gram"))
    val hits = docGrams.join(frequent, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frequent"))
    perDoc
      .select(col(idCol), size(col("grams")).cast("long").as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_frequent"), lit(0L)).as("n_frequent"),
        when(col("n_grams") > 0,
          round(coalesce(col("n_frequent"), lit(0L)).cast("double")
            / col("n_grams").cast("double"), 6))
          .otherwise(lit(0.0)).as("boilerplate_frac"))
  }
}
