package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot comparison — the dataset-versioning primitive: between
  * two epochs of the same corpus, which documents were added, removed, or
  * changed? The per-epoch ingest runbook diffs the curated corpus against
  * the previous snapshot to audit what a pipeline change actually did
  * before a training run consumes it.
  *
  * Scale: each side is reduced to (id, md5(text)) IN the scan projection —
  * the text never survives past its own scan, so the full-outer join
  * shuffles two narrow (id, 32-hex) streams, not document bodies. At 100 TB
  * both snapshots would be stored bucketed by id, making the join
  * exchange-free; the md5 fingerprint also short-circuits the comparison
  * (no byte-wise text compare across the wire).
  */
object Snapshot {

  /** Row-level diff of two snapshots keyed by `idCol`, comparing content by
    * md5(`textCol`). Output: (idCol, status) for every row whose status is
    * not 'unchanged' — 'added' (only in `next`), 'removed' (only in `prev`),
    * 'changed' (both, different fingerprint).
    */
  def corpusDiff(prev: DataFrame, next: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = prev.select(col(idCol).as("_oid"), md5(col(textCol)).as("_ofp"))
    val n = next.select(col(idCol).as("_nid"), md5(col(textCol)).as("_nfp"))
    o.join(n, o("_oid") === n("_nid"), "full_outer")
      .select(coalesce(col("_oid"), col("_nid")).as(idCol),
        when(col("_oid").isNull, "added")
          .when(col("_nid").isNull, "removed")
          // null-SAFE inequality: a text that changed to/from NULL is a
          // real change — plain =!= yields NULL there and the when-chain
          // would fall through to "unchanged", hiding it from the audit
          .when(!(col("_ofp") <=> col("_nfp")), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Aggregate view of [[corpusDiff]]: one row per status with counts —
    * the headline numbers an operator reads per epoch.
    */
  def diffSummary(prev: DataFrame, next: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpusDiff(prev, next, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Estimated pairwise key overlap between the corpus's sources — the
    * dedup-PLANNING number ("how much of source B is already in source A",
    * asked before scheduling any cross-source dedup) at sketch cost: one
    * corpus pass builds a DataSketches HLL per source (`hll_sketch_agg`,
    * mergeable map-side partials), and every pairwise union merges two
    * kilobyte sketches — k sources cost one scan plus k^2 sketch merges,
    * never a join of the corpora. Output per unordered pair
    * (source_a < source_b): both distinct estimates, the union estimate,
    * `overlap_est` = a + b - union (inclusion-exclusion, clamped at 0) and
    * `jaccard_est` = overlap / union. Estimates are exact while a source's
    * sketch stays in sparse mode and carry ~1% HLL error beyond (default
    * lgK) — right for deciding WHICH dedup to run, never a substitute for
    * running it. Deterministic: the sketch hash is seed-fixed, so the same
    * corpus always reports the same estimates.
    */
  def sourceOverlap(df: DataFrame, sourceCol: String,
      keyCol: String): DataFrame = {
    val sk = df.groupBy(col(sourceCol).as("_src"))
      .agg(hll_sketch_agg(col(keyCol)).as("_sk"))
    val a = sk.select(col("_src").as("source_a"), col("_sk").as("_ska"))
    val b = sk.select(col("_src").as("source_b"), col("_sk").as("_skb"))
    a.crossJoin(b).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        hll_sketch_estimate(col("_ska")).as("n_a"),
        hll_sketch_estimate(col("_skb")).as("n_b"),
        hll_sketch_estimate(hll_union(col("_ska"), col("_skb"))).as("n_union"))
      .withColumn("overlap_est",
        greatest(lit(0L), col("n_a") + col("n_b") - col("n_union")))
      .withColumn("jaccard_est",
        round(col("overlap_est").cast("double") / col("n_union"), 6))
  }

  /** Per-source corpus DATASHEET (Gebru 2021 "Datasheets for Datasets" —
    * the composition/profile section, generated not hand-written): one row
    * per source with document/token mass, length percentiles, mean quality,
    * exact-duplication rate and language mix entropy. The governance
    * artifact that ships WITH a corpus snapshot; every column is an exact
    * aggregate (hash-oracled), not a sketch.
    *
    * One scan: all columns fold into a single groupBy(source) — tokens,
    * quality and md5 are computed in the scan projection; the exact
    * percentile and distinct-hash count keep per-group state bounded by
    * group size, and the language entropy folds the per-(source, lang)
    * counts gathered by a first tiny aggregate. At 100 TB the shuffle
    * carries one partial-aggregate row per (source, partition).
    */
  def datasheet(docs: DataFrame, sourceCol: String, langCol: String,
      textCol: String): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"), col(langCol).as("_lang"),
      TextAnalysis.tokenCount(col(textCol)).as("_toks"),
      length(col(textCol)).as("_chars"),
      TextAnalysis.qualityScore(textCol).as("_q"),
      md5(col(textCol)).as("_h"))
    val main = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_toks")).as("n_tokens"),
      // rounded DOUBLE, not an integer cast: CAST-to-long truncates toward
      // zero in Spark while DuckDB's CAST(... AS BIGINT) rounds to nearest,
      // so an even-count group with an X.5 interpolated median would diverge
      // between engine and oracle. round(...,6) is engine-agnostic (the
      // text_stats discipline).
      round(percentile(col("_chars"), lit(0.5)), 6).as("p50_chars"),
      round(avg(col("_q")), 6).as("mean_quality"),
      countDistinct(col("_h")).as("_distinct"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("_distinct").cast("double") / col("n_docs"), 6))
    // entropy over the (source, lang) count table — |sources| x |langs|
    // rows; a plain re-aggregate, no window (the mixture-ops discipline)
    val sl = base.groupBy(col("source"), col("_lang"))
      .agg(count(lit(1)).as("_c"))
    val stot = sl.groupBy(col("source")).agg(sum(col("_c")).as("_t"))
    val langEnt = sl.join(stot, Seq("source"))
      .select(col("source"), (col("_c").cast("double") / col("_t")).as("_p"))
      .groupBy(col("source"))
      .agg(round(-sum(col("_p") * log2(col("_p"))), 6).as("lang_entropy"))
    main.join(langEnt, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("p50_chars"),
        col("mean_quality"), col("dup_rate"), col("lang_entropy"))
  }

  /** Unigram-distribution DRIFT between two corpus snapshots — the
    * governance question before retraining a tokenizer or reweighting a
    * mixture: "did the word distribution move?". KL(new || old) over the
    * OLD snapshot's top-`k` vocabulary (count desc, word asc — total order,
    * no ties) with add-one smoothing on both sides, plus the new snapshot's
    * out-of-vocabulary token mass.
    *
    * 100 TB shape: both corpora compress to vocabulary-sized count tables
    * map-side (one partial-aggregated shuffle each); the top-k is a bounded
    * TakeOrdered; every later join/aggregate runs over <= k rows broadcast.
    * KL is exact (not sketched) and fully SQL-expressible, so the gate is
    * hash-oracled. Output 1 row:
    * (n_vocab, kl_new_vs_old, oov_mass_new).
    */
  def unigramDrift(old: DataFrame, next: DataFrame, textCol: String,
      k: Int): DataFrame = {
    def toks(df: DataFrame) =
      df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("_w"))
        .filter(col("_w") =!= "")
    val vocab = toks(old).groupBy(col("_w"))
      .agg(count(lit(1)).as("_co"))
      .orderBy(col("_co").desc, col("_w")).limit(k)
    val newCnt = toks(next).groupBy(col("_w"))
      .agg(count(lit(1)).as("_cn"))
    val newTotAll = newCnt.agg(sum(col("_cn")).as("_tn_all"))
    // V-restricted counts; absent-in-new vocab words still contribute their
    // smoothed mass, hence the LEFT join from the vocabulary side
    val joined = vocab.join(newCnt, Seq("_w"), "left")
      .select(col("_w"), col("_co"),
        coalesce(col("_cn"), lit(0L)).as("_cn"))
    val tot = joined.agg(sum(col("_co")).as("_to"), sum(col("_cn")).as("_tv"),
      count(lit(1)).as("_k"))
    joined.crossJoin(broadcast(tot)).crossJoin(broadcast(newTotAll))
      .select(
        ((col("_cn") + 1).cast("double") / (col("_tv") + col("_k")))
          .as("_pn"),
        ((col("_co") + 1).cast("double") / (col("_to") + col("_k")))
          .as("_po"),
        col("_k"), col("_tv"), col("_tn_all"))
      .agg(max(col("_k")).as("n_vocab"),
        round(sum(col("_pn") * log(col("_pn") / col("_po"))), 6)
          .as("kl_new_vs_old"),
        round(lit(1.0) - max(col("_tv")).cast("double") /
          greatest(max(col("_tn_all")), lit(1L)).cast("double"), 6)
          .as("oov_mass_new"))
  }
}
