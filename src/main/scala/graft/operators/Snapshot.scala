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
}
