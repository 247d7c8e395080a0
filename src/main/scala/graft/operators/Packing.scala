package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data pipelines: assign every document a
  * (shard, pack_id, pack_pos) so downstream batch assembly can concatenate
  * documents into fixed-token-budget training sequences without a second
  * pass over the text.
  *
  * Scale design: documents are sharded by `id % shards`, so packing is
  * embarrassingly parallel across shards — ONE shuffle on the shard key,
  * then a per-shard running sum (rows-unbounded-preceding window, O(n)
  * streaming evaluation, no buffering). A single global ordering would
  * serialize the corpus through one partition; the shard count is the
  * parallelism knob (thousands at 100 TB). Assignment is deterministic in
  * the id order — identical across runs, retries and engines, which is what
  * makes it DuckDB-oracle-able.
  */
object Packing {

  /** Greedy-by-offset packing: within a shard, documents are laid end to end
    * in id order and a document belongs to the pack its FIRST token lands in
    * (`pack_id = floor(tokens_before / budget)`). A document longer than the
    * remaining pack space spills into the next pack rather than being
    * reordered — packing never changes document order, so data order stays
    * reproducible. `pack_pos` is the token offset of the document inside its
    * pack.
    */
  def packByBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    // explicit ROWS frame: the default for an ordered window is RANGE, under
    // which tied ids would share one cumulative sum (and lose the O(n)
    // streaming evaluation)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("_before",
        sum(col(tokenCol)).over(w).cast("long") - col(tokenCol).cast("long"))
      .withColumn("pack_id", floor(col("_before") / lit(budget.toDouble)))
      .withColumn("pack_pos", (col("_before") - col("pack_id") * budget).cast("long"))
      .drop("_before")
  }

  /** Boundary-SPLITTING packing — the published LLM-pretraining semantics:
    * within a shard, documents are concatenated in id order and the stream
    * is cut into packs of EXACTLY `budget` tokens, so a document that
    * straddles a boundary contributes a segment to each pack it spans
    * (every pack but a shard's last is exactly full — zero padding waste,
    * vs. [[packByBudget]] which keeps documents whole and pays the
    * fragmentation). Zero-token documents are dropped (they occupy no
    * stream positions).
    *
    * Output: one row per (document, pack) intersection —
    * (idCol, tokenCol, shard, seg_id, pack_id, pack_offset, doc_offset,
    * seg_len), where seg_id numbers a document's segments from 0,
    * doc_offset is the segment's start inside the document and pack_offset
    * its start inside the pack. Sum of seg_len over a document's rows ==
    * its token count; sum over a pack's rows == budget (except each
    * shard's final pack).
    *
    * Same scale shape as [[packByBudget]]: one shuffle on the shard key,
    * one O(n) running sum; the segment rows are generated ARITHMETICALLY
    * from (offset, length) — `posexplode(sequence(first_pack, last_pack))`
    * inside the projection, no join, no second pass, no text movement.
    */
  def packSegments(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(budget)
    df.filter(col(tokenCol) > 0)
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("_before",
        sum(col(tokenCol)).over(w).cast("long") - col(tokenCol).cast("long"))
      // packs spanned: floor(before/B) .. floor((before+len-1)/B)
      .select(col("*"),
        posexplode(sequence(floor(col("_before") / b),
          floor((col("_before") + col(tokenCol).cast("long") - 1) / b))))
      .withColumnRenamed("pos", "seg_id")
      .withColumnRenamed("col", "pack_id")
      .withColumn("doc_offset",
        greatest(lit(0L), col("pack_id") * b - col("_before")))
      .withColumn("pack_offset",
        greatest(lit(0L), col("_before") - col("pack_id") * b))
      .withColumn("seg_len",
        least(col(tokenCol).cast("long"), (col("pack_id") + 1) * b - col("_before"))
          - col("doc_offset"))
      .drop("_before")
  }
}
