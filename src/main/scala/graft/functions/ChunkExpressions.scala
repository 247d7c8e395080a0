package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Content-defined chunking over binary payloads — Gear hashing (Xia et al.
  * 2016, "FastCDC: a Fast and Efficient Content-Defined Chunking Approach
  * for Data Deduplication"; the single-mask Gear form of Xia et al. 2005's
  * DDFS lineage). Chunk boundaries are a function of CONTENT, not offset:
  * an insertion early in a payload shifts every fixed-size block but only
  * the chunks overlapping the edit under CDC — boundaries re-synchronize as
  * soon as the 64-byte rolling window clears the edit. That is what makes
  * chunk-level dedup of multimodal payloads work: re-encoded containers
  * with small header edits still share almost all their chunk fingerprints.
  *
  * The rolling hash is `h = (h << 1) + gear(byte)` — the shift expires a
  * byte's influence after 64 steps, giving a 64-byte window with one add
  * per byte (no expensive mod like Rabin). A boundary is declared when
  * `(h & mask) == 0` once `minSize` bytes have accrued, and forced at
  * `maxSize`. The gear table is 256 splitmix64 values from a fixed seed —
  * deterministic everywhere. Chunk fingerprints are FNV-1a 64 over the
  * chunk's bytes.
  */
object GearOps {

  /** splitmix64 (Steele et al. 2014) — same mixer family the MinHash lanes
    * use; fixed-seed table so chunking is reproducible across runs/engines.
    */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val gearTable: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))

  /** FNV-1a 64 over bytes[from, until). */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001B3L
      i += 1
    }
    h
  }

  /** Chunk `bytes` by Gear CDC; returns array<struct<length:int, fp:bigint>>
    * rows. The chunk lengths partition the payload exactly (sum == input
    * length — the oracled reconstruction invariant); every chunk is
    * <= maxSize, and only the final chunk may be shorter than minSize.
    */
  def chunkRows(bytes: Array[Byte], minSize: Int, maxSize: Int,
      maskBits: Int): GenericArrayData = {
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gearTable(bytes(i) & 0xff)
      i += 1
      val size = i - start
      if ((size >= minSize && (h & mask) == 0L) || size >= maxSize) {
        out += new GenericInternalRow(Array[Any](size, fnv1a64(bytes, start, i)))
        start = i
        h = 0L
      }
    }
    if (start < bytes.length) {
      out += new GenericInternalRow(
        Array[Any](bytes.length - start, fnv1a64(bytes, start, bytes.length)))
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_gear_chunks(payload)` -> array<struct<length:int, fp:bigint>>.
  * CodegenFallback: the per-row byte loop dominates the virtual-call
  * overhead, same economics as the MinHash/SimHash expressions.
  */
case class GearChunks(child: Expression, minSize: Int, maxSize: Int,
    maskBits: Int) extends UnaryExpression with CodegenFallback {
  require(minSize >= 1 && maxSize >= minSize,
    s"need 1 <= minSize <= maxSize, got ($minSize, $maxSize)")
  require(maskBits >= 1 && maskBits <= 48, s"maskBits out of range: $maskBits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gear_chunks expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("length", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GearOps.chunkRows(v.asInstanceOf[Array[Byte]], minSize, maxSize, maskBits)
  override protected def withNewChildInternal(c: Expression): GearChunks =
    copy(child = c)
  override def prettyName: String = "graft_gear_chunks"
}
