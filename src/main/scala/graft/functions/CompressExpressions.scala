package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signals. The DEFLATE length of a document is
  * the classic two-tailed garbage detector (used by the Gopher/RefinedWeb
  * filter lineage): highly repetitive text (boilerplate, keyword stuffing)
  * compresses far below natural prose, while random-looking bytes
  * (minified blobs, encodings, binary spill) barely compress at all —
  * natural language sits in a stable band between the tails. Both are
  * per-row byte loops over data already in the scan: no shuffle, no UDF
  * registry, deterministic for a given zlib build (tests and gates assert
  * ORDERINGS between planted entropy classes, never raw byte counts).
  */
object CompressOps {

  /** DEFLATE (zlib raw, fixed level) output length of `bytes`. A fresh
    * Deflater per call: the expression must be thread-safe under
    * whole-stage codegen's row loop, and the allocation is dwarfed by the
    * deflate itself.
    */
  def deflateLength(bytes: Array[Byte], level: Int): Int = {
    val d = new Deflater(level, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Shannon entropy of the BYTE distribution, in bits per byte [0, 8]. */
  def byteEntropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val counts = new Array[Int](256)
    bytes.foreach(b => counts(b & 0xff) += 1)
    val n = bytes.length.toDouble
    var h = 0.0
    var i = 0
    while (i < 256) {
      if (counts(i) > 0) {
        val p = counts(i) / n
        h -= p * (math.log(p) / math.log(2.0))
      }
      i += 1
    }
    h
  }

  private[functions] def toBytes(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }
}

/** `graft_deflate_len(text|binary)` -> int. CodegenFallback: the deflate
  * loop dominates the virtual-call overhead (same economics as the
  * MinHash / Gear expressions).
  */
case class DeflateLength(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  require(level >= 1 && level <= 9, s"deflate level out of range: $level")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects string or binary, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    CompressOps.deflateLength(CompressOps.toBytes(v), level)
  override protected def withNewChildInternal(c: Expression): DeflateLength =
    copy(child = c)
  override def prettyName: String = "graft_deflate_len"
}

/** `graft_byte_entropy(text|binary)` -> double, bits per byte in [0, 8]. */
case class ByteEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_entropy expects string or binary, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    CompressOps.byteEntropy(CompressOps.toBytes(v))
  override protected def withNewChildInternal(c: Expression): ByteEntropy =
    copy(child = c)
  override def prettyName: String = "graft_byte_entropy"
}
