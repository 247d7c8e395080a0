package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram piece model (the
  * SentencePiece/Kudo 2018 decode step): the piece sequence maximizing the
  * sum of piece log-probabilities, found by an O(len * maxPieceLen) dynamic
  * program per word. The model rides INSIDE the expression (the
  * [[NearestCentroid]] broadcast-without-a-join discipline) — vocabularies
  * are model-sized, never corpus-sized.
  *
  * Unknown SINGLE characters fall back to `oovLogp` (a floor below every
  * real piece), so segmentation totals; unknown multi-character substrings
  * are not pieces. Determinism: the DP updates on strictly-greater only,
  * scanning split points left to right, so ties resolve to the longest
  * final piece — pinned by spec.
  *
  * Characters are UTF-16 units (the corpus word classes are BMP-only; a
  * supplementary character would segment as its two surrogates, both OOV).
  */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Double)],
    maxPieceLen: Int, oovLogp: Double)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_segment expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      dp(i) = Double.NegativeInfinity
      back(i) = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val lp =
          if (i - j == 1) {
            val got = table.get(s.substring(j, i))
            if (got == null) oovLogp else got.doubleValue()
          } else {
            val got = table.get(s.substring(j, i))
            if (got == null) Double.NaN else got.doubleValue()
          }
        if (!lp.isNaN && dp(j) + lp > dp(i)) {
          dp(i) = dp(j) + lp
          back(i) = j
        }
        j += 1
      }
      i += 1
    }
    // reconstruct right to left
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Any]
    var at = n
    while (at > 0) {
      val j = back(at)
      pieces += UTF8String.fromString(s.substring(j, at))
      at = j
    }
    new GenericArrayData(pieces.reverseIterator.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
  override def prettyName: String = "graft_unigram_segment"
}
