package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match WordPiece segmentation (the BERT WordpieceTokenizer
  * inference step, Devlin et al. 2019) — the runtime counterpart to
  * [[graft.operators.Vocab.wordpieceTrain]]'s likelihood-gain training: at
  * each position take the LONGEST vocab piece prefixing the remainder,
  * mark every piece after the first with the `##` continuation prefix, and
  * if no piece matches (an out-of-vocabulary character) the WHOLE word
  * collapses to the `unk` token — BERT's all-or-nothing rule, not a
  * per-character fallback ([[UnigramSegment]] has the opposite contract:
  * its OOV floor makes segmentation total).
  *
  * The vocab rides INSIDE the expression (the [[NearestCentroid]]
  * broadcast-without-a-join discipline): one shared hash set per executor,
  * vocabularies are model-sized, never corpus-sized. Per-word cost is
  * O(len * maxPieceLen) substring probes; the expression is meant to run
  * over the DISTINCT-word dictionary, so the interpreted eval is
  * dictionary-bounded, the same boundedness argument as [[UnigramSegment]].
  * One vocab set serves both word-initial and continuation positions (the
  * repo's scheme; a full BERT vocab distinguishes `##`-entries — the
  * continuation marking here is applied on output).
  *
  * Determinism: at a fixed length at most one piece can prefix-match (two
  * equal-length prefixes of one string are equal), so the longest-match
  * pick needs no tie-break. Characters are UTF-16 units (corpus word
  * classes are BMP-only, see [[UnigramSegment]]).
  */
case class WordPieceMatch(child: Expression, vocab: Seq[String], unk: String)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece_match expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      var j = math.min(n, i + maxLen)
      var hit: String = null
      while (hit == null && j > i) {
        val cand = s.substring(i, j)
        if (table.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString(unk)))
      pieces += UTF8String.fromString(if (i == 0) hit else "##" + hit)
      i = j
    }
    new GenericArrayData(pieces.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceMatch =
    copy(child = newChild)
  override def prettyName: String = "graft_wordpiece_match"
}
