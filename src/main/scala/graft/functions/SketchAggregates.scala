package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch (Misra & Gries 1982) as a Catalyst
  * `TypedImperativeAggregate` — approximate top-k terms in bounded memory.
  * The buffer is at most k counters regardless of input cardinality: a
  * groupBy-count top-k must shuffle one row per DISTINCT term (fine for
  * word vocabularies, ruinous for URL/13-gram/user-id spaces at 100 TB);
  * this sketch ships at most k counters per partition and merges them on
  * the driver-sized reduce side.
  *
  * Guarantees (the mergeable-summaries form, Agarwal et al. 2013): with
  * total stream length N, every estimate undercounts by at most N/(k+1)
  * (`f(t) - N/(k+1) <= est(t) <= f(t)`), so any term with true frequency
  * above N/(k+1) is guaranteed present in the final sketch. Both bounds
  * hold under arbitrary partitioning and merge order — the merge sums
  * counter maps and, when over k entries, subtracts the (k+1)-th largest
  * count from every counter (dropping non-positive ones), which is the
  * merge rule the theorem covers. The exact SET of tail counters can vary
  * with partition layout; the bounds and the heavy-term membership cannot
  * — which is what the oracled `_check` gate asserts.
  *
  * Output: `array<struct<term string, cnt long>>` sorted by (cnt desc,
  * term asc), at most k entries.
  */
case class MgTopK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"graft_mg_topk: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mg_topk expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf(t) = c + 1
        case None if buf.size < k => buf(t) = 1L
        case None =>
          // classic MG step: a (k+1)-th distinct term cancels one count of
          // every tracked term — O(k), and k is small by construction
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c <= 0) dead += key else buf(key) = c
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything (merge rule of
      // the mergeable-summaries theorem); non-positive counters drop
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { key =>
        val c = a(key) - d
        if (c <= 0) dead += key else a(key) = c
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf(new String(arr, StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgTopK =
    copy(child = newChild)
  override def prettyName: String = "graft_mg_topk"
}
