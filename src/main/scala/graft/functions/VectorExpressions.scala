package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketch/vector hot loops.
  *
  * The higher-order-function formulations (aggregate/transform/zip_with) are
  * correct but interpret a closure per array element — a 64-hash MinHash over
  * 50 shingles costs ~3200 lambda evaluations per row. These expressions do
  * the same work in one tight JVM loop per row. They use CodegenFallback:
  * the per-row virtual-call overhead is negligible against the per-row loop,
  * so they don't meaningfully break whole-stage codegen economics, and every
  * input/output is a plain Catalyst array — no UDF boxing.
  *
  * Measured effect (sf0.1, local[32]): dedup_simhash 20s -> sub-second-class,
  * dedup_jaccard 17s -> ~1s, see BENCH notes.
  */
object VectorOps {

  /** splitmix64 finalizer-style mix of a base hash with a seed lane. */
  @inline def mix(h: Long, lane: Int): Long = {
    var z = h ^ (0x9E3779B97F4A7C15L * (lane + 1))
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Byte offsets of the first `n` code-point starts in UTF-8 `bytes`,
    * plus the terminal offset at index n — one linear walk, shared by the
    * trigram expressions.
    */
  def charStarts(bytes: Array[Byte], n: Int): Array[Int] = {
    val starts = new Array[Int](n + 1)
    var b = 0
    var c = 0
    while (c < n) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    starts(n) = bytes.length
    starts
  }

  /** k-lane MinHash signature from per-shingle base hashes. */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val m = mix(h, j)
        if (m < out(j)) out(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash from per-token base hashes (bit-vote sign). */
  def simhash64(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Jaccard similarity of two SORTED string arrays (merge-count). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val (na, nb) = (a.numElements(), b.numElements())
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Jaccard similarity of two SORTED long arrays — primitive merge, no
    * string materialization per pair.
    */
  def jaccardSortedLong(a: ArrayData, b: ArrayData): Double = {
    val (na, nb) = (a.numElements(), b.numElements())
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val (x, y) = (a.getLong(i), b.getLong(j))
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Dot product of two float arrays, accumulated in double. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** Dot product of two double arrays. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Per-token xxh64 (seed 42, matching Spark's xxhash64 function) of the
    * lowercased whitespace tokens — multiset order preserved (SimHash needs
    * duplicate votes; contrast shingleHashes, which sorts and dedupes).
    */
  def wordHashes(text: UTF8String): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+")
    val out = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val u = UTF8String.fromString(tokens(i))
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct hashes of word n-gram shingles, in one pass: lowercase,
    * whitespace-split, xxh64 each word once, then each shingle hash is a mix
    * chain over n consecutive word hashes — no n-gram strings are ever
    * built. n = 1 gives the word-set hashes used for set Jaccard.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+")
    val wh = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val u = UTF8String.fromString(tokens(i))
      wh(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    val m = math.max(tokens.length - n + 1, 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      // mix the first word hash before chaining: starting from the raw hash
      // would make `c ^ wh(i+1)` commutative in the first two words, so
      // word-transposed shingles ("a b c" vs "b a c") would collide
      var c = mix(wh(i), 0)
      var j = 1
      while (j < n && i + j < wh.length) { c = mix(c ^ wh(i + j), j); j += 1 }
      out(i) = c
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Hyperplane components for nBits planes over dim dimensions, flattened
    * [bit * dim + d]: r_i(d) = mix(d, i) mapped to [-1, 1] — deterministic,
    * no fitted model. Computed once per (nBits, dim), not per row.
    */
  def lshPlanes(nBits: Int, dim: Int): Array[Double] = {
    val planes = new Array[Double](nBits * dim)
    var i = 0
    while (i < nBits) {
      var d = 0
      while (d < dim) {
        planes(i * dim + d) = mix(d.toLong, i).toDouble / 9.223372036854776e18
        d += 1
      }
      i += 1
    }
    planes
  }

  /** Random-hyperplane LSH bucket: bit i = sign of dot(v, r_i) with
    * precomputed `planes` (lshPlanes(nBits, v.numElements)).
    */
  def lshBucket(v: ArrayData, nBits: Int, planes: Array[Double], isFloat: Boolean): Long = {
    val n = v.numElements()
    var bucket = 0L
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      val off = i * n
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        acc += x * planes(off + d)
        d += 1
      }
      if (acc > 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }
}

case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.minhashSig(v.asInstanceOf[ArrayData], k)
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "graft_minhash_sig"
}

case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorOps.simhash64(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "graft_simhash64"
}

case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def isLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) |
         (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard_sorted expects two array<string> or two array<bigint>, got " +
        s"${a.catalogString} and ${b.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong) VectorOps.jaccardSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorOps.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
  override def prettyName: String = "graft_jaccard_sorted"
}

/** Dot product over array<float> or array<double> (both sides must match). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_vec_dot expects two array<float> or two array<double>, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat) VectorOps.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorOps.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  // codegen mirrors dotF/dotD EXACTLY (min length, index-order double
  // accumulation) — dozens of oracled queries depend on bit-identical
  // cosines, so the generated loop is the same arithmetic, just inside
  // whole-stage codegen: the brute/LSH/IVF scoring joins are pair-per-row
  // dot products where CodegenFallback's per-pair virtual call is real
  // overhead. Compile-verified by graft.tools.CodegenCheck (CODEGEN_ONLY,
  // fallback disabled).
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    val castL = if (isFloat) "(double) " else ""
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $castL$a.$getter($i) * $castL$b.$getter($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "graft_vec_dot"
}

/** Sorted distinct word-n-gram shingle hashes of a string, single pass. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.shingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "graft_shingle_hashes"
}

/** Character trigrams of lowercased, trimmed text — the tight-loop form of
  * the `transform(sequence(...), i -> substr(...))` HOF in
  * [[graft.operators.LanguageModel]], which interprets a lambda per
  * character position. Bit-compatible by construction: it uses the same
  * `UTF8String.trim` / `UTF8String.toLowerCase` Spark's `trim`/`lower`
  * call, and code-point windows like Spark's `substr` (one boundary walk
  * over the bytes, not a per-gram scan — O(len), not O(len^2)). Parity
  * with the HOF formulation is asserted in OperatorsSpec.
  */
case class CharTrigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_trigrams expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  // NOT null-safe: the HOF formulation this replaces maps null text to an
  // EMPTY array (its when() falls through to the otherwise branch), and
  // drop-in parity is the contract
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val s = v.asInstanceOf[UTF8String].trim().toLowerCase()
    val n = s.numChars()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes
    val starts = VectorOps.charStarts(bytes, n)
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CharTrigrams = copy(child = c)
  override def prettyName: String = "graft_char_trigrams"
}

/** BPE-ish token count — the tight-loop form of
  * `size(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]', 0))`:
  * maximal ASCII-alphanumeric runs count once, every other
  * non-whitespace code point counts alone. One pass over the UTF-8
  * bytes; multi-byte characters are single tokens by construction, so
  * they never need decoding. Whitespace is Java regex `\s`
  * (space, \t, \n, \x0B, \f, \r) to match the regex formulation exactly
  * (parity asserted in OperatorsSpec).
  */
case class BpeishCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpeish_count expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var i = 0
    var cnt = 0
    var prevAlnum = false
    while (i < bytes.length) {
      val nb = UTF8String.numBytesForFirstByte(bytes(i))
      if (nb == 1) {
        val c = bytes(i) & 0xff
        val alnum = (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
          (c >= 'a' && c <= 'z')
        if (alnum) {
          if (!prevAlnum) cnt += 1
          prevAlnum = true
        } else {
          prevAlnum = false
          if (c != ' ' && c != '\t' && c != '\n' && c != 0x0B && c != '\f' &&
            c != '\r') cnt += 1
        }
      } else {
        prevAlnum = false
        cnt += 1
      }
      i += nb
    }
    cnt
  }
  override protected def withNewChildInternal(c: Expression): BpeishCount = copy(child = c)
  override def prettyName: String = "graft_bpeish_count"
}

/** Map-side character-trigram LM scorer: per document, the trigram count
  * and the exact integer sum of quantized negative log-probs against a
  * BROADCAST model (alphabet-bounded — see
  * [[graft.operators.LanguageModel]]). Replaces the explode → broadcast
  * join → per-doc re-aggregate scoring pipeline with one pass over the
  * text: no per-gram rows exist anywhere, so a 100 TB corpus is scored
  * with zero scoring-side shuffle. Same arithmetic as the join
  * formulation (integer sums are order-free), asserted equal in
  * OperatorsSpec.
  */
case class TrigramScore(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[Map[String, Long]],
    oovNlpQ: Long)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_score expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("nlp_sum", LongType, nullable = false)))
  // UTF8String-keyed view of the broadcast model, built once per instance
  // (per task at worst) so gram lookups allocate no strings
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](model.value.size * 2)
    model.value.foreach { case (k, q) => m.put(UTF8String.fromString(k), q) }
    m
  }
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].trim().toLowerCase()
    val n = s.numChars()
    if (n < 3) return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L))
    val bytes = s.getBytes
    val starts = VectorOps.charStarts(bytes, n)
    var sum = 0L
    var i = 0
    while (i < n - 2) {
      val g = UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i))
      val q = table.get(g)
      sum += (if (q == null) oovNlpQ else q.longValue())
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((n - 2).toLong, sum))
  }
  override protected def withNewChildInternal(c: Expression): TrigramScore = copy(child = c)
  override def prettyName: String = "graft_trigram_score"
}

/** The Kneser-Ney backoff tables that ride next to the trigram map in
  * [[TrigramScoreBackoff]]'s broadcast: per-level quantized negative
  * log-probabilities (`round(-ln(x) * 1e6)`), so chained backoff scores
  * are integer SUMS of independently-quantized factors — deterministic in
  * any evaluation order, and restatable join-side and in SQL. Keys:
  * `ctx` by the 2-char prefix (the context's freed-mass weight
  * `D*N1+(ab.)/c(ab.)`), `cbg` by the 2-char suffix (the continuation
  * bigram probability), `blam` by the middle char (the continuation
  * level's own freed mass `D*N1+(b.)/N1+(.b.)`), `uni` by the last char
  * (the continuation unigram). All four are alphabet-bounded like the
  * trigram model itself (|A|^2 / |A|^2 / |A| / |A| rows).
  */
case class KnBackoffMaps(ctx: Map[String, Long], cbg: Map[String, Long],
    blam: Map[String, Long], uni: Map[String, Long]) extends Serializable

/** [[TrigramScore]] completed with the interpolated-KN backoff chain for
  * UNSEEN grams (Chen & Goodman 1999 §3; the flat-OOV scorer treats every
  * unseen gram as equally improbable, which mis-ranks eval text whose
  * grams are unseen-but-plausible continuations). Per gram `abc`:
  *
  *   seen abc                      -> tri(abc)
  *   else, ab seen                 -> ctx(ab) + Pc-chain(bc)
  *   else (ab unseen, no mass to
  *   discount: pure backoff)       -> Pc-chain(bc)
  *
  *   Pc-chain(bc): cbg(bc) if seen; else blam(b) + uni(c) if both seen;
  *   else uni(c) if c seen; else the flat `oovNlpQ` — and a missing
  *   Pc-chain makes the whole gram cost `oovNlpQ` (never a bare lambda).
  *
  * The identical chain is restated with joins in
  * [[graft.operators.LanguageModel]]'s size-guard fallback and pinned
  * equal by spec.
  */
case class TrigramScoreBackoff(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[Map[String, Long]],
    backoff: org.apache.spark.broadcast.Broadcast[KnBackoffMaps],
    oovNlpQ: Long)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_score_backoff expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("nlp_sum", LongType, nullable = false)))
  private def toTable(m: Map[String, Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val t = new java.util.HashMap[UTF8String, java.lang.Long](m.size * 2)
    m.foreach { case (k, q) => t.put(UTF8String.fromString(k), q) }
    t
  }
  @transient private lazy val tri = toTable(model.value)
  @transient private lazy val ctx = toTable(backoff.value.ctx)
  @transient private lazy val cbg = toTable(backoff.value.cbg)
  @transient private lazy val blam = toTable(backoff.value.blam)
  @transient private lazy val uni = toTable(backoff.value.uni)
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].trim().toLowerCase()
    val n = s.numChars()
    if (n < 3) return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L))
    val bytes = s.getBytes
    val starts = VectorOps.charStarts(bytes, n)
    var sum = 0L
    var i = 0
    while (i < n - 2) {
      val g = UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i))
      val q = tri.get(g)
      if (q != null) sum += q.longValue()
      else {
        val ab = UTF8String.fromBytes(bytes, starts(i), starts(i + 2) - starts(i))
        val bc = UTF8String.fromBytes(bytes, starts(i + 1), starts(i + 3) - starts(i + 1))
        val c = UTF8String.fromBytes(bytes, starts(i + 2), starts(i + 3) - starts(i + 2))
        // continuation chain: cbg, else blam+uni, else uni, else miss
        val pcbg = cbg.get(bc)
        val chain: java.lang.Long =
          if (pcbg != null) pcbg
          else {
            val b = UTF8String.fromBytes(bytes, starts(i + 1),
              starts(i + 2) - starts(i + 1))
            val l1 = blam.get(b)
            val p1 = uni.get(c)
            if (l1 != null && p1 != null) java.lang.Long.valueOf(l1 + p1)
            else if (p1 != null) p1
            else null
          }
        val l2 = ctx.get(ab)
        sum +=
          (if (chain == null) oovNlpQ
           else if (l2 != null) l2.longValue() + chain.longValue()
           else chain.longValue())
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((n - 2).toLong, sum))
  }
  override protected def withNewChildInternal(c: Expression): TrigramScoreBackoff = copy(child = c)
  override def prettyName: String = "graft_trigram_score_backoff"
}

/** Unicode NFC normalization (java.text.Normalizer) — canonical composition
  * so visually-identical strings (e.g. 'é' as U+00E9 vs 'e'+U+0301) hash,
  * dedup and join identically. Map-side scalar; DuckDB's nfc_normalize is
  * the cross-engine oracle.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = child.dataType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // isNormalized is a cheap scan; ASCII and already-composed text (the
    // overwhelmingly common case) skips the allocation entirely
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "graft_nfc"
}

/** Multiset word-token hashes of a string (for SimHash votes), single pass. */
case class WordHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_hashes expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.wordHashes(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): WordHashes = copy(child = c)
  override def prettyName: String = "graft_word_hashes"
}

/** Deterministic random-hyperplane LSH bucket over array<float>/<double>. */
case class LshBucket(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_bucket expects array<float> or array<double>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  // hyperplanes cached per (nBits, dim) — rebuilt only if the vector width
  // changes (rebuilt per executor after serialization, once)
  @transient private var planes: Array[Double] = _
  @transient private var planesDim: Int = -1
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (planes == null || planesDim != dim) {
      planes = VectorOps.lshPlanes(nBits, dim)
      planesDim = dim
    }
    VectorOps.lshBucket(arr, nBits, planes, isFloat)
  }
  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
  override def prettyName: String = "graft_lsh_bucket"
}

/** Indices of the `n` nearest coarse-quantizer centroids (IVF cells) for a
  * vector, by dot product against pre-NORMALIZED centroids (|v| is constant
  * across candidates, so dot order == cosine order). Centroids ride inside
  * the expression (driver-built, serialized once per task, not per row) —
  * they are bounded (nlist x dim doubles) by construction.
  */
case class IvfCells(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression with CodegenFallback {
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_cells expects array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val fl = isFloat
    val scores = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(dim, cent.length)
      var acc = 0.0
      var d = 0
      while (d < m) {
        acc += (if (fl) arr.getFloat(d).toDouble else arr.getDouble(d)) * cent(d)
        d += 1
      }
      scores(c) = acc
      c += 1
    }
    // n passes of argmax over nlist scores (n and nlist are both small)
    val picks = math.min(n, centroids.length)
    val out = new Array[Int](picks)
    var p = 0
    while (p < picks) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < scores.length) {
        if (scores(j) > bestScore) { best = j; bestScore = scores(j) }
        j += 1
      }
      out(p) = best
      scores(best) = Double.NegativeInfinity
      p += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): IvfCells = copy(child = c)
  override def prettyName: String = "graft_ivf_cells"
}

/** Index of the nearest centroid by SQUARED EUCLIDEAN distance (Lloyd's
  * k-means assignment step). Unlike [[IvfCells]] (dot-product / cosine
  * against normalized centroids), this is the metric the k-means objective
  * minimizes, so raw (un-normalized) centroids are correct here. Ties break
  * to the lowest centroid index — the same rule the DuckDB oracle uses.
  * Centroids ride inside the expression: driver-built, k x dim doubles,
  * serialized once per task — the broadcast-the-small-side pattern without
  * a join.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val fl = isFloat
    var best = 0
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(dim, cent.length)
      var acc = 0.0
      var d = 0
      while (d < m) {
        val x = (if (fl) arr.getFloat(d).toDouble else arr.getDouble(d)) - cent(d)
        acc += x * x
        d += 1
      }
      if (acc < bestDist) { best = c; bestDist = acc } // strict < : ties keep lowest index
      c += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
  override def prettyName: String = "graft_nearest_centroid"
}

/** Squared euclidean distance to the NEAREST of the embedded centroids —
  * the inertia term of the k-means objective, as a single narrow-map
  * expression. Pairs with [[NearestCentroid]] (same loop, same index-order
  * accumulation, same strict-< tie rule) so `(cell, distance)` come from
  * two pure maps with no join: the previous formulation broadcast-joined a
  * k-row centroid table and folded `aggregate(zip_with(...))` per row — an
  * interpreted per-element lambda that made the inertia query ~8x slower
  * than the assignment it shadows. Arithmetic is EXACTLY the fold's
  * ((double) p - q)^2 summed in index order, so the DuckDB oracle's
  * unrolled per-dimension sum still matches bitwise. Implements
  * `doGenCode` (centroids via `addReferenceObj`) to stay inside
  * whole-stage codegen on the corpus-sized scan.
  */
case class NearestCentroidDist(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid_dist expects array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val fl = isFloat
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(dim, cent.length)
      var acc = 0.0
      var d = 0
      while (d < m) {
        val x = (if (fl) arr.getFloat(d).toDouble else arr.getDouble(d)) - cent(d)
        acc += x * x
        d += 1
      }
      if (acc < bestDist) bestDist = acc
      c += 1
    }
    bestDist
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    val castL = if (isFloat) "(double) " else ""
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      s"""
         |final int $dim = $v.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  final double[] $cent = $cents[$c];
         |  final int $m = java.lang.Math.min($dim, $cent.length);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $m; $d++) {
         |    final double $x = $castL$v.$getter($d) - $cent[$d];
         |    $acc += $x * $x;
         |  }
         |  if ($acc < $best) $best = $acc;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroidDist = copy(child = c)
  override def prettyName: String = "graft_nearest_centroid_dist"
}

/** Dense matrix-vector product out[j] = sum_i mat(j)(i) * v(i) — the
  * Johnson-Lindenstrauss random-projection step as a single map-side
  * expression. The projection matrix rides inside the expression (outDim x
  * dim doubles, driver-built deterministically, serialized once per task) so
  * projection is a pure narrow map: no join, no shuffle, codegen-adjacent
  * JVM loops. Sums run in index order, matching any oracle that folds the
  * same order.
  */
case class MatVec(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mat_vec expects array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val fl = isFloat
    val out = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) {
      val row = mat(j)
      val m = math.min(dim, row.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        acc += (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)) * row(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MatVec = copy(child = c)
  override def prettyName: String = "graft_mat_vec"
}

/** Shared arithmetic for the product-quantization expressions: L2-normalize
  * a Catalyst float/double array into a fresh double array (sum of squares
  * in index order, sqrt, divide) — the EXACT sequence the driver-side
  * codebook trainer uses on collected rows, so a vector that was part of
  * the training sample quantizes to its own codebook entry at distance
  * exactly 0 (bitwise), which is what makes the exact-representable
  * correctness gate provable.
  */
private[functions] object PqOps {
  def normalized(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    var ss = 0.0
    while (i < dim) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      v(i) = x
      ss += x * x
      i += 1
    }
    val n = math.sqrt(ss)
    if (n > 0) {
      i = 0
      while (i < dim) { v(i) = v(i) / n; i += 1 }
    }
    v
  }
}

/** Product-quantization encoder (Jegou, Douze, Schmid 2011): split the
  * L2-normalized vector into `m = codebooks.length` contiguous subvectors
  * and emit, per subspace, the index of the nearest codebook entry by
  * squared euclidean distance (strict `<`, ties to the lowest index — the
  * same rule as [[NearestCentroid]]). Output is `array<int>` of length m:
  * the compressed representation that rides shuffles and index tables in
  * place of the raw vector (m ints vs dim floats — 8 codes stand in for a
  * 64-float embedding). Codebooks ride inside the expression (driver-built
  * from a bounded sample, m x ksub x dsub doubles, serialized once per
  * task) so encoding is a pure narrow map pass.
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_codes expects array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val vec = PqOps.normalized(v.asInstanceOf[ArrayData], isFloat)
    val m = codebooks.length
    val out = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = if (cb.isEmpty) 0 else cb(0).length
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        val lim = math.min(dsub, vec.length - off)
        var acc = 0.0
        var d = 0
        while (d < lim) {
          val x = vec(off + d) - cent(d)
          acc += x * x
          d += 1
        }
        if (acc < bestDist) { best = c; bestDist = acc }
        c += 1
      }
      out(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): PqCodes = copy(child = c)
  override def prettyName: String = "graft_pq_codes"
}

/** Per-query ADC lookup table: for the L2-normalized query vector, the dot
  * product of every subvector against every codebook entry, flattened as
  * `lut[j * ksub + c]`. Computed ONCE per query row (m * ksub * dsub
  * multiplies); scoring a corpus row is then only m array reads + adds
  * ([[PqAdc]]) — the asymmetric-distance-computation split that makes a
  * PQ scan O(m) per candidate instead of O(dim).
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut expects array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val vec = PqOps.normalized(v.asInstanceOf[ArrayData], isFloat)
    val m = codebooks.length
    val ksub = if (m == 0) 0 else codebooks(0).length
    val out = new Array[Double](m * ksub)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = if (cb.isEmpty) 0 else cb(0).length
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        val lim = math.min(dsub, vec.length - off)
        var acc = 0.0
        var d = 0
        while (d < lim) { acc += vec(off + d) * cent(d); d += 1 }
        out(j * ksub + c) = acc
        c += 1
      }
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): PqLut = copy(child = c)
  override def prettyName: String = "graft_pq_lut"
}

/** ADC score of one corpus row against one query: `sum_j lut[j*ksub +
  * codes[j]]` — the approximate inner product of the normalized query with
  * the quantized reconstruction of the normalized corpus vector (=
  * approximate cosine). m reads + adds per scored pair; the subspace sums
  * accumulate in subspace order, matching the driver-side trainer and the
  * exact-representable oracle.
  *
  * Unlike the heavy per-row expressions in this file (which do enough work
  * per row that CodegenFallback's virtual call disappears in the noise),
  * ADC is the INNERMOST loop of a PQ sweep and does only m adds per scored
  * pair — so this one implements `doGenCode` and stays inside whole-stage
  * codegen: the scored broadcast join compiles to one fused loop with no
  * boxing and no per-row virtual dispatch.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (array<int>, array<double>), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val cs = codes.asInstanceOf[ArrayData]
    val lt = lut.asInstanceOf[ArrayData]
    val m = cs.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      val code = cs.getInt(j)
      val idx = j * ksub + code
      // code must land inside ITS OWN subspace: a corrupted code (e.g. -1 or
      // ksub+3 in a damaged index row) must skip cleanly rather than read a
      // neighboring subspace's LUT entry or out-of-bounds unsafe memory
      if (code >= 0 && code < ksub && idx < lt.numElements()) acc += lt.getDouble(idx)
      j += 1
    }
    acc
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      val lutN = ctx.freshName("lutN")
      s"""
         |final int $m = $codes.numElements();
         |final int $lutN = $lut.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  final int $code = $codes.getInt($j);
         |  final int $idx = $j * $ksub + $code;
         |  if ($code >= 0 && $code < $ksub && $idx < $lutN) $acc += $lut.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
  override def prettyName: String = "graft_pq_adc"
}

/** Registration for SQL/expr access (same pattern as MaskFunctions). */
object VectorFunctions {
  private def intLit(e: Expression): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    // skip names that are already registered: register() runs on every
    // operator call (cheap), and createOrReplaceTempFunction logs a
    // "function replaced" warning per call that would bury real warnings
    def reg(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!r.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        r.createOrReplaceTempFunction(name, builder, "scala_udf")
    reg("graft_minhash_sig", args => MinHashSig(args.head, intLit(args(1))))
    reg("graft_simhash64", args => SimHash64(args.head))
    reg("graft_jaccard_sorted", args => JaccardSorted(args.head, args(1)))
    reg("graft_vec_dot", args => VecDot(args.head, args(1)))
    reg("graft_lsh_bucket", args => LshBucket(args.head, intLit(args(1))))
    reg("graft_shingle_hashes", args => ShingleHashes(args.head, intLit(args(1))))
    reg("graft_word_hashes", args => WordHashes(args.head))
    reg("graft_nfc", args => NfcNormalize(args.head))
    reg("graft_char_trigrams", args => CharTrigrams(args.head))
    reg("graft_bpeish_count", args => BpeishCount(args.head))
    reg("graft_mg_topk", args =>
      MgTopK(args.head, intLit(args(1))).toAggregateExpression())
  }
}
