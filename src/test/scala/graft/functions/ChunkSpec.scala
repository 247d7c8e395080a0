package graft.functions

import graft.SparkFunSuite
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** [[GearOps]] content-defined chunking: the partition/bounds invariants,
  * determinism, and the property CDC exists for — a local edit disturbs
  * only the chunks near it, unlike fixed-size blocking where everything
  * downstream of an insertion shifts.
  */
class ChunkSpec extends SparkFunSuite {
  import spark.implicits._

  /** Deterministic pseudo-random payload. The seed striding (×1000003)
    * keeps different seeds on DISJOINT windows of the underlying sequence —
    * with a small additive seed two payloads are near-shifted copies of
    * each other and CDC (correctly!) shares their chunks.
    */
  private def payload(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n) { i =>
      var z = i + seed * 1000003L + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)).toByte
    }

  private def lensAndFps(bytes: Array[Byte], min: Int = 32, max: Int = 256,
      bits: Int = 6): Seq[(Int, Long)] = {
    val arr = GearOps.chunkRows(bytes, min, max, bits)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getInt(0), r.getLong(1))
    }
  }

  test("chunks partition the payload within bounds; only the tail may run short") {
    val p = payload(5000, 1)
    val cs = lensAndFps(p)
    assert(cs.map(_._1).sum === p.length)
    assert(cs.forall(_._1 <= 256))
    assert(cs.dropRight(1).forall(_._1 >= 32))
    assert(cs.size > 5) // the mask actually cuts (not one max-size run)
  }

  test("deterministic: same bytes, same chunk sequence") {
    val p = payload(3000, 7)
    assert(lensAndFps(p) === lensAndFps(p.clone()))
  }

  test("a point edit disturbs only nearby chunks (boundaries re-synchronize)") {
    val p1 = payload(8000, 3)
    val p2 = p1.clone(); p2(4000) = (p2(4000) ^ 0x5a).toByte
    val (c1, c2) = (lensAndFps(p1), lensAndFps(p2))
    // every chunk before the edit is untouched, and the suffixes re-align:
    // the shared prefix + shared suffix must cover all but a few chunks
    val prefix = c1.zip(c2).takeWhile { case (a, b) => a == b }.size
    val suffix = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.size
    assert(prefix > 0 && suffix > 0,
      s"edit broke all sharing: prefix=$prefix suffix=$suffix of ${c1.size}/${c2.size}")
    assert(prefix + suffix >= c1.size - 3,
      s"edit disturbed more than 3 chunks: prefix=$prefix suffix=$suffix n=${c1.size}")
  }

  test("empty payload yields no chunks; sub-min payload yields one tail chunk") {
    assert(lensAndFps(Array.emptyByteArray).isEmpty)
    val tiny = payload(10, 2)
    val cs = lensAndFps(tiny)
    assert(cs.size === 1 && cs.head._1 === 10)
    assert(cs.head._2 === GearOps.fnv1a64(tiny, 0, 10))
  }

  test("chunkDedupReport: fully cloned corpus saves half its bytes") {
    // 64-symbol alphabet: a 16-symbol one produces accidental >=32-byte
    // repeats INSIDE a doc, so chunks would have more than two copies
    val docs = Seq((1L, new String(payload(2000, 5).map(b => ('0' + (b & 63)).toChar))),
      (2L, new String(payload(1500, 9).map(b => ('0' + (b & 63)).toChar))))
      .toDF("doc_id", "text")
    val doubled = docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 100))
    val media = Multimodal.withFakeMedia(doubled, "doc_id", "text")
    val r = Multimodal.chunkDedupReport(media, "media_id", "payload", 32, 256, 6)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 === 2 * r._2) // every chunk has exactly two copies
    assert(r._3 === 2 * r._4)
    assert(r._5 === 0.5)
  }

  test("chunkCheck flags every payload reconstruction-exact") {
    val docs = Seq((1L, "x" * 500), (2L, ""), (3L, "short")).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val got = Multimodal.chunkCheck(media, "media_id", "payload", 32, 256, 6)
      .orderBy("media_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, got(0)._2, 500L, true), (2L, 0L, 0L, true),
      (3L, 1L, 5L, true)))
  }
}
