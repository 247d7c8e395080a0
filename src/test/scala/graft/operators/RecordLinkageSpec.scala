package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkFunSuite {
  import spark.implicits._

  private val recs = Seq(
    (1L, "alice smith", "A"),   // matches 2 at distance 1
    (2L, "alice smyth", "A"),
    (3L, "bob jones", "A"),     // same block, too far from 1/2
    (4L, "carol wu", "B")       // alone in its block
  ).toDF("id", "name", "blk")

  test("blockedPairs verifies inside blocks only, with the distance bound") {
    val p = RecordLinkage.blockedPairs(recs, "id", "name", col("blk"),
      maxDist = 1, maxBlock = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(p == Set((1L, 2L, 1)))
  }

  test("resolve assigns min-id entities and keeps singletons as themselves") {
    val r = RecordLinkage.resolve(recs, "id", "name", col("blk"), maxDist = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("maxBlock drops oversized blocks (skew guard), keeps the rest") {
    // block A has 3 records (> cap 2) and is dropped entirely; a 2-record
    // block elsewhere still pairs
    val more = recs.unionAll(Seq((5L, "carol wo", "B")).toDF("id", "name", "blk"))
    val p = RecordLinkage.blockedPairs(more, "id", "name", col("blk"),
      maxDist = 1, maxBlock = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((4L, 5L)))
  }

  test("blockedPairsCompact emits exactly blockedPairs' pairs (both pickers, skew guard included)") {
    val more = recs.unionAll(Seq((5L, "carol wo", "B")).toDF("id", "name", "blk"))
    for (cap <- Seq(Int.MaxValue, 2)) {
      def pairs(f: => org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
        f.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val joined = pairs(RecordLinkage.blockedPairs(more, "id", "name",
        col("blk"), maxDist = 1, maxBlock = cap))
      val compact = pairs(RecordLinkage.blockedPairsCompact(more, "id", "name",
        col("blk"), maxDist = 1, maxBlock = cap))
      assert(compact == joined, s"cap=$cap")
      assert(compact.forall { case (a, b, _) => a < b })
    }
    // resolve is generator-independent
    val viaCompact = RecordLinkage.resolve(more, "id", "name", col("blk"),
      maxDist = 1).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val viaJoin = RecordLinkage.resolve(more, "id", "name", col("blk"),
      maxDist = 1, compactBlocks = false)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(viaCompact == viaJoin)
  }

  test("blockedPairsCompact excludes self-pairs under duplicate ids (same contract as blockedPairs)") {
    // two records share id 1 in one block: sort_array ties sit adjacent and
    // the slice generator pairs them — the strict-< contract must drop the
    // (1,1) self-pair, exactly as blockedPairs' strict-< join condition does
    val dup = Seq((1L, "alice smith", "A"), (1L, "alice smyth", "A"),
      (2L, "alice smith", "A")).toDF("id", "name", "blk")
    def pairs(f: => org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      f.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val joined = pairs(RecordLinkage.blockedPairs(dup, "id", "name",
      col("blk"), maxDist = 1, maxBlock = Int.MaxValue))
    val compact = pairs(RecordLinkage.blockedPairsCompact(dup, "id", "name",
      col("blk"), maxDist = 1, maxBlock = Int.MaxValue))
    assert(compact == joined)
    assert(compact == Set((1L, 2L)))
    assert(compact.forall { case (a, b) => a < b })
  }

  test("transitive matches land in one entity") {
    // a~b (dist 1) and b~c (dist 1) but a vs c is distance 2: components
    // still merge all three
    val chain = Seq((1L, "aaaa", "X"), (2L, "aaab", "X"), (3L, "aabb", "X"))
      .toDF("id", "name", "blk")
    val r = RecordLinkage.resolve(chain, "id", "name", col("blk"), maxDist = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
