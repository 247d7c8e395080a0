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

  test("derivedNameSuffixDigits: one more digit per 10x rows, anchored and capped") {
    // driver corpora stay on the oracle's 2-digit key (er fixture sizes:
    // customer rows + 10% plants per dir)
    assert(RecordLinkage.derivedNameSuffixDigits(165L) == 2)
    assert(RecordLinkage.derivedNameSuffixDigits(1650L) == 2)   // sf0.01
    assert(RecordLinkage.derivedNameSuffixDigits(16500L) == 2)  // sf0.1
    assert(RecordLinkage.derivedNameSuffixDigits(20000L) == 2)  // anchor edge
    // one more digit per decade past the anchor — 165k records is where
    // r13 measured the 188x pair growth under the fixed 2-digit key
    assert(RecordLinkage.derivedNameSuffixDigits(165000L) == 3)  // ScaleUp sf1
    assert(RecordLinkage.derivedNameSuffixDigits(1650000L) == 4) // ScaleUp sf10
    assert(RecordLinkage.derivedNameSuffixDigits(200001L) == 4)
    // capped where the suffix exhausts the name's varying digit run
    assert(RecordLinkage.derivedNameSuffixDigits(Long.MaxValue) == 8)
  }

  test("derived blocking digits: plant recall invariant, finer keys only shed original near-collisions") {
    // the er_customers fixture at sf0.001. Blanket output-invariance does
    // NOT hold — and pinning that fact is the point: originals whose names
    // differ only in the hundreds digit (33 vs 133) share nationkey
    // (custkey % 25, and 100 % 25 == 0) and sit at lev distance 1, so the
    // 2-digit key merges them while the 3-digit key blocks them apart.
    // The contract the self-setting knob actually carries:
    //   (1) RECALL ON THE PLANT is digit-invariant — the dirt never
    //       touches the suffix, so every clone merges with its original
    //       at every digit count;
    //   (2) precision is MONOTONE — a finer key never ADDS a merge, it
    //       only sheds incidental original-original collisions;
    //   (3) every shed pair is exactly an original pair whose names
    //       differ at the position the extra digit moves into the key —
    //       blocking is a DECLARED part of the match policy (match =
    //       blocked together AND lev <= maxDist), not an approximation of
    //       all-pairs lev, so this is the policy tightening, not a loss.
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val dirty = c.filter(col("c_custkey") % 10 === 3)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        concat(substring(col("c_name"), 1, 9), lit("O"),
          substring(col("c_name"), 11, 100)).as("c_name"),
        col("c_nationkey"))
    val all = c.select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .unionAll(dirty)
    def resolveWith(digits: Int): Map[Long, Long] =
      RecordLinkage.resolve(all, "c_custkey", "c_name",
          concat_ws("|", col("c_nationkey"),
            substring(col("c_name"), -digits, digits)),
          maxDist = 1, maxBlock = Int.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def entityPairs(m: Map[Long, Long]): Set[(Long, Long)] =
      m.groupBy(_._2).values.flatMap { grp =>
        val ids = grp.keys.toSeq.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
      }.toSet
    val byDigits = Seq(2, 3, 4).map(d => d -> resolveWith(d)).toMap
    // (1) plant recall is 1 at EVERY digit count
    val plants = dirty.select(col("c_custkey")).collect().map(_.getLong(0))
    assert(plants.nonEmpty)
    for ((d, m) <- byDigits; p <- plants)
      assert(m(p) == m(p - 10000000L),
        s"digits=$d: plant $p not merged with its original")
    // (2) monotone precision: finer keys are subsets, and the fixture
    // really exercises the shedding (d2 strictly coarser than d3)
    val p2 = entityPairs(byDigits(2))
    val p3 = entityPairs(byDigits(3))
    val p4 = entityPairs(byDigits(4))
    assert(p3.subsetOf(p2) && p4.subsetOf(p3))
    assert((p2 -- p3).nonEmpty, "fixture must exercise the shed path")
    // (3) at the DIRECT-match level (cluster pairs also shed transitively
    // through these), every shed edge is a hundreds-digit collision —
    // original-original or its plant-plant mirror, NEVER plant-original
    // (that would be a recall loss) — with names differing ONLY at the
    // 3rd-from-last char, the char the extra digit moved into the key
    def matchEdges(digits: Int): Set[(Long, Long)] =
      RecordLinkage.blockedPairs(all, "c_custkey", "c_name",
          concat_ws("|", col("c_nationkey"),
            substring(col("c_name"), -digits, digits)),
          maxDist = 1, maxBlock = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shed = matchEdges(2) -- matchEdges(3)
    assert(shed.nonEmpty)
    val nm = all.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    shed.foreach { case (a, b) =>
      assert((a < 10000000L) == (b < 10000000L),
        s"shed edge ($a,$b) crosses plant/original — recall loss")
      val (na, nb) = (nm(a), nm(b))
      val diffs = na.zip(nb).zipWithIndex.collect { case ((x, y), i) if x != y => i }
      assert(diffs == Seq(na.length - 3), s"shed edge ($a,$b) diff at $diffs")
    }
  }

  test("exact-collapse staging: resolve equals the uncollapsed full-pair components") {
    // clone-heavy fixture: exact-duplicate groups (the ScaleUp-sf10 regime),
    // a cross-group fuzzy match, a chain THROUGH a clone group, and
    // singletons. resolve (collapse -> star + rep fuzzy) must assign
    // exactly what components over the FULL pairwise graph assigns.
    val df = Seq(
      (10L, "alice smith", "A"), (11L, "alice smith", "A"), // clones of 10
      (12L, "alice smith", "A"),
      (13L, "alice smyth", "A"),  // fuzzy-matches the clone group (dist 1)
      (14L, "alice smyt0", "A"),  // chains through 13 (dist 1), 2 from group
      (20L, "bob jones", "A"),    // singleton in the same block
      (30L, "carol wu", "B"), (31L, "carol wu", "B")        // clone pair
    ).toDF("id", "name", "blk")
    val got = RecordLinkage.resolve(df, "id", "name", col("blk"), maxDist = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // ground truth: components over ALL pairwise matches (clone cliques
    // included) — the pre-collapse pipeline
    val full = RecordLinkage.blockedPairs(df, "id", "name", col("blk"),
      maxDist = 1, maxBlock = Int.MaxValue)
    val labels = Dedup.components(full)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val expected = df.select(col("id")).collect().map(_.getLong(0))
      .map(id => id -> labels.getOrElse(id, id)).toMap
    assert(got == expected)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      14L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L))
    // and the maxBlock guard now bounds REPRESENTATIVE (distinct-name)
    // depth: 4 distinct names in block A > cap 3 drops A's fuzzy pairs,
    // but clone stars still collapse exact groups
    val capped = RecordLinkage.resolve(df, "id", "name", col("blk"),
      maxDist = 1, maxBlock = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(capped == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 13L,
      14L -> 14L, 20L -> 20L, 30L -> 30L, 31L -> 30L))
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
