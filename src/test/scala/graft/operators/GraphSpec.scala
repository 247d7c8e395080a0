package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkFunSuite {
  import spark.implicits._

  test("pagerank on a 3-cycle is uniform (mean-1 fixpoint)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pagerank(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
  }

  test("pagerank redistributes dangling mass (hand-computed 2-node chain)") {
    // a -> b, b dangling. Three mean-1 iterations by hand:
    //   it1: a = .15 + .85*(0 + 1/2)        = 0.575,    b = 1.425
    //   it2: a = .15 + .85*(1.425/2)        = 0.755625, b = 1.244375
    //   it3: a = .15 + .85*(1.244375/2)     = 0.678859, b = 1.321141
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.pagerank(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 0.678859, 2L -> 1.321141))
  }

  test("pagerank drops self-loops and duplicate edges; mass is conserved") {
    val edges = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r = Graph.pagerank(edges, "src", "dst", iters = 4)
    val total = r.agg(sum("rank")).head().getDouble(0)
    assert(math.abs(total - 3.0) < 1e-4, s"mass not conserved: $total")
  }

  test("personalized pagerank concentrates mass on the seed side") {
    // chain 1 -> 2 -> 3 with seed {1}: teleport only lands on 1, so ranks
    // decay along the chain; with seed {3} node 1 gets rank 0 after round 1
    // (no teleport, no in-edges)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seed1 = Seq(Tuple1(1L)).toDF("id")
    val r1 = Graph.pagerankPersonalized(edges, "src", "dst", seed1, "id",
      iters = 4).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r1(1L) > r1(2L) && r1(2L) > r1(3L), s"not decaying: $r1")
    val seed3 = Seq(Tuple1(3L)).toDF("id")
    val r3 = Graph.pagerankPersonalized(edges, "src", "dst", seed3, "id",
      iters = 4).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r3(1L) == 0.0, s"non-seed source kept mass: $r3")
    assert(r3(3L) > r3(2L))
  }

  test("personalized pagerank: hand-computed single iteration") {
    // 1 -> 2, seeds {1}, |V| = 2, |S| = 1: after one iteration
    //   node 1 (seed, no in-edges, dangling mass from node 2's rank 1):
    //     0.15*2/1 + 0.85*0 + 0.85*1/1 = 1.15
    //   node 2: 0 + 0.85*(1/1) + 0 = 0.85
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r = Graph.pagerankPersonalized(edges, "src", "dst", seeds, "id",
      iters = 1).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 1.15, 2L -> 0.85))
  }

  test("degreeStats counts both sides with zero fill") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.degreeStats(edges, "src", "dst")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }
}
