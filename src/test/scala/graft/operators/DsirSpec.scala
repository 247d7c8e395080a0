package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[Sampling.dsirWeights]] / [[Sampling.dsirSelect]] on a hand-computed
  * corpus: target "aa aa bb" -> V = {aa, bb}, ct(aa)=2, ct(bb)=1, Tt=3.
  * Raw: d1 = "aa aa aa", d2 = "zz zz" (fully OOV), d3 = "bb" -> cr(aa)=3,
  * cr(bb)=1, Tr=4, |V|=2.
  *   llr(aa) = ln(3/5) - ln(4/6) = -0.105361
  *   llr(bb) = ln(2/5) - ln(2/6) =  0.182322
  *   lw(d1) = 3*llr(aa) = -0.3161, lw(d3) = 0.1823, lw(d2) = 0 (OOV-only,
  *   kept in the report — the oovReport lesson).
  */
class DsirSpec extends SparkFunSuite {
  import spark.implicits._

  private def target = Seq((100L, "aa aa bb")).toDF("doc_id", "text")
  private def raw = Seq((1L, "aa aa aa"), (2L, "zz zz"), (3L, "bb"))
    .toDF("doc_id", "text")

  test("dsirWeights matches the hand-computed likelihood ratios") {
    val got = Sampling.dsirWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === Seq((1L, 3L), (2L, 0L), (3L, 1L)))
    assert(math.abs(got(0)._3 - -0.3161) < 1e-9)
    assert(got(1)._3 === 0.0)
    assert(math.abs(got(2)._3 - 0.1823) < 1e-9)
  }

  test("dsirSelect ranks target-like docs first, OOV at zero, off-target last") {
    val got = Sampling.dsirSelect(raw, target, "doc_id", "text", 3)
      .orderBy("rank").as[(Int, Long)].collect().toSeq
    assert(got === Seq((1, 3L), (2, 2L), (3, 1L)))
  }

  test("identical texts tie exactly and break by id") {
    // three identical "bb" docs shift p_r itself (cr(bb)=3, Tr=6): now
    // llr(aa) = ln(3/5)-ln(4/8) > 0 so d1 leads, d2 = 0, and the tied
    // "bb" trio must come out in id order regardless of summation order
    val dup = Seq((5L, "bb"), (4L, "bb")).toDF("doc_id", "text")
    val got = Sampling.dsirSelect(raw.unionAll(dup), target, "doc_id", "text", 5)
      .orderBy("rank").as[(Int, Long)].collect().toSeq
    assert(got === Seq((1, 1L), (2, 2L), (3, 3L), (4, 4L), (5, 5L)))
  }

  test("raw pool never shuffles wider than (doc, word, count): the ratio table broadcasts") {
    val plan = Sampling.dsirWeights(raw, target, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"expected the |V|-row tables to broadcast in:\n$plan")
  }
}
