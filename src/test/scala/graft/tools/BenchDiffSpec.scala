package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class BenchDiffSpec extends AnyFunSuite {

  test("parse reads total and per-query map from a full artifact") {
    val (total, qs) = BenchDiff.parse(
      """{"metric":"total","value":12.500,"unit":"sec","queries":{"a":1.000,"b":11.500},"sf":"/x"}""")
    assert(total == 12.5)
    assert(qs == Map("a" -> 1.0, "b" -> 11.5))
  }

  test("parse rejects a truncated driver line (n_queries beyond the queries map)") {
    // the driver-facing stdout line carries only the top-12 slowest; diffing
    // it instead of the full file would silently shrink the watch-list
    val line = """{"metric":"total","value":12.5,"unit":"sec","queries":{"a":1.0,"b":11.5},"n_queries":257,"full":"/tmp/full.json","sf":"/x"}"""
    val e = intercept[IllegalArgumentException](BenchDiff.parse(line))
    assert(e.getMessage.contains("TRUNCATED"))
    assert(e.getMessage.contains("/tmp/full.json"))
  }

  test("parse accepts n_queries that matches the map (untruncated line)") {
    val (_, qs) = BenchDiff.parse(
      """{"metric":"total","value":2.0,"unit":"sec","queries":{"a":1.0,"b":1.0},"n_queries":2,"full":"/tmp/f.json","sf":"/x"}""")
    assert(qs.size == 2)
  }

  test("retimedNames extracts the adjudicated entries; absent map reads empty") {
    val full = """{"metric":"total","value":3.0,"unit":"sec","queries":{"a":1.0,"b":2.0},"retimed":{"b":4.500},"sf":"/x"}"""
    assert(BenchDiff.retimedNames(full) == Set("b"))
    // the reported map still carries the warm second reading, not the first
    assert(BenchDiff.parse(full)._2("b") == 2.0)
    val plain = """{"metric":"total","value":3.0,"unit":"sec","queries":{"a":1.0},"sf":"/x"}"""
    assert(BenchDiff.retimedNames(plain).isEmpty)
    val empty = """{"metric":"total","value":3.0,"unit":"sec","queries":{"a":1.0},"retimed":{},"sf":"/x"}"""
    assert(BenchDiff.retimedNames(empty).isEmpty)
  }

  test("watchList flags only both-present, above-threshold regressions") {
    val w = BenchDiff.watchList(
      Map("a" -> 1.0, "b" -> 2.0, "gone" -> 5.0),
      Map("a" -> 2.0, "b" -> 2.1, "new" -> 9.0),
      ratio = 1.5, minSec = 1.0)
    assert(w.map(_._1) == Seq("a")) // b under ratio, gone/new not in both
  }
}
