package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[Retrieval.bm25TopK]] on a hand-computed corpus. N=3 (d4 is empty and
  * must not dilute idf), avgdl = (4+2+3)/3 = 3.
  * For the single-term query "cat" (df=2): idf = ln((3-2+0.5)/(2+0.5)+1)
  * = ln(1.6) = 0.470004.
  *   d1: tf=2, dl=4 -> 0.470004 * (2*2.2) / (2 + 1.2*(0.25+0.75*4/3))
  *      = 0.470004 * 4.4 / 3.5 = 0.590862 -> 0.5909
  *   d2: tf=1, dl=2 -> 0.470004 * 2.2 / (1 + 1.2*(0.25+0.5)) = 0.544215
  *      -> 0.5442 (the length norm narrows but does not close d1's tf lead)
  */
class RetrievalSpec extends SparkFunSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat cat dog bird"),
    (2L, "cat fish"),
    (3L, "dog dog bird"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("bm25TopK matches hand-computed scores, ranks and hit sets") {
    val q = Seq((1, "cat")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", q, 10)
      .orderBy("rank").as[(Int, Int, Long, Double)].collect().toSeq
    assert(got.map(r => (r._2, r._3)) === Seq((1, 1L), (2, 2L)))
    assert(math.abs(got(0)._4 - 0.5909) < 1e-9)
    assert(math.abs(got(1)._4 - 0.5442) < 1e-9)
  }

  test("multi-term query sums per-term contributions; k caps per query") {
    val q = Seq((7, "cat"), (7, "dog")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", q, 2)
    assert(got.count() === 2)
    // d1 contains both terms, so it must outrank single-term docs
    assert(got.filter(col("rank") === 1).select("doc_id").as[Long].head() === 1L)
  }

  test("a term absent from the corpus contributes nothing and a query of only absent terms returns no rows") {
    val q = Seq((9, "unicorn")).toDF("query_id", "term")
    assert(Retrieval.bm25TopK(corpus, "doc_id", "text", q, 5).count() === 0)
  }

  test("identical documents tie on the rounded score and break by id") {
    val dup = corpus.unionAll(Seq((5L, "cat fish")).toDF("doc_id", "text"))
    val q = Seq((1, "fish")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(dup, "doc_id", "text", q, 5)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(2L, 5L))
  }

  test("query terms and idf table broadcast; corpus never joins itself") {
    val q = Seq((1, "cat")).toDF("query_id", "term")
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text", q, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"expected broadcast exchanges in:\n$plan")
  }

  test("mmrRerank: duplicates deferred, lambda=1 degenerates to relevance order, k caps") {
    val cands = Seq(
      (1L, 10L, Array(1f, 0f), 0.9), // top relevance
      (1L, 11L, Array(1f, 0f), 0.8), // exact duplicate of 10
      (1L, 12L, Array(0f, 1f), 0.5), // orthogonal, lower relevance
      (1L, 13L, Array(0f, 0f), 0.4)  // zero norm: similarity 0 to anything
    ).toDF("query_id", "id", "vec", "rel")
    val got = Retrieval.mmrRerank(cands, "query_id", "id", "vec", "rel",
        k = 4, lambda = 0.5)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    // 10 first; then 12 (0.25) beats the duplicate 11 (0.4-0.5 = -0.1);
    // zero-norm 13 scores 0.2 < 0.25 but beats the duplicate too
    assert(got.map(_._3) === Seq(10L, 12L, 13L, 11L))
    assert(got.map(_._4) === Seq(0.45, 0.25, 0.2, -0.1))
    // lambda=1: pure relevance, duplicates not penalized
    val pure = Retrieval.mmrRerank(cands, "query_id", "id", "vec", "rel",
        k = 2, lambda = 1.0)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(pure.map(_._3) === Seq(10L, 11L))
  }

  test("bm25 posting index: build+append+probe equals ad-hoc; replayed and overlapping appends are filtered to fresh docs") {
    Seq("bm25_t", "bm25_t_stats", "bm25_t_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Retrieval.bm25WriteBucketed(corpus.filter(col("doc_id") <= 2),
      "bm25_t", "doc_id", "text", numBuckets = 4)
    Retrieval.bm25AppendToIndex(corpus.filter(col("doc_id") > 2),
      "bm25_t", "doc_id", "text")
    val q = Seq((1, "cat"), (7, "cat"), (7, "dog")).toDF("query_id", "term")
    val adhoc = Retrieval.bm25TopK(corpus, "doc_id", "text", q, 10)
      .collect().toSet
    def probe() = Retrieval.bm25TopKFromIndex(q, "bm25_t", "doc_id", 10)
      .collect().toSet
    assert(probe() === adhoc)
    // replayed append: the anti-join guard drops every already-indexed doc,
    // so the replay is a posting-level NO-OP — zero accretion, stats N /
    // sum_dl not double-counted, scores identical
    val postingsBefore = spark.table("bm25_t").count()
    Retrieval.bm25AppendToIndex(corpus.filter(col("doc_id") > 2),
      "bm25_t", "doc_id", "text")
    assert(spark.table("bm25_t").count() === postingsBefore)
    assert(Dedup.indexAccretion(spark, "bm25_t") <= 1.0)
    assert(probe() === adhoc)
    // the summed corpus stats stay exact under the replay (the empty delta
    // row contributes nothing): N == indexed docs, sum_dl == their lengths
    val statRow = spark.table("bm25_t_stats").distinct()
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).collect().head
    val expectDocs = corpus.filter(length(trim(col("text"))) > 0).count()
    assert(statRow.getLong(0) === expectDocs)
    // partial-overlap batch: one already-indexed doc + one genuinely new —
    // only the fresh doc's postings and length enter the index
    val extra = Seq((1L, "cat cat"), (99L, "zebra cat")).toDF("doc_id", "text")
    Retrieval.bm25AppendToIndex(extra, "bm25_t", "doc_id", "text")
    val ids = spark.table("bm25_t").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(99L))
    // doc 1's postings are unchanged (still the original text's tf rows)
    val adhoc2 = Retrieval.bm25TopK(
      corpus.unionAll(extra.filter(col("doc_id") === 99)),
      "doc_id", "text", q, 10).collect().toSet
    assert(probe() === adhoc2)
  }

  test("bm25 index probe plan: In-filter prunes buckets, posting aggregates are exchange-free on the bucket key") {
    Seq("bm25_p", "bm25_p_stats", "bm25_p_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Retrieval.bm25WriteBucketed(corpus, "bm25_p", "doc_id", "text",
      numBuckets = 8)
    val q = Seq((1, "cat")).toDF("query_id", "term")
    val probe = Retrieval.bm25TopKFromIndex(q, "bm25_p", "doc_id", 10)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    // the query-vocab In filter reaches the posting scan and prunes buckets
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"expected bucket pruning in plan:\n$plan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt)
    // no exchange keyed on `term`: both the per-(term, id) collapse and the
    // df aggregate run inside the scan's bucket partitioning — the only
    // shuffles left are hit-set-sized (final score groupBy, rank window)
    assert(!plan.contains("hashpartitioning(term"),
      s"posting-side aggregate shuffled on term:\n$plan")
  }

  test("bm25 index probe edge cases: empty query set and all-absent terms return no rows") {
    Seq("bm25_e", "bm25_e_stats", "bm25_e_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Retrieval.bm25WriteBucketed(corpus, "bm25_e", "doc_id", "text",
      numBuckets = 4)
    val none = Seq.empty[(Int, String)].toDF("query_id", "term")
    assert(Retrieval.bm25TopKFromIndex(none, "bm25_e", "doc_id", 5).count() === 0)
    val absent = Seq((1, "unicorn"), (2, "gryphon")).toDF("query_id", "term")
    assert(Retrieval.bm25TopKFromIndex(absent, "bm25_e", "doc_id", 5).count() === 0)
  }

  test("rrfFuse: hand-computed fusion, agreement beats either single list") {
    // list A ranks (10, 20, 30); list B ranks (20, 10, 40):
    // doc 20: 1/62 + 1/61, doc 10: 1/61 + 1/62 -> exact tie at rounded
    // score, id tiebreak puts 10 first; 30 and 40 trail with one vote each
    val a = Seq((1, 1, 10L), (1, 2, 20L), (1, 3, 30L))
      .toDF("query_id", "rank", "id")
    val b = Seq((1, 1, 20L), (1, 2, 10L), (1, 3, 40L))
      .toDF("query_id", "rank", "id")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", k = 10)
      .orderBy("rank").as[(Int, Int, Long, Double)].collect().toSeq
    assert(got.map(_._3) === Seq(10L, 20L, 30L, 40L))
    val two = math.rint((1.0 / 61 + 1.0 / 62) * 1e6) / 1e6
    assert(got(0)._4 === two && got(1)._4 === two)
    assert(got(2)._4 === math.rint(1.0 / 63 * 1e6) / 1e6)
    // single-list degenerate: fusion preserves the input order
    val solo = Retrieval.rrfFuse(Seq(a), "id", k = 2)
      .orderBy("rank").as[(Int, Int, Long, Double)].collect().toSeq
    assert(solo.map(_._3) === Seq(10L, 20L))
  }
}
