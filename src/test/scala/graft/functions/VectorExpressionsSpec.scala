package graft.functions

import graft.SparkFunSuite

class VectorExpressionsSpec extends SparkFunSuite {
  import spark.implicits._

  private def one(q: String): Any = {
    VectorFunctions.register(spark)
    spark.sql(q).collect().head.get(0)
  }

  test("graft_jaccard_sorted on strings and longs") {
    assert(one("select graft_jaccard_sorted(array('a','b','c'), array('b','c','d'))") == 0.5)
    assert(one("select graft_jaccard_sorted(array(1L,2L,3L), array(2L,3L,4L))") == 0.5)
    assert(one("select graft_jaccard_sorted(array('a'), array('a'))") == 1.0)
    assert(one("select graft_jaccard_sorted(array('a'), array('b'))") == 0.0)
    assert(one("select graft_jaccard_sorted(cast(array() as array<string>), cast(array() as array<string>))") == 1.0)
    assert(one("select graft_jaccard_sorted(cast(null as array<string>), array('a'))") == null)
  }

  test("graft_vec_dot float and double, null propagation") {
    assert(one("select graft_vec_dot(array(cast(1.0 as float), cast(2.0 as float)), array(cast(3.0 as float), cast(4.0 as float)))") == 11.0)
    assert(one("select graft_vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))") == 11.0)
    assert(one("select graft_vec_dot(cast(null as array<double>), array(1.0D))") == null)
  }

  test("graft_vec_dot rejects mismatched types at analysis") {
    VectorFunctions.register(spark)
    intercept[Exception](
      spark.sql("select graft_vec_dot(array('a'), array('b'))").collect())
  }

  test("graft_shingle_hashes: sorted, distinct, deterministic, n=1 word sets") {
    val a = one("select graft_shingle_hashes('the cat sat on the mat', 1)")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(a.length == 5) // 'the' deduped
    assert(a == a.sorted)
    val b = one("select graft_shingle_hashes('THE CAT sat on the MAT', 1)")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(a == b) // lowercasing
    val tri = one("select graft_shingle_hashes('a b c d', 3)")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(tri.length == 2) // (a b c), (b c d)
    val short = one("select graft_shingle_hashes('a b', 3)")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(short.length == 1) // shorter than n -> single shingle
  }

  test("graft_shingle_hashes: word-transposed shingles do not collide") {
    // regression: a chain seeded with the raw first-word hash made the first
    // XOR commutative, so 'a b c' and 'b a c' hashed identically
    val ab = one("select graft_shingle_hashes('a b c', 3)")
      .asInstanceOf[scala.collection.Seq[Long]]
    val ba = one("select graft_shingle_hashes('b a c', 3)")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(ab != ba)
    // a doc containing both orderings keeps both distinct shingles
    val both = one("select graft_shingle_hashes('x y q q x y q q y x q q', 3)")
      .asInstanceOf[scala.collection.Seq[Long]]
    // shingles: x y q, y q q, q q x, q x y, x y q, y q q, q q y, q y x, y x q, x q q
    assert(both.length == 8) // 10 shingles, 8 distinct ('x y q', 'y q q' repeat)
  }

  test("graft_minhash_sig width and identical-input stability") {
    val s1 = one("select graft_minhash_sig(graft_shingle_hashes('x y z w v', 2), 32)")
      .asInstanceOf[scala.collection.Seq[Long]]
    val s2 = one("select graft_minhash_sig(graft_shingle_hashes('x y z w v', 2), 32)")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(s1.length == 32 && s1 == s2)
  }

  test("graft_simhash64 empty-ish inputs do not crash") {
    assert(one("select graft_simhash64(cast(array() as array<bigint>))") == 0L)
  }

  test("graft_lsh_bucket is stable and within bit range") {
    val b = one("select graft_lsh_bucket(array(cast(0.5 as float), cast(-0.25 as float)), 8)")
      .asInstanceOf[Long]
    assert(b >= 0L && b < 256L)
    assert(one("select graft_lsh_bucket(array(cast(0.5 as float), cast(-0.25 as float)), 8)") == b)
  }

  test("graft_mg_topk: exact when distinct terms <= k; MG bounds and heavy membership under shuffle") {
    VectorFunctions.register(spark)
    // distinct terms fit in k: the sketch IS the exact count table
    val exact = spark.sql(
      "select graft_mg_topk(t, 8) from values ('a'),('a'),('a'),('b'),('b'),('c') tab(t)")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(exact == Seq(("a", 3L), ("b", 2L), ("c", 1L))) // cnt desc, term asc
    // heavy-term guarantee under arbitrary partitioning: N = 4000 tokens,
    // k = 8 -> threshold N/9 ≈ 444; "heavy" appears 1000 times, the tail is
    // 3000 occurrences of 300 distinct terms (10 each)
    val words = (1 to 1000).map(_ => "heavy") ++
      (1 to 3000).map(i => s"tail${i % 300}")
    val df = words.toDF("t").repartition(13) // adversarial layout
    df.createOrReplaceTempView("mg_words")
    val sk = spark.sql("select graft_mg_topk(t, 8) from mg_words")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(sk.size <= 8)
    val heavy = sk.toMap.get("heavy")
    assert(heavy.isDefined, s"heavy term missing from $sk") // f > N/(k+1) guarantee
    // MG estimates undercount, never overcount, by at most N/(k+1)
    assert(heavy.get <= 1000L && heavy.get >= 1000L - 4000L / 9)
    sk.foreach { case (t, c) =>
      val f = words.count(_ == t).toLong
      assert(c <= f && c >= f - 4000L / 9, s"bounds violated for $t: est=$c f=$f")
    }
  }

  test("mask-type registry JSON resource matches the built-in registry") {
    val fromJson = graft.policy.DataMaskType.loadResource()
    assert(fromJson == graft.policy.DataMaskType.builtin)
  }
}
