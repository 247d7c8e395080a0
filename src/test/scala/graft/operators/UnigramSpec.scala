package graft.operators

import graft.SparkFunSuite
import graft.functions.UnigramSegment
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}

class UnigramSpec extends SparkFunSuite {
  import spark.implicits._

  private def segment(word: String, vocab: Map[String, Double],
      maxLen: Int = 8, oov: Double = -100.0): Seq[String] =
    Seq(word).toDF("word")
      .select(columnOf(UnigramSegment(expressionOf(col("word")),
        vocab.toSeq.sortBy(_._1), maxLen, oov)).as("p"))
      .head().getSeq[String](0)

  test("Viterbi picks the max-likelihood split (hand-computed)") {
    // "abc": ab+c = -1.0 + -2.0 = -3.0 beats a+b+c = -4.5 and a+bc = -3.5
    val v = Map("a" -> -1.5, "b" -> -1.5, "c" -> -2.0, "ab" -> -1.0,
      "bc" -> -2.0)
    assert(segment("abc", v) == Seq("ab", "c"))
  }

  test("Viterbi tie resolves to the longest final piece") {
    // a+bc and ab+c both sum -3.0: the DP's strict-greater update scanning
    // split points left-to-right keeps the LONGER last piece (j smaller)
    val v = Map("a" -> -1.0, "b" -> -1.0, "c" -> -1.0, "ab" -> -2.0,
      "bc" -> -2.0)
    assert(segment("abc", v) == Seq("a", "bc"))
  }

  test("unknown single chars fall back to the OOV floor; coverage totals") {
    val v = Map("ab" -> -1.0)
    assert(segment("axb", v) == Seq("a", "x", "b"))
    assert(segment("", v) == Seq.empty)
  }

  test("whole-word piece wins when present") {
    val v = Map("h" -> -3.0, "hello" -> -2.0, "he" -> -2.5, "llo" -> -2.5)
    assert(segment("hello", v) == Seq("hello"))
  }

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cats sat"),
    (3L, "a mat on a cat"),
    (4L, "the the the cat")).toDF("id", "text")

  test("train: every corpus char is a piece; round-trip holds for all words") {
    val model = Unigram.train(corpus, "text", vocabSize = 64,
      maxPieceLen = 4, seedSize = 128, emIters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val corpusChars = "thecatsonma".toSet
    assert(corpusChars.forall(c => model.contains(c.toString)),
      s"missing chars: ${corpusChars.filterNot(c => model.contains(c.toString))}")
    val segs = Unigram.segmentWords(corpus, "text", model, 4)
      .collect().map(r => (r.getString(0), r.getSeq[String](2)))
    assert(segs.nonEmpty)
    segs.foreach { case (w, ps) =>
      assert(ps.mkString == w, s"round-trip failed: $w -> $ps")
      ps.foreach(p => assert(model.contains(p), s"piece $p not in vocab"))
    }
    // it learned something beyond characters
    assert(model.keys.exists(_.length > 1))
  }

  test("hard-EM is monotone in the Viterbi corpus log-likelihood") {
    val w = Unigram.words(corpus, "text").localCheckpoint(eager = true)
    def lik(iters: Int): Double = {
      val m = Unigram.train(corpus, "text", vocabSize = 64, maxPieceLen = 4,
        seedSize = 128, emIters = iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      Unigram.corpusLogLik(corpus, "text", m, 4)
    }
    val l1 = lik(1); val l2 = lik(2); val l3 = lik(3)
    assert(l2 >= l1 - 1e-3, s"EM round 2 decreased likelihood: $l1 -> $l2")
    assert(l3 >= l2 - 1e-3, s"EM round 3 decreased likelihood: $l2 -> $l3")
  }

  test("tokenCounts: dictionary-join counts match a direct recount") {
    val model = Unigram.train(corpus, "text", vocabSize = 64,
      maxPieceLen = 4, seedSize = 128, emIters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = Unigram.tokenCounts(corpus, "id", "text", model, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 4: "the the the cat" = 4 words; n_tokens >= n_words always
    val (nw, nt) = got(4L)
    assert(nw == 4L)
    assert(nt >= nw)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }
}
