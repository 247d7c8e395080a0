package graft.operators

import graft.SparkFunSuite
import graft.functions.WordPieceMatch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}

class WordPieceMatchSpec extends SparkFunSuite {
  import spark.implicits._

  private def pieces(word: String, vocab: Seq[String],
      unk: String = "[UNK]"): Seq[String] =
    Seq(word).toDF("word")
      .select(columnOf(WordPieceMatch(expressionOf(col("word")), vocab, unk))
        .as("p"))
      .head().getSeq[String](0)

  test("greedy longest match wins at every position, ## marks continuations") {
    val v = Seq("a", "b", "c", "ab", "abc", "bc")
    assert(pieces("abcab", v) == Seq("abc", "##ab"))
    assert(pieces("bca", v) == Seq("bc", "##a"))
  }

  test("greedy is NOT optimal: a long first piece can force char fallback") {
    // longest-match takes "abc" then spells d+e; the 2-piece split ab+cde
    // exists but greedy never sees it — the documented BERT behavior
    val v = Seq("a", "b", "c", "d", "e", "ab", "abc", "cde")
    assert(pieces("abcde", v) == Seq("abc", "##d", "##e"))
  }

  test("an OOV character collapses the WHOLE word to [UNK] (all-or-nothing)") {
    val v = Seq("a", "b", "ab")
    assert(pieces("axb", v) == Seq("[UNK]"))
    // ... even when the OOV char is the last position
    assert(pieces("abx", v) == Seq("[UNK]"))
  }

  test("empty string segments to no pieces; whole-word piece stands alone") {
    val v = Seq("h", "e", "l", "o", "hello")
    assert(pieces("", v) == Seq.empty)
    assert(pieces("hello", v) == Seq("hello"))
  }

  test("induced vocab: merge products lose the end marker, alphabet covers") {
    val vocab = Vocab.wordpieceVocab(
      Seq(("t", "h"), ("th", "e</w>"), ("e", "</w>")),
      alphabet = Seq("t", "h", "e", "x"))
    assert(vocab.contains("th") && vocab.contains("the") && vocab.contains("e"))
    assert(!vocab.exists(_.contains("</w>")))
    // the</w> and e</w> strip to dictionary words already covered: distinct
    assert(vocab == vocab.distinct && vocab == vocab.sorted)
  }

  test("fertility divergence: replay can beat greedy when a late merge never fires") {
    // merges: (c,d) (cd,e) (a,b) (ab,c). On "abcde" replay reaches
    // [ab, cde] (2 tokens; the rank-4 (ab,c) merge never fires — c is
    // already inside cde), but the merge PRODUCT "abc" is in the inference
    // vocab, so greedy longest-match takes it and pays [abc, ##d, ##e] (3).
    val docs = Seq((1L, "abcde abcde"), (2L, "abcde")).toDF("doc_id", "text")
    val m = Seq(("c", "d"), ("cd", "e"), ("a", "b"), ("ab", "c"))
    val row = Vocab.wordpieceFertilityCompare(docs, "text", m).head()
    assert(row.getAs[Long]("n_words") == 1L)
    assert(row.getAs[Long]("n_occurrences") == 3L)
    assert(row.getAs[Long]("replay_tokens") == 6L)  // 2 per occurrence
    assert(row.getAs[Long]("match_tokens") == 9L)   // 3 per occurrence
    assert(row.getAs[Long]("diverging_words") == 1L)
    assert(row.getAs[Long]("diverging_occurrences") == 3L)
  }

  test("wordpieceMatchEncode counts are dictionary-weighted and ##-marked") {
    val docs = Seq((1L, "aba ab aba"), (2L, "ab")).toDF("doc_id", "text")
    // merges: (a,b) -> piece "ab"; alphabet {a,b} auto-included
    val got = Vocab.wordpieceMatchEncode(docs, "text", Seq(("a", "b")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aba" x2 -> ab,##a; "ab" x2 -> ab
    assert(got == Map("ab" -> 4L, "##a" -> 2L))
  }
}
