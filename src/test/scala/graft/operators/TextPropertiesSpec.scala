package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the round-5 text operators: structural invariants that
  * must hold on ANY input, evaluated in batches (one Spark job per property,
  * same discipline as MaskPropertiesSpec).
  */
class TextPropertiesSpec extends SparkFunSuite {

  import spark.implicits._

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  /** Texts mixing spaces, runs of spaces, and newlines; may be empty. */
  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    ws <- Gen.listOfN(n, word)
    seps <- Gen.listOfN(n, Gen.frequency(8 -> " ", 1 -> "  ", 1 -> "\n"))
  } yield ws.zip(seps).map { case (w, s) => w + s }.mkString.trim

  private def sample(n: Int): Seq[String] =
    Gen.listOfN(n, text).sample.getOrElse(Seq("alpha beta gamma"))

  test("dedupSpans matches a sequential reference on collision-heavy random corpora") {
    // tiny 6-word vocabulary at window 3 forces dense window collisions —
    // cross-document, within-document, overlapping and chained — the
    // regime where a winner-pick or coverage bug would diverge
    val k = 3
    def ref(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] = {
      val words = docs.map { case (id, t) =>
        id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toVector
      }.toMap
      val firstSeen = scala.collection.mutable.Map.empty[String, (Long, Int)]
      for ((id, _) <- docs.sortBy(_._1); ws = words(id);
           p <- 1 to ws.length - k + 1) {
        val w = ws.slice(p - 1, p - 1 + k).mkString(" ")
        if (!firstSeen.contains(w)) firstSeen(w) = (id, p)
      }
      docs.map { case (id, _) =>
        val ws = words(id)
        val removed = (1 to ws.length - k + 1)
          .filter { p =>
            firstSeen(ws.slice(p - 1, p - 1 + k).mkString(" ")) != ((id, p))
          }
          .flatMap(p => p until p + k).toSet
        val kept = (1 to ws.length).filterNot(removed).map(j => ws(j - 1))
        id -> ((ws.length, ws.length - kept.length, kept.mkString(" ")))
      }.toMap
    }
    val smallWord = Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx")
    val spanText = Gen.chooseNum(0, 30)
      .flatMap(n => Gen.listOfN(n, smallWord).map(_.mkString(" ")))
    val gen = Gen.listOfN(20, spanText)
    (1 to 4).foreach { round =>
      val texts = gen.apply(org.scalacheck.Gen.Parameters.default,
          org.scalacheck.rng.Seed(round * 31L))
        .getOrElse(List.fill(20)("ax bx cx ax bx cx"))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          windowTokens = k)
        .as[(Long, Int, Int, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val expect = ref(docs)
      assert(got == expect, s"round $round diverged")
      // the interesting regime actually occurred: something was removed
      assert(expect.values.exists(_._2 > 0), s"round $round removed nothing")
    }
  }

  test("chunk: chunks minus overlap rebuild the token stream; sizes within bounds") {
    val cases = sample(60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = cases.toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(df, "doc_id", "text", maxTokens = 7, overlap = 3)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Int, String, Int)].collect().toSeq.groupBy(_._1)
    cases.foreach { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
      val cs = chunks.getOrElse(id, Seq.empty)
      if (toks.isEmpty) assert(cs.isEmpty)
      else {
        // ids are consecutive from 0; every chunk obeys the size bound and
        // its own n_tokens; stitching with the overlap removed rebuilds the
        // exact token stream
        assert(cs.map(_._2) == cs.indices.map(identity))
        cs.foreach { case (_, _, ctext, n) =>
          val ctoks = ctext.split(" ").filter(_.nonEmpty)
          assert(n == ctoks.length && n >= 1 && n <= 7)
        }
        val rebuilt = cs.zipWithIndex.flatMap { case ((_, _, ctext, _), i) =>
          val ws = ctext.split(" ").filter(_.nonEmpty).toSeq
          if (i == 0) ws else ws.drop(3)
        }
        assert(rebuilt == toks, s"doc $id: $t")
      }
    }
  }

  test("gopher report: fractions bounded, word count exact, stop hits bounded") {
    val cases = sample(80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rows = TextAnalysis.gopherReport(cases.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").collect()
    cases.zip(rows).foreach { case ((_, t), r) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(r.getAs[Int]("n_words") == toks.length)
      Seq("symbol_word_ratio", "bullet_line_frac", "ellipsis_line_frac",
        "alpha_word_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v for '$t'")
      }
      assert(r.getAs[Double]("mean_word_len") >= 0.0)
      val hits = r.getAs[Int]("stop_hits")
      assert(hits >= 0 && hits <= TextAnalysis.GopherStopWords.length)
    }
  }

  test("LM selfScore: nll non-negative, gram count exact, empty docs zero") {
    val cases = sample(60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rows = LanguageModel.selfScore(cases.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect().toSeq
    cases.zip(rows).foreach { case ((_, t), (_, nGrams, nll)) =>
      val s = t.toLowerCase.trim
      assert(nGrams == math.max(s.length - 2, 0))
      assert(nll >= 0.0) // -ln(p) of conditional probabilities is never negative
      if (nGrams == 0) assert(nll == 0.0)
    }
  }

  test("curate equals the composed gopher + repetition + dedup path") {
    val cases = sample(80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = cases.toDF("doc_id", "text")
    val fused = TextAnalysis.curate(df, "doc_id", "text",
      minWords = 2, minStopHits = 0, maxDupLineFrac = 0.5, maxDupNgramFrac = 0.5)
      .orderBy($"doc_id").as[(Long, Int, Double)].collect().toSeq
    val rep = df.select($"doc_id",
      TextAnalysis.dupLineFrac($"text").as("dlf"),
      TextAnalysis.dupNgramFrac($"text", 5).as("dgf"),
      TextAnalysis.fingerprint($"text").as("fp"))
    val composed = TextAnalysis.gopherReport(df, "doc_id", "text",
        minWords = 2, minStopHits = 0)
      .join(rep, "doc_id")
      .filter($"keep" && $"dlf" < 0.5 && $"dgf" < 0.5)
      .groupBy($"fp")
      .agg(min_by(struct($"doc_id", $"n_words", $"dlf"), $"doc_id").as("r"))
      .select($"r.doc_id", $"r.n_words", $"r.dlf")
      .orderBy($"doc_id").as[(Long, Int, Double)].collect().toSeq
    assert(fused == composed)
  }

  test("curateFuzzy equals the composed curate -> minhash -> components path") {
    // plant one-word variants so the fuzzy stage has real work: variants
    // share all but one shingle with their original (jaccard |A|/(|A|+1))
    val baseCases = sample(60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val cases = baseCases ++
      baseCases.map { case (i, t) => (i + 1000L, (t + " zzvariant").trim) }
    val df = cases.toDF("doc_id", "text")
    val fused = TextAnalysis.curateFuzzy(df, "doc_id", "text",
      minWords = 2, minStopHits = 0, maxDupLineFrac = 0.5, maxDupNgramFrac = 0.5,
      maxBucket = Int.MaxValue, jaccardThreshold = 0.8)
      .orderBy($"doc_id").as[(Long, Int, Double)].collect().toSeq
    val surv = TextAnalysis.curate(df, "doc_id", "text",
      minWords = 2, minStopHits = 0, maxDupLineFrac = 0.5, maxDupNgramFrac = 0.5)
    val pairs = Dedup.minhashDedup(surv.join(df, Seq("doc_id")), "doc_id", "text",
      maxBucket = Int.MaxValue, threshold = 0.8)
    val drop = Dedup.components(pairs).filter($"id" =!= $"label")
      .select($"id".as("doc_id"))
    val composed = surv.join(drop, Seq("doc_id"), "left_anti")
      .orderBy($"doc_id").as[(Long, Int, Double)].collect().toSeq
    assert(fused == composed)
  }

  test("substring pairs: planted clones always pair, sharing every window") {
    val base = sample(25).zipWithIndex.collect {
      case (t, i) if t.split("\\s+").count(_.nonEmpty) >= 1 => (i.toLong, t)
    }
    val planted = base.map { case (id, t) => (id + 1000L, t) }
    val pairs = Dedup.substringPairs((base ++ planted).toDF("doc_id", "text"),
      "doc_id", "text", windowTokens = 4, maxBucket = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSeq
      .map(p => (p._1, p._2) -> p._3).toMap
    base.foreach { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val expectWindows = math.max(toks.length - 4 + 1, 1) // whole-text fallback
      val distinctWindows =
        if (toks.length >= 4) toks.sliding(4).map(_.mkString(" ")).toSet.size
        else 1
      assert(pairs.get((id, id + 1000L)).contains(distinctWindows.toLong),
        s"doc $id ('$t'): expected $distinctWindows shared windows (raw $expectWindows)")
    }
  }

  test("mixturePlan: knobs compose back to the target share on any mass distribution") {
    // random per-key token masses + random normalized targets: applying the
    // RAW ratio to each key's mass must land exactly on target_share * total
    // (the keep_prob/extra_epochs decomposition only discretizes this)
    val gen = for {
      k <- Gen.chooseNum(2, 6)
      masses <- Gen.listOfN(k, Gen.chooseNum(1000L, 900000L))
      weights <- Gen.listOfN(k, Gen.chooseNum(1, 100))
    } yield (masses, weights.map(_.toDouble))
    val cases = Gen.listOfN(6, gen).sample.getOrElse(Seq((List(600L, 400L), List(1.0, 1.0))))
    cases.zipWithIndex.foreach { case ((masses, ws), ci) =>
      val keys = masses.indices.map(i => s"k$ci-$i")
      val targets = keys.zip(ws.map(_ / ws.sum)).toMap
      val rows = keys.zip(masses).zipWithIndex.map { case ((k, m), i) => (i.toLong, k, m) }
      val plan = Sampling.mixturePlan(rows.toDF("id", "key", "tok"), "key", "tok", targets)
        .select("key", "tokens", "ratio", "keep_prob", "extra_epochs", "last_epoch_keep")
        .as[(String, Long, Double, Double, Long, Double)].collect()
      assert(plan.map(_._1).toSet == keys.toSet)
      val total = masses.sum.toDouble
      plan.foreach { case (k, tokens, ratio, keepProb, extraEpochs, lastKeep) =>
        // ratio * natural mass == target mass (up to the documented 6dp rounding)
        assert(math.abs(tokens * ratio - targets(k) * total) <= total * 1e-5,
          s"$k: $tokens * $ratio !~ ${targets(k)} * $total")
        assert(keepProb == math.min(1.0, ratio))
        assert(extraEpochs == math.max(0L, math.ceil(ratio).toLong - 1))
        // the knobs REALIZE the ratio exactly (to the 6dp rounding), not
        // just bracket it: shrink via keep_prob, grow via extra_epochs full
        // epochs plus a last_epoch_keep fraction of one more
        val realized = if (ratio <= 1.0) keepProb else extraEpochs + lastKeep
        assert(math.abs(realized - ratio) <= 2e-6, s"$k: knobs realize $realized, ratio $ratio")
      }
    }
  }
}
