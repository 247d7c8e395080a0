package graft.functions

import graft.SparkFunSuite
import org.scalacheck.Gen

/** Property tests for the mask family (SURVEY §5 port strategy): length
  * preservation, character-class behavior, idempotence classes, hash
  * stability. Evaluated through the SQL surface in batches (one Spark job per
  * property, not per case).
  */
class MaskPropertiesSpec extends SparkFunSuite {

  import spark.implicits._

  private lazy val registered = { MaskFunctions.register(spark); true }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '-', '#', '.', '_')))
      .map(_.mkString).suchThat(_.length <= 64)

  private def maskAll(fn: String, inputs: Seq[String]): Seq[String] = {
    assert(registered)
    inputs.toDF("s").selectExpr(s"$fn AS m").as[String].collect().toSeq
  }

  test("mask preserves length and character classes") {
    val samples = Gen.listOfN(80, asciiText).sample.getOrElse(Seq("abcDEF123-#"))
    val masked = maskAll("mask(s)", samples)
    samples.zip(masked).foreach { case (in, out) =>
      assert(out.length == in.length)
      in.zip(out).foreach { case (i, o) =>
        if (i.isUpper) assert(o == 'X')
        else if (i.isLower) assert(o == 'x')
        else if (i.isDigit) assert(o == 'n')
        else assert(o == i) // other chars retained
      }
    }
  }

  test("mask is idempotent on digit-free strings") {
    // NOT idempotent in general: digit -> 'n', and 'n' is lowercase -> 'x'
    // on a second pass (faithful to Hive). X -> X and x -> x are stable.
    val samples = Gen.listOfN(50, asciiText).sample.getOrElse(Seq("abcDEF"))
      .map(_.filterNot(_.isDigit))
    val once = maskAll("mask(s)", samples)
    val twice = maskAll("mask(s)", once)
    assert(once == twice)
  }

  test("show_first_n + show_last_n cover the string exactly") {
    val samples = Gen.listOfN(50, asciiText).sample.getOrElse(Seq("abcdefgh"))
    val first = maskAll("mask_show_first_n(s, 4)", samples)
    val last = maskAll("mask_show_last_n(s, 4)", samples)
    samples.zip(first.zip(last)).foreach { case (in, (f, l)) =>
      assert(f.length == in.length && l.length == in.length)
      assert(f.take(math.min(4, in.length)) == in.take(math.min(4, in.length)))
      assert(l.takeRight(math.min(4, in.length)) == in.takeRight(math.min(4, in.length)))
    }
  }

  test("mask_first_n(s, n) == reverse semantics of mask_show_last_n(s, len-n)") {
    val samples = Seq("hive-HDFS-8765-4321", "abc", "", "ABCDEFGH")
    val a = maskAll("mask_first_n(s, 4)", samples)
    samples.zip(a).foreach { case (in, out) =>
      assert(out.drop(4) == in.drop(4)) // tail untouched
    }
  }

  test("mask_hash is stable, lowercase hex, and injective on samples") {
    val samples = Gen.listOfN(60, asciiText).sample.getOrElse(Seq("a", "b")).distinct
    val h1 = maskAll("mask_hash(s)", samples)
    val h2 = maskAll("mask_hash(s)", samples)
    assert(h1 == h2)
    h1.foreach(h => assert(h.matches("[0-9a-f]{64}")))
    assert(h1.distinct.length == samples.length) // no collisions on sample set
  }
}
