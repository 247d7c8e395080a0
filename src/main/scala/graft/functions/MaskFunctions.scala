package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BinaryType, ByteType, DateType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Hive mask scalar-function family with character-exact semantics
  * (goldens: /root/reference/src/test/java/com/hw/security/flink/common/CommonTest.java:78-93,
  * execute/ExecuteDataMaskTest.java:71-102).
  *
  * Everything is composed from built-in Catalyst expressions
  * (`Mask`/`Substring`/`Concat`/`Sha2`/...), so masked queries stay inside
  * whole-stage codegen — no UDF boxing on the hot path, which matters when a
  * masked projection runs over 100 TB.
  *
  * Semantics implemented (from the reference's golden strings):
  *   - mask(s[,u,l,d,o]): upper->u ('X'), lower->l ('x'), digit->d ('n'),
  *     other->o (-1 = retain).
  *   - mask(s,u,l,d,o,num,day,month,year): date variant — component values of
  *     -1 mean "keep"; `month` is 0-based when set (Hive quirk); returns DATE.
  *   - mask_first_n(s, n=4, ...): mask the first n chars, retain the rest.
  *   - mask_last_n(s, n=4, ...): retain all but the last n chars.
  *   - mask_show_first_n(s, n=4, ...): retain the first n chars, mask rest.
  *   - mask_show_last_n(s, n=4, ...): mask all but the last n chars.
  *   - mask_hash(s): lowercase sha256 hex digest.
  *
  * Numeric inputs (Hive's `numberChar` behavior, unexercised by the
  * reference's own tests): for integral-typed inputs every digit in the
  * masked region is replaced by `numberChar` (a single digit, default '1';
  * Hive falls back to 1 for non-digit values), the sign is preserved, digit
  * count is preserved, and the ORIGINAL numeric type is returned (a masked
  * BIGINT stays a BIGINT). The n window of the *_n variants counts digits,
  * not characters — the sign does not occupy a position. An all-9s mask of a
  * 19-digit long can exceed Long.MaxValue; the TRY-mode cast back yields
  * NULL rather than a wrapped or throwing result. `numberChar` on STRING
  * inputs is accepted-and-ignored exactly as in Hive (digits in strings use
  * the `digit` char argument instead).
  */
object MaskFunctions {

  private val MaxLen = Literal(Int.MaxValue)

  // Hive char-args may be 1-char strings or the int -1 meaning "retain".
  // Spark's Mask uses NULL for "retain".
  private def charArg(e: Expression): Expression = e match {
    case lit if lit.resolved && lit.foldable =>
      val v = lit.eval()
      v match {
        case i: Int if i == -1 => Literal(null, StringType)
        case l: Long if l == -1L => Literal(null, StringType)
        case null => Literal(null, StringType)
        case _ => Cast(lit, StringType)
      }
    case other => Cast(other, StringType)
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case lit if lit.resolved && lit.foldable =>
      lit.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$what must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  /** mask(substr) with normalized char args; defaults X/x/n/retain. */
  private def maskCore(s: Expression, chars: Seq[Expression]): Expression = {
    val u = chars.lift(0).map(charArg).getOrElse(Literal("X"))
    val l = chars.lift(1).map(charArg).getOrElse(Literal("x"))
    val d = chars.lift(2).map(charArg).getOrElse(Literal("n"))
    val o = chars.lift(3).map(charArg).getOrElse(Literal(null, StringType))
    Mask(s, u, l, d, o)
  }

  /** Position of the char after the first (len(s)-n) chars, floored at 1. */
  private def lastNStart(s: Expression, n: Expression): Expression =
    Greatest(Seq(Add(Subtract(Length(s), n), Literal(1)), Literal(1)))

  private def isIntegral(e: Expression): Boolean = e.resolved && (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  })

  /** Hive numberChar: a single digit; anything else falls back to '1'. */
  private def numberCharOf(e: Option[Expression]): String = e match {
    case Some(lit) if lit.resolved && lit.foldable =>
      lit.eval() match {
        case i: Int if i >= 0 && i <= 9 => i.toString
        case l: Long if l >= 0 && l <= 9 => l.toString
        case u: UTF8String if u.numChars == 1 && u.toString.head.isDigit => u.toString
        case _ => "1"
      }
    case _ => "1"
  }

  /** Digit-wise mask of an integral value: `f(digits, len, nc)` rewrites the
    * unsigned decimal digit string, the sign is re-attached, and the result
    * casts back to the input type in TRY mode (an all-9s 19-digit long can
    * overflow — NULL beats a wrapped value under a masking policy).
    */
  private def numericMask(n: Expression, ncStr: String)(
      f: (Expression, Expression, Expression) => Expression): Expression = {
    val str = Cast(n, StringType)
    val neg = StartsWith(str, Literal("-"))
    val d = If(neg, Substring(str, Literal(2), MaxLen), str)
    val masked = f(d, Length(d), Literal(ncStr))
    val signed = If(neg, Concat(Seq(Literal("-"), masked)), masked)
    Cast(signed, n.dataType, None, EvalMode.TRY)
  }

  def maskBuilder(args: Seq[Expression]): Expression = args match {
    // date variant: mask(col, u, l, d, o, num, day, month, year)
    case Seq(c, _, _, _, _, _, dayE, monthE, yearE) =>
      val (day, month, year) =
        (intLit(dayE, "day"), intLit(monthE, "month"), intLit(yearE, "year"))
      val col = Cast(c, DateType)
      val y = if (year == -1) Year(col) else Literal(year)
      val m = if (month == -1) Month(col) else Literal(month + 1) // Hive month arg is 0-based
      val d = if (day == -1) DayOfMonth(col) else Literal(day)
      MakeDate(y, m, d)
    case s +: chars if chars.length <= 5 && isIntegral(s) =>
      numericMask(s, numberCharOf(chars.lift(4)))((_, len, nc) => StringRepeat(nc, len))
    case s +: chars if chars.length <= 5 =>
      maskCore(Cast(s, StringType), chars) // numberChar (5th) ignored for strings, as in Hive
    case _ => throw new IllegalArgumentException(
      s"mask expects 1-6 or 9 arguments, got ${args.length}")
  }

  /** mask_first_n: mask chars [1..n], retain the rest. */
  def maskFirstN(args: Seq[Expression]): Expression = {
    val n = args.lift(1).getOrElse(Literal(4))
    val chars = args.drop(2)
    if (isIntegral(args.head))
      numericMask(args.head, numberCharOf(chars.lift(4))) { (d, len, nc) =>
        Concat(Seq(StringRepeat(nc, Least(Seq(n, len))),
          Substring(d, Add(n, Literal(1)), MaxLen)))
      }
    else {
      val s = Cast(args.head, StringType)
      Concat(Seq(
        maskCore(Substring(s, Literal(1), n), chars),
        Substring(s, Add(n, Literal(1)), MaxLen)))
    }
  }

  /** mask_last_n: retain chars [1..len-n], mask the rest. */
  def maskLastN(args: Seq[Expression]): Expression = {
    val n = args.lift(1).getOrElse(Literal(4))
    val chars = args.drop(2)
    if (isIntegral(args.head))
      numericMask(args.head, numberCharOf(chars.lift(4))) { (d, len, nc) =>
        Concat(Seq(Substring(d, Literal(1), Subtract(len, n)),
          StringRepeat(nc, Least(Seq(n, len)))))
      }
    else {
      val s = Cast(args.head, StringType)
      Concat(Seq(
        Substring(s, Literal(1), Subtract(Length(s), n)),
        maskCore(Substring(s, lastNStart(s, n), MaxLen), chars)))
    }
  }

  /** mask_show_first_n: retain chars [1..n], mask the rest. */
  def maskShowFirstN(args: Seq[Expression]): Expression = {
    val n = args.lift(1).getOrElse(Literal(4))
    val chars = args.drop(2)
    if (isIntegral(args.head))
      numericMask(args.head, numberCharOf(chars.lift(4))) { (d, len, nc) =>
        Concat(Seq(Substring(d, Literal(1), n),
          StringRepeat(nc, Greatest(Seq(Subtract(len, n), Literal(0))))))
      }
    else {
      val s = Cast(args.head, StringType)
      Concat(Seq(
        Substring(s, Literal(1), n),
        maskCore(Substring(s, Add(n, Literal(1)), MaxLen), chars)))
    }
  }

  /** mask_show_last_n: mask chars [1..len-n], retain the rest. */
  def maskShowLastN(args: Seq[Expression]): Expression = {
    val n = args.lift(1).getOrElse(Literal(4))
    val chars = args.drop(2)
    if (isIntegral(args.head))
      numericMask(args.head, numberCharOf(chars.lift(4))) { (d, len, nc) =>
        Concat(Seq(StringRepeat(nc, Greatest(Seq(Subtract(len, n), Literal(0)))),
          Substring(d, lastNStart(d, n), MaxLen)))
      }
    else {
      val s = Cast(args.head, StringType)
      Concat(Seq(
        maskCore(Substring(s, Literal(1), Subtract(Length(s), n)), chars),
        Substring(s, lastNStart(s, n), MaxLen)))
    }
  }

  /** mask_hash: lowercase sha256 hex (CommonTest.java:84-85). */
  def maskHash(args: Seq[Expression]): Expression =
    Lower(Sha2(Cast(args.head, BinaryType), Literal(256)))

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mask" -> maskBuilder _, // extends the builtin with the 9-arg date form
    "mask_first_n" -> maskFirstN _,
    "mask_last_n" -> maskLastN _,
    "mask_show_first_n" -> maskShowFirstN _,
    "mask_show_last_n" -> maskShowLastN _,
    "mask_hash" -> maskHash _
  )

  /** Register the family in the session's FunctionRegistry so they resolve in
    * SQL text and in policy transformer templates.
    */
  // sessions already registered — "mask" must REPLACE the narrower builtin
  // (a functionExists check would see the builtin and skip), but replacing it
  // on every call logs a "function replaced" warning per call. Weak keys: the
  // guard must not pin a stopped session in memory.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      val registry = spark.sessionState.functionRegistry
      builders.foreach { case (name, b) =>
        registry.createOrReplaceTempFunction(name, b, "scala_udf")
      }
    }
}
