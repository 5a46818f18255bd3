package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column as ONE single-pass native
  * expression, returning the grams SORTED ascending (UTF8String binary
  * order — ready for [[SortedJaccardGE]]'s merge kernel).
  *
  * Produces exactly the same gram set as the declarative form
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(trim(text), "\\s+"), i, k))))` ([[graft.ops.Dedup.shingles]],
  * equivalence property-tested in OpsSpec), but in one pass with no
  * intermediate token/slice arrays — the declarative chain generates
  * O(tokens · k) slice+concat work and was the dominant cost of the
  * n-gram similarity pipeline at SF.
  */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires (string, int literal), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(text: Any, k: Any): Any =
    WordNGrams.compute(text.asInstanceOf[UTF8String].toString,
      k.asInstanceOf[Int])

  /** The kernel is a static call, so the surrounding stage stays inside
    * whole-stage codegen (round 4's CodegenFallback fenced the d5/d7
    * shingling stage out of it — PlanSpec gates the star now).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, k) =>
      s"${ev.value} = graft.functions.WordNGrams$$.MODULE$$.compute(" +
        s"$text.toString(), $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_ngrams"
}

object WordNGrams {

  def compute(text: String, k: Int): GenericArrayData = {
    // token spans replicating the declarative form byte-for-byte:
    // SQL trim() strips 0x20 spaces only; Java-regex "\s" is the ASCII
    // class [ \t\n\x0B\f\r]; a leading separator yields a leading ""
    // token (Java split semantics), trailing empties are dropped
    val s = {
      var b = 0
      var e = text.length
      while (b < e && text.charAt(b) == ' ') b += 1
      while (e > b && text.charAt(e - 1) == ' ') e -= 1
      text.substring(b, e)
    }
    @inline def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    val n = s.length
    if (n == 0) { starts += 0; ends += 0 }
    else {
      var i = 0
      if (ws(s.charAt(0))) { // leading separator: leading empty token
        starts += 0; ends += 0
        while (i < n && ws(s.charAt(i))) i += 1
      }
      while (i < n) {
        val tokStart = i
        while (i < n && !ws(s.charAt(i))) i += 1
        starts += tokStart; ends += i
        while (i < n && ws(s.charAt(i))) i += 1
      }
    }
    val nTok = starts.length
    val nWin = math.max(nTok - (k - 1), 1)
    val seen = new java.util.TreeSet[UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var w = 0
    while (w < nWin) {
      sb.setLength(0)
      val last = math.min(w + k, nTok)
      var t = w
      while (t < last) {
        if (t > w) sb.append(' ')
        sb.append(s, starts(t), ends(t))
        t += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      w += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerOne(spark, "word_ngrams")

  /** Column-level entry point; requires [[register]] on the session. */
  def wordNgrams(text: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("word_ngrams", text,
      org.apache.spark.sql.functions.lit(k))
}
