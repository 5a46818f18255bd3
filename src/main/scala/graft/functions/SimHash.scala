package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text as a native Catalyst
  * expression (preference order: custom Expression over UDF — no
  * ser/deser of a Scala closure per row, null handling for free).
  *
  * Each token is hashed with a splitmix64-style avalanche; every hash bit
  * votes +1/-1 per token; the sign of each bit's tally forms the hash.
  * Near-duplicate texts differ in few bits (compare via hamming distance
  * = bit_count(a ^ b)).
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    java.lang.Long.valueOf(SimHash64.compute(s))
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  def compute(text: String): Long = {
    val votes = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      val isSep = i == n || Character.isWhitespace(text.charAt(i))
      if (isSep) {
        if (i > start) {
          val h = hashToken(text, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** FNV-1a over UTF-16 code units, finished with a splitmix64 avalanche. */
  @inline private def hashToken(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Register the expression in a session's function registry (the public
    * path to inject a custom Expression without sql-internal bridges),
    * then build Columns via `call_function`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerOne(spark, "simhash64")

  /** Column-level entry point; requires [[register]] on the session. */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash64", c)
}
