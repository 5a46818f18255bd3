package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Exact Jaccard of two SORTED string arrays by a single merge pass, with
  * the PPJoin-style early exit folded in: while merging, if the best
  * still-achievable overlap (`inter + min(remaining_a, remaining_b)`)
  * can no longer reach the `t`-threshold requirement
  * `inter >= t/(1+t) * (|A|+|B|)`, evaluation stops and returns -1.0
  * (a sentinel strictly below any real Jaccard, so a `>= t` filter drops
  * it). For surviving pairs the returned value is the EXACT Jaccard —
  * the early exit only fires on a proof of `J < t`, so a
  * `sorted_jaccard_ge(a, b, t) >= t` filter is equivalent to computing
  * the full `|A∩B| / |A∪B|` and filtering, at a fraction of the cost:
  * the merge is branch-predictable binary string compares with no
  * per-row hash-set build (`array_intersect`), no union materialization
  * (union size = |A|+|B|-inter), and most non-matching pairs exit within
  * the first few elements.
  *
  * INPUTS MUST BE SORTED ascending by Spark's string ordering
  * (UTF8String binary order — `sort_array` produces exactly this);
  * unsorted inputs return garbage, so callers own the sort (see
  * [[graft.ops.Dedup.ngramJaccard]]).
  */
case class SortedJaccardGE(first: Expression, second: Expression,
                           third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), DoubleType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_jaccard_ge requires (array<string>, array<string>, double), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val th = t.asInstanceOf[Double]
    java.lang.Double.valueOf(SortedJaccardGE.compute(x, y, th))
  }

  /** Static-call codegen: the d5/d7 verify Project stays inside
    * whole-stage codegen like [[CosineSim]] (PlanSpec gates the star).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) =>
      s"${ev.value} = graft.functions.SortedJaccardGE$$.MODULE$$.compute($a, $b, $t);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedJaccardGE =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "sorted_jaccard_ge"
}

object SortedJaccardGE {

  def compute(x: ArrayData, y: ArrayData, t: Double): Double = {
    val na = x.numElements()
    val nb = y.numElements()
    if (na == 0 || nb == 0) return -1.0
    // need > this many shared elements for J >= t; the 1e-9 slack makes
    // the exit CONSERVATIVE (never fires on a borderline true pair)
    val need = t / (1.0 + t) * (na + nb) - 1e-9
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val remaining = math.min(na - i, nb - j)
      if (inter + remaining < need) return -1.0
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) -1.0 else inter.toDouble / union
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerOne(spark, "sorted_jaccard_ge")

  /** Column-level entry point; requires [[register]] on the session. */
  def sortedJaccardGe(a: Column, b: Column, t: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_jaccard_ge", a, b, t)
}
