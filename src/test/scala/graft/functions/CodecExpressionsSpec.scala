package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SparkTestSession

class CodecExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("codegen'd codec expressions agree with the Scala kernels, via SQL and Column APIs") {
    CodecExpressions.register(spark)
    val vs = Seq(0L, 1L, -1L, 127L, 128L, -24000L, Long.MaxValue, Long.MinValue,
      0x7ffffffffL, -987654321L)
    val df = vs.toDF("v")
    df.createOrReplaceTempView("vals")
    val got = spark.sql(
      """SELECT v, prefix_varint_len(zigzag_encode(v)) AS len,
                zigzag_decode(zigzag_encode(v)) AS back FROM vals""")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (v, len, back) =>
      assert(len === graft.core.PrefixVarInt.len(graft.core.PrefixVarInt.zigzagEncode(v)))
      assert(back === v)
    }
    // whole-stage codegen actually covers the expression (no fallback) —
    // use a file-backed scan so the plan isn't constant-folded away
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val proj = li.select(CodecExpressions.zigzag_encode($"l_orderkey").as("z"))
    val plan = proj.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage; the
    // projection carrying zigzag_encode must be starred (not fallen back)
    assert(plan.linesIterator.next().trim.startsWith("*(1) Project [zigzag_encode"),
      s"expected the zigzag projection inside a codegen stage:\n$plan")
    assert(proj.agg(org.apache.spark.sql.functions.min($"z")).head.getLong(0) >= 0L)
  }

  test("type checking rejects non-bigint input") {
    CodecExpressions.register(spark)
    val ex = intercept[Exception] {
      Seq("x").toDF("s").selectExpr("zigzag_encode(s)").collect()
    }
    assert(ex.getMessage.contains("bigint"))
  }
}
