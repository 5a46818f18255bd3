package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Codec kernels as native Catalyst expressions WITH whole-stage codegen
  * (`doGenCode` emits a static call into the codec object's forwarder),
  * so they run inside the same generated loop as the surrounding plan —
  * no UDF ser/deser, no codegen fence.
  */
trait CodecExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType}")
}

/** Encoded prefix-varint byte length (1..9) of a raw u64
  * (reference semantics: /root/reference/src/raw.rs:9-36).
  */
case class PrefixVarintLen(child: Expression) extends CodecExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    graft.core.PrefixVarInt.len(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.PrefixVarInt.len($c)")
  override protected def withNewChildInternal(c: Expression): PrefixVarintLen = copy(c)
  override def prettyName: String = "prefix_varint_len"
}

/** Zigzag i64 -> u64 (reference: /root/reference/src/core.rs:56-58). */
case class ZigZagEncode(child: Expression) extends CodecExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.core.PrefixVarInt.zigzagEncode(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.PrefixVarInt.zigzagEncode($c)")
  override protected def withNewChildInternal(c: Expression): ZigZagEncode = copy(c)
  override def prettyName: String = "zigzag_encode"
}

/** Zigzag u64 -> i64 inverse (reference: /root/reference/src/core.rs:62-64). */
case class ZigZagDecode(child: Expression) extends CodecExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.core.PrefixVarInt.zigzagDecode(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.PrefixVarInt.zigzagDecode($c)")
  override protected def withNewChildInternal(c: Expression): ZigZagDecode = copy(c)
  override def prettyName: String = "zigzag_decode"
}

object CodecExpressions {

  /** Register all codec expressions as SQL functions on the session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("prefix_varint_len",
      es => PrefixVarintLen(es.head), "built-in")
    reg.createOrReplaceTempFunction("zigzag_encode",
      es => ZigZagEncode(es.head), "built-in")
    reg.createOrReplaceTempFunction("zigzag_decode",
      es => ZigZagDecode(es.head), "built-in")
    SimHash64.register(spark)
  }

  import org.apache.spark.sql.functions.call_function
  def prefix_varint_len(c: Column): Column = call_function("prefix_varint_len", c)
  def zigzag_encode(c: Column): Column = call_function("zigzag_encode", c)
  def zigzag_decode(c: Column): Column = call_function("zigzag_decode", c)
}
