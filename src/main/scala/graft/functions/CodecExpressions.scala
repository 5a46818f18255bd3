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

/** Encode one raw u64 to its prefix-varint bytes (reference:
  * `to_prefix_varint_bytes`, /root/reference/src/core.rs:190-195) — the
  * codec itself at the SQL surface, inside whole-stage codegen.
  */
case class EncodePrefixVarint(child: Expression) extends CodecExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullSafeEval(v: Any): Any =
    graft.core.PrefixVarInt.toBytes(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.PrefixVarInt.toBytes($c)")
  override protected def withNewChildInternal(c: Expression): EncodePrefixVarint = copy(c)
  override def prettyName: String = "encode_prefix_varint"
}

/** Decode one prefix-varint value from a binary column (reference:
  * `decode_prefix_varint`, /root/reference/src/core.rs:180-188); raises
  * DecodeError on truncated input like the reference's Err.
  */
case class DecodePrefixVarint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.core.PrefixVarInt.decodeValue(v.asInstanceOf[Array[Byte]], 0)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.PrefixVarInt.decodeValue($c, 0)")
  override protected def withNewChildInternal(c: Expression): DecodePrefixVarint = copy(c)
  override def prettyName: String = "decode_prefix_varint"
}

object CodecExpressions {

  /** Register all codec expressions as SQL functions on the session
    * (builders come from the single [[GraftFunctions.all]] table).
    */
  def register(spark: SparkSession): Unit = {
    Seq("prefix_varint_len", "zigzag_encode", "zigzag_decode",
      "encode_prefix_varint", "decode_prefix_varint")
      .foreach(GraftFunctions.registerOne(spark, _))
    SimHash64.register(spark)
  }

  import org.apache.spark.sql.functions.call_function
  def prefix_varint_len(c: Column): Column = call_function("prefix_varint_len", c)
  def zigzag_encode(c: Column): Column = call_function("zigzag_encode", c)
  def zigzag_decode(c: Column): Column = call_function("zigzag_decode", c)
  def encode_prefix_varint(c: Column): Column = call_function("encode_prefix_varint", c)
  def decode_prefix_varint(c: Column): Column = call_function("decode_prefix_varint", c)
}
