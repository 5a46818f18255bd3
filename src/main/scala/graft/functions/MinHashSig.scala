package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of a shingle set as a native Catalyst expression:
  * each shingle is hashed ONCE (FNV-1a over its UTF-8 bytes + a
  * splitmix64 avalanche) and the `numHashes` signature lanes are derived
  * by cheap integer mixes of that base hash with per-lane keys.
  *
  * Round 1 built the signature from `numHashes` separate
  * `xxhash64(shingle, seed, i)` Columns — 32 full string hashes per
  * shingle and 32 passes over the shingle array; this is one pass and one
  * string hash (the d5 pipeline's dominant cost at SF). Lane mixing
  * follows the standard 2-universal construction (h_i = mix(h ^ key_i)),
  * which preserves the min-wise independence MinHash needs in practice.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1 && numHashes <= 512, s"numHashes out of range: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<string>, got $other")
    }

  @transient private lazy val laneKeys: Array[Long] =
    Array.tabulate(numHashes)(i => MinHashSig.avalanche(seed + 0x9e3779b97f4a7c15L * (i + 1)))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = MinHashSig.baseHash(s.getBytes)
        var i = 0
        while (i < numHashes) {
          val v = MinHashSig.avalanche(h ^ laneKeys(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  /** FNV-1a over bytes, avalanche-finished. */
  @inline private[functions] def baseHash(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    avalanche(h)
  }

  /** splitmix64 finalizer. */
  @inline private[functions] def avalanche(x: Long): Long = {
    var h = x + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerOne(spark, "minhash_sig")

  /** Column entry point; requires [[register]] on the session. */
  def minhashSig(shingles: Column, numHashes: Int, seed: Long): Column =
    org.apache.spark.sql.functions.call_function("minhash_sig",
      shingles, org.apache.spark.sql.functions.lit(numHashes),
      org.apache.spark.sql.functions.lit(seed))
}
