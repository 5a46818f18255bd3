package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic dense global dictionary `value -> code in [0, card)`.
  *
  * Scales to high-cardinality columns: distinct values are hash-bucketed,
  * per-bucket counts (tiny — one row per bucket) give cumulative offsets,
  * and each bucket assigns `offset + row_number() - 1` under a window
  * partitioned BY BUCKET — so no single-partition window exists anywhere
  * and the heaviest operation is one distinct + one bounded window.
  * Codes are deterministic across runs and cluster sizes (bucket id and
  * in-bucket order are pure functions of the value).
  */
object GlobalDictionary {

  /** @return DataFrame(value, code) with dense deterministic codes. */
  def build(df: DataFrame, column: String, buckets: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val distinct = df.select(col(column).cast("string").as("value"))
      .where($"value".isNotNull).distinct()
    val bucketed = distinct.withColumn("_b", pmod(xxhash64($"value"), lit(buckets.toLong)))
    // one row per bucket; the cumulative offset is a running sum over
    // those <= `buckets` rows — a bounded single-partition window, NOT a
    // driver collect (round 10): the collect forced one eager job per
    // dictionary on the driver's critical path (three per derive), where
    // this lazy form folds into the caller's job and lets AQE overlap
    // the three dictionaries' stages
    val counts = bucketed.groupBy("_b").agg(count(lit(1)).as("_c"))
    val offW = Window.orderBy($"_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = counts
      .withColumn("_off", coalesce(sum($"_c").over(offW), lit(0L)))
      .select($"_b", $"_off")
    val w = Window.partitionBy($"_b").orderBy($"value")
    bucketed.join(broadcast(offDf), "_b")
      .withColumn("code", ($"_off" + row_number().over(w) - 1).cast("long"))
      .select($"value", $"code")
  }
}
