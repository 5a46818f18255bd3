package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over an embedding column (`array<float>`).
  * All math is built from codegen'd collection functions (`zip_with`,
  * `aggregate`) — no UDFs on the hot path.
  */
object Similarity {

  /** Dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    *
    * Scale shape: the query set is broadcast (queries are the small side
    * by construction); the corpus streams through one codegen'd stage and
    * the only shuffle is the per-query top-k window, which carries k' =
    * corpus×queries/parallelism candidate rows — at 100 TB you'd cap the
    * candidates per partition first (see [[lshTopK]] for the scale path).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic random hyperplanes for sign-LSH: plane p, dim d ->
    * component from a splitmix64 of (seed, p, d), mapped to [-1, 1).
    */
  private def hyperplane(seed: Long, p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var h = seed + p.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      h = h ^ (h >>> 31)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  /** Sign-LSH bucket id: `planes` hyperplane sign bits packed into a long.
    * Pure Catalyst expression over the embedding array.
    */
  def lshBucket(vec: Column, dim: Int, planes: Int = 12, seed: Long = 42L): Column = {
    val bits = (0 until planes).map { p =>
      val plane = hyperplane(seed, p, dim)
      val planeCol = array(plane.map(lit): _*)
      when(dot(asDouble(vec), planeCol) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via sign-LSH bucketing: candidates are corpus vectors sharing the
    * query's bucket (plus optional multiprobe neighbors at hamming
    * distance 1), ranked by exact cosine within the bucket.
    *
    * This is the 100 TB path: the corpus is grouped by bucket once
    * (shuffle ∝ corpus size, reusable across query batches) and each
    * query touches only its bucket's candidates instead of the full
    * corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 12, multiprobe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), dim, planes))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), dim, planes))
    // multiprobe: also probe every bucket at hamming distance 1
    val q =
      if (!multiprobe) q0
      else q0.withColumn("bucket",
          explode(array((lit(0L) +: (0 until planes).map(p => lit(1L << p)))
            .map(flip => col("bucket").bitwiseXOR(flip)): _*)))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
