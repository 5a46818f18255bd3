package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash64

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup. All are
  * declarative DataFrame plans (inverted-index joins, not cross joins),
  * sized for the 100 TB case: nothing materializes O(n^2) pairs.
  */
object Dedup {

  /** Exact dedup: one representative (min id) + duplicate count per
    * distinct text. Groups by sha2(text) so the shuffle carries a 32-byte
    * key rather than the full document (100 TB shape); collision odds are
    * negligible (2^-128 scale).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_id"), col("dup_count"))

  /** Distinct word k-shingles of a text column. */
  def shingles(text: Column, k: Int = 5): Column = {
    val tokens = split(trim(text), "\\s+")
    val nWin = greatest(size(tokens) - (k - 1), lit(1))
    array_distinct(transform(sequence(lit(1), nWin),
      i => concat_ws(" ", slice(tokens, i, lit(k)))))
  }

  /** MinHash signature (numHashes entries) over the shingle set:
    * sig_i = min over shingles of xxhash64(shingle, seed, i). Each
    * permutation is an independent keyed hash — no modular arithmetic, so
    * it stays inside ANSI-mode codegen (no overflow).
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 32,
                       seed: Long = 42L): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol,
        s => xxhash64(s, lit(seed), lit(i.toLong))))
    }: _*)

  /** MinHash + LSH near-duplicate pairs: shingle → 32-hash signature →
    * `bands` banded buckets → same-bucket candidate join → exact Jaccard
    * verification on the shingle sets, keeping pairs ≥ threshold.
    *
    * Scale: the only shuffles are the band-bucket self-join (keys are
    * (band, 64-bit bucket hash) — skew-safe because identical signatures
    * imply near-identical docs) and the verify join by id.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 5, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.7, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val base = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
    val banded = base.select(col("id"), col("sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bucket"))
    val left = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val right = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup candidates: 64-bit simhash (custom Catalyst
    * expression), pairs within `maxHamming` bits found by joining on
    * rotated 16-bit blocks (any pair within hamming distance ≤ 3 shares
    * at least one of the 4 blocks exactly — pigeonhole).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    graft.functions.SimHash64.register(df.sparkSession)
    val hashed = df.select(col(idCol).as("id"),
      simhash64(col(textCol)).as("simhash"))
    val blocked = hashed.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("blk"),
          col("simhash").bitwiseAND(lit(0xffffL << (16 * b))).as("blkval"))
      }: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.blk"), col("bb.blkval"))
    val l = blocked.select(col("blk"), col("blkval"),
      col("id").as("id_a"), col("simhash").as("h_a"))
    val r = blocked.select(col("blk"), col("blkval"),
      col("id").as("id_b"), col("simhash").as("h_b"))
    l.join(r, Seq("blk", "blkval"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard similarity via an inverted-index join (no cross
    * join): explode distinct grams, join postings, count intersections,
    * derive |union| = |A| + |B| - |A∩B|.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("grams"))
    val sizes = base.select(col("id"), size(col("grams")).as("sz"))
    val postings = base.select(col("id"), explode(col("grams")).as("gram"))
    val inter = postings.join(postings.select(col("id").as("id2"), col("gram")), Seq("gram"))
      .filter(col("id") < col("id2"))
      .groupBy(col("id").as("id_a"), col("id2").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-duplicates: sign-LSH bucket join (multiprobe
    * hamming-1) then exact cosine ≥ threshold within candidates.
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                       threshold: Double = 0.95, planes: Int = 12,
                       seed: Long = 42L): DataFrame = {
    val v = df.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("bucket", Similarity.lshBucket(col("v"), dim, planes, seed))
    val probed = v.withColumn("pbucket",
      explode(array((lit(0L) +: (0 until planes).map(p => lit(1L << p)))
        .map(f => col("bucket").bitwiseXOR(f)): _*)))
    val l = probed.select(col("pbucket").as("jb"), col("id").as("id_a"), col("v").as("v_a"))
    val r = v.select(col("bucket").as("jb"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("jb"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
