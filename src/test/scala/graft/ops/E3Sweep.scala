package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc (planes, tables, probes) Pareto sweep for e3's
  * embeddingNearDup config: recall vs the exact all-pairs answer at
  * sf0.01 plus wall time at the SF given by E3_SWEEP_SF (default
  * sf0.01; set sf0.1 for timing legs).
  * Run: `sbt -batch 'Test/runMain graft.ops.E3Sweep'`.
  */
object E3Sweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("E3_SWEEP_CPUS", "16") + "]")
      .appName("e3-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val recallDir = "/root/testdata/sf0.01"
    val timeDir = sys.env.getOrElse("E3_SWEEP_SF", recallDir)
    val embR = spark.read.parquet(s"$recallDir/embeddings.parquet")
    val v = embR.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exactPairs = v.toDF("id_a", "v_a")
      .join(v.toDF("id_b", "v_b"), col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("v_a"), col("v_b")) >= 0.3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[sweep] exact pairs at sf0.01: ${exactPairs.size}")

    val embT = spark.read.parquet(s"$timeDir/embeddings.parquet")
    embT.count()

    val configs = Seq(
      // (planes, tables, probes, symmetric); probes < 0 = full hamming-1
      (8, 32, 4, false), (8, 24, 4, true), (8, 28, 4, true), (8, 32, 4, false)
    )
    for ((p, t, pr, sym) <- configs) {
      val nd = Dedup.embeddingNearDup(embR, "vec_id", "embedding", dim = 64,
        threshold = 0.3, planes = p, tables = t, probes = pr, symmetric = sym)
      val pairs = nd.select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      nd.unpersist()
      val recall = (pairs intersect exactPairs).size.toDouble / exactPairs.size
      val falsePos = (pairs diff exactPairs).size
      // timing leg at timeDir (best of 2)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = Dedup.embeddingNearDup(embT, "vec_id", "embedding", dim = 64,
          threshold = 0.3, planes = p, tables = t, probes = pr, symmetric = sym)
        val n = r.count()
        r.unpersist()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[sweep] planes=$p tables=$t probes=$pr sym=$sym recall=$recall%.4f " +
        f"fp=$falsePos time=${times.map(_._1).min}%.2f s pairs@time=${times.head._2}")
    }
    spark.stop()
  }
}
