package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: warm phase timing of d5 (minhashLsh) and c13 shape. */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d5probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def cpuS(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          math.max(os.getProcessCpuTime, 0L) / 1e9
        case _ => 0.0
      }
    def tt(label: String)(f: => Long): Unit = {
      val c0 = cpuS(); val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label ${(System.nanoTime() - t0) / 1e9}%.2f s cpu=${cpuS() - c0}%.2f rows=$r")
    }
    for (rep <- 1 to 3) {
      tt(s"rep$rep d5")(graft.ops.Dedup.minhashLsh(docs, "doc_id", "text",
        shingleSize = 3, bands = 16, threshold = 0.4).count())
      spark.catalog.clearCache()
      tt(s"rep$rep e1-on-parquet")(graft.ops.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), k = 5).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
