package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash64

/** Dev-only: d6 (simhashPairs) with different input widening, wall+cpu. */
object D6Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d6probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    graft.functions.SimHash64.register(spark)

    @volatile var taskMs = 0L
    @volatile var cpuMs = 0L
    val rec = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        taskMs += s.stageInfo.taskMetrics.executorRunTime
        cpuMs += s.stageInfo.taskMetrics.executorCpuTime / 1000000L
      }
    }
    spark.sparkContext.addSparkListener(rec)

    def run(label: String, hashed: DataFrame): Unit = {
      taskMs = 0L; cpuMs = 0L
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.simhashPairsFromHashes(hashed, 7)
        .orderBy(col("id_a"), col("id_b")).count()
      Thread.sleep(300) // let the listener bus drain
      println(f"[t] $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n " +
        f"task=${taskMs / 1e3}%.1f cpu=${cpuMs / 1e3}%.1f")
      spark.catalog.clearCache()
    }
    def hashed(parts: Int): DataFrame = {
      val in = if (parts <= 1) docs else docs.repartition(parts, col("doc_id"))
      in.select(col("doc_id").as("id"), simhash64(col("text")).as("simhash"))
    }
    for (rep <- 1 to 3; p <- Seq(1, 8, 32)) run(s"rep$rep p$p", hashed(p))
    spark.stop()
  }
}
