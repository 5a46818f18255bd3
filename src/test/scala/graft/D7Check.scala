package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: timing + plan check of the real ngramJaccard after the
  * exchange-free dedup change.
  */
object D7Check {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d7check")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def cpuS(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          math.max(os.getProcessCpuTime, 0L) / 1e9
        case _ => 0.0
      }
    for (rep <- 1 to 4) {
      val c0 = cpuS()
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      val n = out.count()
      println(f"[t] rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"cpu=${cpuS() - c0}%.2f rows=$n")
      if (rep == 1) {
        val s = out.queryExecution.executedPlan.toString
        println("[plan] exchanges=" +
          "Exchange hashpartitioning".r.findAllIn(s).length)
      }
      out.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
