package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: sampling profile of the current e3 pipeline. */
object E3ProbeS {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("e3probes")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def run(): Long = {
      val out = graft.ops.Dedup.embeddingNearDup(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.3, planes = 8, tables = 28, probes = 4,
        symmetric = true)
      val n = out.count()
      out.unpersist()
      spark.catalog.clearCache()
      n
    }
    run() // warm
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        Thread.sleep(5)
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE &&
              t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            hist.merge(st.head.toString.replaceFirst("^app//", ""), 1, (a, b) => a + b)
          }
        }
      }
    })
    sampler.setDaemon(true); sampler.start()
    for (rep <- 1 to 5) {
      val t0 = System.nanoTime()
      val n = run()
      println(f"[t] rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    stop = true
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(22).foreach { case (f, n) =>
      println(f"  $n%5d  $f") }
    spark.stop()
  }
}
