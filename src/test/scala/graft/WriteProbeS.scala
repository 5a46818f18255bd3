package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: file counts + phase timing of a c11-style graft write. */
object WriteProbeS {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("writeprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    // warm
    locally { val d0 = java.nio.file.Files.createTempDirectory("graft-wp").toString
      ev.write.format("graft").option("chunkRows", "1024").option("sortBy", "value")
        .mode("overwrite").save(d0) }
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var stop = false
    val mainThread = Thread.currentThread()
    val sampler = new Thread(() => {
      while (!stop) {
        Thread.sleep(4)
        val st = mainThread.getStackTrace
        if (mainThread.getState == Thread.State.RUNNABLE && st.nonEmpty) {
          val top = st.iterator.map(_.toString)
            .find(f => f.startsWith("graft.") || f.startsWith("org.apache.hadoop") ||
              f.contains("ChecksumFile") || f.startsWith("java.io") ||
              f.startsWith("sun.nio"))
            .getOrElse(st.head.toString)
          hist.merge(top, 1, (a, b) => a + b)
        } else if (st.nonEmpty && mainThread.getState != Thread.State.RUNNABLE) {
          // blocked driver: record WHAT it waits on (first non-jdk frame)
          val top = st.iterator.map(_.toString)
            .find(f => f.startsWith("graft.") || f.startsWith("org.apache.spark.sql"))
            .getOrElse("wait:" + st.head.toString)
          hist.merge("[W] " + top, 1, (a, b) => a + b)
        }
      }
    })
    sampler.setDaemon(true); sampler.start()
    for (rep <- 1 to 6) {
      val dir = java.nio.file.Files.createTempDirectory("graft-wp").toString
      val t0 = System.nanoTime()
      ev.write.format("graft").option("chunkRows", "1024")
        .option("sortBy", "value")
        .mode("overwrite").save(dir)
      val tw = (System.nanoTime() - t0) / 1e9
      val blocks = new java.io.File(s"$dir/blocks").listFiles()
        .count(_.getName.endsWith(".gblk"))
      val t1 = System.nanoTime()
      val n = spark.read.format("graft").load(dir)
        .filter(col("value") > 50.0).groupBy(col("event_type"))
        .agg(count(lit(1))).count()
      val tr = (System.nanoTime() - t1) / 1e9
      println(f"[t] rep$rep write=${tw}%.2f s read=${tr}%.2f s " +
        f"containers=$blocks rows=$n")
    }
    stop = true
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, n) =>
      println(f"  $n%5d  $f") }
    spark.stop()
  }
}
