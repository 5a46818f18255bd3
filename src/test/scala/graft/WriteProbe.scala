package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: file counts + phase timing of a c11-style graft write. */
object WriteProbe {
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
    for (rep <- 1 to 3) {
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
    spark.stop()
  }
}
