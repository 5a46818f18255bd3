package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase timing of c3 (derive -> encode -> readColumns). */
object C3ProbeS {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("c3probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def tt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var stopS = false
    val sampler = new Thread(() => {
      while (!stopS) {
        Thread.sleep(5)
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              !t.getName.contains("sampler")) {
            val top = st.head.toString
            hist.merge(t.getName.replaceAll("[0-9]+", "N").take(30) + " | " + top, 1, (a, b) => a + b)
          }
        }
      }
    })
    sampler.setName("samplerX")
    sampler.setDaemon(true)
    var started = false
    for (rep <- 1 to 4) {
      if (rep == 2 && !started) { started = true; sampler.start() }
      val src = spark.read.parquet(s"$d/documents.parquet").select(
        concat(lit("repo/"), col("source")).as("repo"),
        concat(lit("docs/doc_"), col("doc_id")).as("path"),
        concat(lit("c"), col("doc_id")).as("commit"),
        col("lang"),
        col("text").as("content")).as[graft.engine.SourceFile]
      val derived = tt(s"rep$rep derive-plan")(
        graft.engine.ColumnarEngine.derive(src))
      val dir = java.nio.file.Files.createTempDirectory("graft-c3p").toString
      tt(s"rep$rep encode")(
        graft.engine.ColumnarEngine.encode(derived, dir, numParts = 4))
      tt(s"rep$rep read+agg")(
        graft.engine.ColumnarEngine.readColumns(spark, dir,
          Seq("lang", "len_content"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("len_content")).as("sum_chars"))
          .orderBy(col("lang")).count())
    }
    stopS = true
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (f, n) =>
      println(f"  $n%5d  $f")
    }
    spark.stop()
  }
}
