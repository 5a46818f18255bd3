package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: sampling profile of the engine encode leg (bench shape). */
object EncProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("encprobe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine._
    val derived = ColumnarEngine.derive(
      SourceTable.synthesize(spark, 50000L, 32)).cache()
    derived.count()
    // warm
    val d0 = java.nio.file.Files.createTempDirectory("graft-ep").toString
    ColumnarEngine.encode(derived, d0, numParts = 32)
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        Thread.sleep(5)
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE &&
              t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            val top = st.head.toString
            hist.merge(top.replaceFirst("^app//", ""), 1, (a, b) => a + b)
          }
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    var i = 0
    val t0 = System.nanoTime()
    while (i < 3) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ep").toString
      ColumnarEngine.encode(derived, dir, numParts = 32)
      i += 1
    }
    stop = true
    println(f"[t] 3x encode ${(System.nanoTime() - t0) / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(28).foreach { case (f, n) =>
      println(f"  $n%5d  $f")
    }
    spark.stop()
  }
}
