package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: sampling profiler over d7's candidate-dedup stage. */
object D7Probe5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d7probe5")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    graft.functions.SortedJaccardGE.register(spark)
    graft.functions.WordNGrams.register(spark)
    val threshold = 0.5
    val base = docs.repartition(8, col("doc_id")).select(col("doc_id").as("id"),
      graft.functions.WordNGrams.wordNgrams(col("text"), 3).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = base.select(col("id"), size(col("grams")).as("_sz"),
      explode(col("grams")).as("gram"))
    val dfreq = postings.groupBy(col("gram")).agg(count(lit(1)).as("_f"))
    val kProbe = (col("_sz") - ceil(lit(threshold) * col("_sz")) + 1).cast("int")
    val pre = postings
      .join(broadcast(dfreq), Seq("gram"))
      .groupBy(col("id"), col("_sz"))
      .agg(array_sort(collect_list(struct(col("_f"), col("gram")))).as("_fg"))
      .select(col("id"), col("_sz"),
        posexplode(slice(col("_fg"), lit(1), kProbe)))
      .select(col("id"), col("col._f").as("_f"), col("col.gram").as("gram"),
        col("_sz"), (col("pos") + 1).as("_rk"))
      .select(col("id"), col("gram"), col("_sz"), col("_rk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pre.count()
    val probe = pre.select(col("gram"), col("id").as("id_p"),
      col("_sz").as("_szp"), col("_rk").as("_pp"))
    val index = pre
      .filter(col("_rk") <=
        col("_sz") - ceil(lit(2.0 * threshold / (1.0 + threshold)) * col("_sz")) + 1)
      .select(col("gram"), col("id").as("id_i"),
        col("_sz").as("_szi"), col("_rk").as("_pi"))
    def candDf(): DataFrame = probe.join(index, Seq("gram"))
      .filter(col("_szi") < col("_szp") ||
        (col("_szi") === col("_szp") && col("id_i") < col("id_p")))
      .filter(col("_szi") >= lit(threshold) * col("_szp"))
      .filter(lit(1) + least(col("_szi") - col("_pi"), col("_szp") - col("_pp"))
        >= ceil(lit(threshold / (1.0 + threshold)) * (col("_szi") + col("_szp"))))
      .select(least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candDf().count() // warm
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        Thread.sleep(7)
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE &&
              t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            // top non-jvm frame
            val top = st.iterator.map(_.toString)
              .find(f => !f.startsWith("java.") && !f.startsWith("jdk.") &&
                !f.startsWith("sun."))
              .getOrElse(st.head.toString)
            hist.merge(top, 1, (a, b) => a + b)
          }
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    var i = 0
    while (i < 10) { candDf().count(); i += 1 }
    stop = true
    println(f"[t] 10x cand ${(System.nanoTime() - t0) / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (f, n) =>
      println(f"  $n%5d  $f")
    }
    spark.stop()
  }
}
