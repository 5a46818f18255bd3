package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only warm bisect of ngramJaccard phase costs at sf0.1. */
object D7Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("d7probe4")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    graft.functions.SortedJaccardGE.register(spark)
    graft.functions.WordNGrams.register(spark)
    val threshold = 0.5

    def pipeline(): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
      val base = docs.select(col("doc_id").as("id"),
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
      val probe = pre.select(col("gram"), col("id").as("id_p"),
        col("_sz").as("_szp"), col("_rk").as("_pp"))
      val index = pre
        .filter(col("_rk") <=
          col("_sz") - ceil(lit(2.0 * threshold / (1.0 + threshold)) * col("_sz")) + 1)
        .select(col("gram"), col("id").as("id_i"),
          col("_sz").as("_szi"), col("_rk").as("_pi"))
      val matches = probe.join(index, Seq("gram"))
        .filter(col("_szi") < col("_szp") ||
          (col("_szi") === col("_szp") && col("id_i") < col("id_p")))
        .filter(col("_szi") >= lit(threshold) * col("_szp"))
        .filter(lit(1) + least(col("_szi") - col("_pi"), col("_szp") - col("_pp"))
          >= ceil(lit(threshold / (1.0 + threshold)) * (col("_szi") + col("_szp"))))
      val cand = matches
        .select(least(col("id_i"), col("id_p")).as("id_a"),
          greatest(col("id_i"), col("id_p")).as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val out = cand
        .join(base.select(col("id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
        .withColumn("jaccard", graft.functions.SortedJaccardGE.sortedJaccardGe(
          col("g_a"), col("g_b"), lit(threshold)))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      (base, pre, matches, cand, out)
    }

    def cpuS(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          math.max(os.getProcessCpuTime, 0L) / 1e9
        case _ => 0.0
      }
    def tt(label: String)(f: => Long): Unit = {
      val c0 = cpuS()
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label ${(System.nanoTime() - t0) / 1e9}%.2f s cpu=${cpuS() - c0}%.2f rows=$r")
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      // phase 1: base materialize
      val (base, pre, matches, cand, out) = pipeline()
      tt("base")(base.count())
      tt("pre")(pre.count())
      tt("matches")(matches.count())
      tt("matchesNoCond")(matches.select(col("id_i")).count())
      tt("cand")(cand.count())
      tt("out")(out.count())
      base.unpersist(true); pre.unpersist(true)
      spark.catalog.clearCache()
      // full, exactly as Dedup runs it (single count over everything)
      val (b2, p2, _, _, out2) = pipeline()
      tt("FULL")(out2.count())
      b2.unpersist(true); p2.unpersist(true)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
