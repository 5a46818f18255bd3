package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): NOT part of the
  * frozen driver contract ([[Bench]] is). Times each SparkEntry query with
  * the bench's exact action (`.count()`), records the per-Spark-job wall
  * breakdown (callsite-labelled) plus per-stage task/cpu time via a
  * listener, and dumps `.explain("formatted")` per query to an output dir.
  *
  * Usage: `sbt "runMain graft.BenchExtra [plansDir] [query ...]"`
  * (no query args = the full suite). Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS — same as Bench.
  */
object BenchExtra {

  private final case class JobRec(id: Int, desc: String, start: Long,
                                  var end: Long = -1L)

  private final class Recorder extends SparkListener {
    val jobs = new scala.collection.mutable.ArrayBuffer[JobRec]()
    // (stageId, name, taskTimeMs, cpuMs, tasks)
    val stageRows = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Int)]()
    var taskTimeMs = 0L
    var cpuTimeMs = 0L
    var shuffleWriteBytes = 0L
    var stages = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      val site = Option(j.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      jobs += JobRec(j.jobId, site, j.time)
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      jobs.find(_.id == j.jobId).foreach(_.end = j.time)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        val m = s.stageInfo.taskMetrics
        taskTimeMs += m.executorRunTime
        cpuTimeMs += m.executorCpuTime / 1000000L
        shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        stageRows += ((s.stageInfo.stageId, s.stageInfo.name.take(90),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          s.stageInfo.numTasks))
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val plansDir = args.headOption.getOrElse("/tmp/plans_r10")
    val wanted = args.drop(1).toSet
    new java.io.File(plansDir).mkdirs()

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench
    spark.range(1 << 20).selectExpr("sum(id * 2)", "count(distinct id % 1000)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey")
      .count().collect()

    val names =
      if (wanted.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq.distinct // argument ORDER, for A/B ordering probes
    val totals = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val rec = new Recorder
      spark.sparkContext.addSparkListener(rec)
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val df =
        try fn(spark, sfDir)
        catch { case e: Throwable =>
          println(f"== $name BUILD FAILED: ${e.getMessage}"); null }
      val tBuilt = System.nanoTime()
      if (df != null) {
        val n = df.count()
        val t1 = System.nanoTime()
        spark.sparkContext.removeSparkListener(rec)
        val sec = (t1 - t0) / 1e9
        val buildSec = (tBuilt - t0) / 1e9
        totals += name -> sec
        println(f"== $name%-24s ${sec}%7.3f s (build ${buildSec}%.3f) rows=$n " +
          f"stages=${rec.stages} taskTime=${rec.taskTimeMs / 1e3}%.1f s " +
          f"cpu=${rec.cpuTimeMs / 1e3}%.1f s shufW=${rec.shuffleWriteBytes / 1e6}%.1f MB")
        rec.jobs.sortBy(_.start).foreach { j =>
          val d = if (j.end > 0) (j.end - j.start) / 1e3 else Double.NaN
          println(f"     job ${j.id}%3d ${d}%7.3f s  ${j.desc}")
        }
        rec.stageRows.sortBy(-_._3).take(8).foreach { case (id, nm, tt, cp, nt) =>
          println(f"     stage $id%4d task=${tt / 1e3}%6.2f s cpu=${cp / 1e3}%6.2f s " +
            f"tasks=$nt%3d  $nm")
        }
        // plan AFTER execution: plan capture must not warm the timed run
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val out = new java.io.PrintWriter(s"$plansDir/$name.txt", "UTF-8")
        try out.println(plan) finally out.close()
      } else spark.sparkContext.removeSparkListener(rec)
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(null)
    }
    println(f"== TOTAL ${totals.map(_._2).sum}%.3f s over ${totals.size} queries")
    totals.sortBy(-_._2).take(15).foreach { case (n, s) =>
      println(f"   slowest: $n%-24s ${s}%7.3f s")
    }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
