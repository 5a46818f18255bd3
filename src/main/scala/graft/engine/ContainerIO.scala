package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Container/manifest IO through the Hadoop `FileSystem` API, so the
  * engine's `outDir` can live on any cluster filesystem (`file://`,
  * `hdfs://`, `s3a://`…) — `java.nio.file` (round 1) only worked on a
  * single box. Executors rebuild the driver's Hadoop `Configuration` from
  * a broadcast key-value snapshot: Spark's own `SerializableConfiguration`
  * wrapper is `private[spark]`, and `Configuration` itself is not
  * serializable.
  *
  * Commit protocol note: tmp-file + `rename` is atomic on HDFS and local
  * filesystems. On S3 the rename is copy+delete — pair this layout with
  * an S3-committer-style conditional PUT if S3 is the target.
  */
object ContainerIO {

  /** Serializable snapshot of the session's Hadoop configuration. */
  def confSnapshot(spark: SparkSession): Map[String, String] = {
    val c = spark.sparkContext.hadoopConfiguration
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  /** Rebuild a Configuration from a snapshot (executor side). */
  def confFrom(snapshot: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    snapshot.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Driver-side configuration (classpath defaults). */
  def localConf(): Configuration = new Configuration()

  def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  def mkdirs(conf: Configuration, dir: String): Unit = {
    val p = new Path(dir)
    fs(dir, conf).mkdirs(p)
    ()
  }

  def exists(conf: Configuration, path: String): Boolean =
    fs(path, conf).exists(new Path(path))

  def readAll(conf: Configuration, path: String): Array[Byte] = {
    val p = new Path(path)
    val f = fs(path, conf)
    val len = f.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"$path too large to read into one buffer")
    val in = f.open(p)
    try {
      val out = new Array[Byte](len.toInt)
      in.readFully(0L, out)
      out
    } finally in.close()
  }

  /** Write bytes to `tmp`, then atomically rename onto `dst`. If another
    * task attempt already committed `dst`, this attempt's tmp is simply
    * discarded (first-commit-wins; both attempts encode identical bytes).
    */
  def writeAtomic(conf: Configuration, tmp: String, dst: String,
                  bytes: Array[Byte]): Unit = {
    val f = fs(dst, conf)
    val t = new Path(tmp)
    val d = new Path(dst)
    val out = f.create(t, true)
    try out.write(bytes) finally out.close()
    if (!f.rename(t, d)) {
      if (f.exists(d)) f.delete(t, false)
      else throw new java.io.IOException(s"rename $tmp -> $dst failed")
    }
  }

  /** File names (not paths) directly under `dir`; empty if absent. */
  def listNames(conf: Configuration, dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(dir, conf)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
  }
}
