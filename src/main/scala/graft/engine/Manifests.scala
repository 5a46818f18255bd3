package graft.engine

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration

/** Per-chunk statistics recorded in the partition manifest. `offset` /
  * `length` bound the chunk's byte range inside the container file (from
  * the chunk's row-count varint through its 32-byte digest inclusive), so
  * readers can plan CHUNK-granular input splits and stream one chunk at a
  * time instead of materializing the whole container (the parquet
  * row-group shape).
  *
  *  - `longRanges`:  column -> (min, max) zone map per integer column.
  *  - `strDicts`:    column -> complete distinct-value set, recorded only
  *                   when the chunk has <= [[Manifests.StrDictCap]]
  *                   distinct values each <= [[Manifests.StrValueCap]]
  *                   bytes (e.g. `lang`) — exact membership pruning for
  *                   `lang = 'en'` / `IN` filters.
  *  - `strRanges`:   column -> (min, max) recorded only when every value
  *                   in the chunk is pure ASCII and <= StrValueCap long:
  *                   ASCII guarantees Java/UTF8String/DuckDB collation
  *                   agreement, so range pruning stays PROOF-based.
  *  - `blockCrcs`:   column -> CRC32C of the column's encoded block bytes;
  *                   verified on every decoded block, so corruption is
  *                   caught even on pruned reads that never touch the
  *                   content digest.
  */
final case class ChunkStats(
    offset: Long, length: Long, rows: Int,
    longRanges: Map[String, (Long, Long)],
    strDicts: Map[String, Seq[String]],
    strRanges: Map[String, (String, String)],
    blockCrcs: Map[String, Long])

/** Driver-side view of one committed partition manifest. */
final case class ParsedManifest(
    name: String, part: Int, rows: Long, chunks: Int,
    rawBytes: Long, encodedBytes: Long, digest: String,
    longRanges: Map[String, (Long, Long)],
    chunkIndex: Seq[ChunkStats]) {
  def blockFile(tableDir: String): String = s"$tableDir/blocks/part-$name.gblk"
}

/** Manifest + manifest-index IO.
  *
  * The manifest is the partition's COMMIT MARKER: a container file in
  * `blocks/` without a matching `manifests/part-<name>.json` is an orphan
  * from a failed attempt and must be invisible to every read path (scan,
  * statistics, aggregate pushdown all plan from manifests, never from a
  * blocks listing).
  *
  * `_manifest-index.json` is a consolidated snapshot of every committed
  * manifest, written once at job commit so query planning is ONE file
  * read instead of O(partitions) sequential round trips (at 10^5
  * partitions the per-file listing costs minutes of driver time per
  * query). Readers fall back to listing `manifests/` when the index is
  * absent (legacy tables, mid-encode resume reads). At true 10^12-file
  * scale the index would be sharded/partitioned Iceberg-style; one file
  * is right up to ~10^5 partitions.
  */
object Manifests {

  /** Record a string dict only when the chunk has at most this many
    * distinct values (bounded enum shape: lang, kind columns).
    */
  final val StrDictCap = 16

  /** Max recorded string value length (dict entries and range bounds);
    * longer values disable the stat rather than truncate it (truncated
    * UPPER bounds are unsafe without parquet-style increment logic).
    */
  final val StrValueCap = 64

  final val IndexFile = "_manifest-index.json"

  def indexPath(tableDir: String): String = s"$tableDir/$IndexFile"
  def manifestPath(tableDir: String, name: String): String =
    s"$tableDir/manifests/part-$name.json"

  // --------------------------------------------------------------- write

  private def q(s: String) =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def chunkJson(c: ChunkStats): String = {
    def longPairs(m: Map[String, (Long, Long)]) =
      m.toSeq.sortBy(_._1).map { case (k, (lo, hi)) => s"${q(k)}:[$lo,$hi]" }
        .mkString("{", ",", "}")
    val dicts = c.strDicts.toSeq.sortBy(_._1).map { case (k, vs) =>
      s"${q(k)}:${vs.map(q).mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val sranges = c.strRanges.toSeq.sortBy(_._1).map { case (k, (lo, hi)) =>
      s"${q(k)}:[${q(lo)},${q(hi)}]"
    }.mkString("{", ",", "}")
    val crcs = c.blockCrcs.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:$v" }
      .mkString("{", ",", "}")
    s"""{"offset":${c.offset},"length":${c.length},"rows":${c.rows},""" +
      s""""longRanges":${longPairs(c.longRanges)},"strDicts":$dicts,""" +
      s""""strRanges":$sranges,"blockCrcs":$crcs}"""
  }

  def manifestJson(m: PartManifest): String = {
    val cols = m.columns.map(c =>
      s"""{"column":${q(c.column)},"codec":${q(c.codec)},"rawBytes":${c.rawBytes},""" +
      s""""encodedBytes":${c.encodedBytes},"minVal":${c.minVal},"maxVal":${c.maxVal},""" +
      s""""hasRange":${c.hasRange}}"""
    ).mkString("[", ",", "]")
    val chunks = m.chunkIndex.map(chunkJson).mkString("[", ",", "]")
    s"""{"part":${m.part},"name":${q(m.name)},"rows":${m.rows},"chunks":${m.chunks},""" +
      s""""rawBytes":${m.rawBytes},"encodedBytes":${m.encodedBytes},""" +
      s""""digest":${q(m.digest)},"columns":$cols,"chunkIndex":$chunks}"""
  }

  /** Publish one manifest (the partition's commit marker) atomically. */
  def writeManifest(conf: Configuration, tableDir: String, m: PartManifest,
                    attempt: Long): Unit =
    ContainerIO.writeAtomic(conf,
      s"$tableDir/manifests/.tmp-part-${m.name}-a$attempt",
      manifestPath(tableDir, m.name),
      manifestJson(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** (Re)write the consolidated index from the given manifest JSONs.
    * Replace is delete-then-rename: the not-atomic window only ever shows
    * a MISSING index, and readers fall back to listing `manifests/`.
    */
  def writeIndex(conf: Configuration, tableDir: String,
                 manifestJsons: Seq[String]): Unit = {
    val body = manifestJsons.mkString("""{"version":1,"manifests":[""", ",", "]}")
    val fs = ContainerIO.fs(tableDir, conf)
    val dst = new org.apache.hadoop.fs.Path(indexPath(tableDir))
    val tmp = new org.apache.hadoop.fs.Path(s"$tableDir/.tmp-manifest-index")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }

  /** Consolidate every committed manifest currently in `manifests/` into
    * the index (end of an engine encode job, including resumed runs).
    */
  def consolidate(conf: Configuration, tableDir: String): Unit = {
    val jsons = listManifestNames(conf, tableDir).sorted.map { n =>
      new String(ContainerIO.readAll(conf, s"$tableDir/manifests/$n"),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    writeIndex(conf, tableDir, jsons)
  }

  // ---------------------------------------------------------------- read

  private def listManifestNames(conf: Configuration, tableDir: String): Seq[String] =
    ContainerIO.listNames(conf, s"$tableDir/manifests")
      .filter(n => n.startsWith("part-") && n.endsWith(".json"))

  private def jLong(n: JsonNode, f: String, dflt: Long = 0L): Long = {
    val v = n.get(f); if (v == null) dflt else v.asLong(dflt)
  }

  private def parseLongRanges(n: JsonNode): Map[String, (Long, Long)] =
    if (n == null || !n.isObject) Map.empty
    else n.properties().asScala.map { e =>
      e.getKey -> (e.getValue.get(0).asLong(), e.getValue.get(1).asLong())
    }.toMap

  def parseChunk(n: JsonNode): ChunkStats = {
    val dicts =
      Option(n.get("strDicts")).filter(_.isObject).map(_.properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
      }.toMap).getOrElse(Map.empty[String, Seq[String]])
    val sranges =
      Option(n.get("strRanges")).filter(_.isObject).map(_.properties().asScala.map { e =>
        e.getKey -> (e.getValue.get(0).asText(), e.getValue.get(1).asText())
      }.toMap).getOrElse(Map.empty[String, (String, String)])
    val crcs =
      Option(n.get("blockCrcs")).filter(_.isObject).map(_.properties().asScala.map { e =>
        e.getKey -> e.getValue.asLong()
      }.toMap).getOrElse(Map.empty[String, Long])
    ChunkStats(jLong(n, "offset"), jLong(n, "length"), jLong(n, "rows").toInt,
      parseLongRanges(n.get("longRanges")), dicts, sranges, crcs)
  }

  /** Parse one manifest JSON; `fallbackName` covers legacy manifests
    * written before the `name` field existed (derived from the filename).
    */
  def parse(json: String, fallbackName: String): ParsedManifest = {
    val om = new ObjectMapper()
    val root = om.readTree(json)
    val name = Option(root.get("name")).map(_.asText()).getOrElse(fallbackName)
    val ranges = Option(root.get("columns")).filter(_.isArray).map {
      _.elements().asScala.flatMap { c =>
        if (c.get("hasRange") != null && c.get("hasRange").asBoolean(false))
          Some(c.get("column").asText() ->
            (c.get("minVal").asLong(), c.get("maxVal").asLong()))
        else None
      }.toMap
    }.getOrElse(Map.empty[String, (Long, Long)])
    val chunkIndex = Option(root.get("chunkIndex")).filter(_.isArray).map {
      _.elements().asScala.map(parseChunk).toSeq
    }.getOrElse(Nil)
    ParsedManifest(name, jLong(root, "part").toInt, jLong(root, "rows"),
      jLong(root, "chunks").toInt, jLong(root, "rawBytes"),
      jLong(root, "encodedBytes"),
      Option(root.get("digest")).map(_.asText()).getOrElse(""),
      ranges, chunkIndex)
  }

  /** Every COMMITTED partition of the table: one index read when the
    * consolidated index exists, else a `manifests/` listing + per-file
    * reads (legacy / mid-encode tables).
    */
  def readCommitted(conf: Configuration, tableDir: String): Seq[ParsedManifest] = {
    val ip = indexPath(tableDir)
    if (ContainerIO.exists(conf, ip)) {
      val om = new ObjectMapper()
      val root = om.readTree(new String(ContainerIO.readAll(conf, ip),
        java.nio.charset.StandardCharsets.UTF_8))
      val arr = root.get("manifests")
      if (arr == null || !arr.isArray) Nil
      else arr.elements().asScala.map { n =>
        parse(n.toString, fallbackName = jLong(n, "part").toString)
      }.toSeq
    } else {
      listManifestNames(conf, tableDir).sorted.map { n =>
        val json = new String(ContainerIO.readAll(conf, s"$tableDir/manifests/$n"),
          java.nio.charset.StandardCharsets.UTF_8)
        parse(json, fallbackName = n.stripPrefix("part-").stripSuffix(".json"))
      }
    }
  }

  /** Raw committed manifest JSONs (job-commit index merging). */
  def readCommittedJsons(conf: Configuration, tableDir: String): Seq[String] = {
    val ip = indexPath(tableDir)
    if (ContainerIO.exists(conf, ip)) {
      val om = new ObjectMapper()
      val root = om.readTree(new String(ContainerIO.readAll(conf, ip),
        java.nio.charset.StandardCharsets.UTF_8))
      val arr = root.get("manifests")
      if (arr == null || !arr.isArray) Nil
      else arr.elements().asScala.map(_.toString).toSeq
    } else listManifestNames(conf, tableDir).sorted.map { n =>
      new String(ContainerIO.readAll(conf, s"$tableDir/manifests/$n"),
        java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  def crc32c(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, off, len)
    c.getValue
  }
  def crc32c(bytes: Array[Byte]): Long = crc32c(bytes, 0, bytes.length)
}
