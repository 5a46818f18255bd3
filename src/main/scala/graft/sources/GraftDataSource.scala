package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.BlockReader
import graft.codecs.{LongCodecs, StringCodecs}
import graft.engine.{ColumnarEngine, ContainerIO, DerivedRow}

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * engine's container+manifest layout as a DataSource V2 table.
  *
  * Read side: one input partition per container file; column pruning is
  * pushed into the container read (non-selected column blocks are a
  * SEEK, never a decode — the format's per-column length-prefixed blocks
  * make projection free), and comparison filters on the integer columns
  * are pushed two ways: container-level ZONE-MAP skipping against the
  * per-partition min/max recorded in the manifests (a skipped container
  * is never opened), then row-level evaluation during decode. The scan
  * reports both in `description()`, so `.explain` shows what was pruned
  * and pushed, Parquet-style.
  *
  * Write side: each task streams its rows through the same
  * [[graft.engine.ColumnarEngine.PartitionEncoder]] as the RDD encode
  * job — chunks flush at the same thresholds, so a writer task never
  * buffers more than one chunk; commit is the engine's atomic
  * manifest-marker protocol (idempotent across task retries).
  *
  * Schema is the engine's fixed source-code table shape
  * ([[graft.engine.DerivedRow]]).
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires a path"))
    new GraftTable(path)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object GraftDataSource {
  /** Fixed table schema, aligned with [[DerivedRow]] field order. */
  val schema: StructType = StructType(
    ColumnarEngine.stringColumns.map(StructField(_, StringType, nullable = false)) ++
      ColumnarEngine.longColumns.map(StructField(_, LongType, nullable = false)))

  private[sources] val longCols = ColumnarEngine.longColumns.toSet

  /** Container files admitted by the zone maps in `manifestsJson`
    * (name -> manifest JSON bytes): a file is skipped only when some
    * pushed comparison on a long column PROVES its [min, max] range
    * cannot satisfy the predicate. Unknown/absent stats admit the file.
    * Driver-side, pure — unit-tested directly.
    */
  private[sources] def admit(ranges: Map[String, (Long, Long)],
                             filters: Seq[Filter]): Boolean =
    filters.forall {
      case EqualTo(c, v: Long) if ranges.contains(c) =>
        val (lo, hi) = ranges(c); v >= lo && v <= hi
      case GreaterThan(c, v: Long) if ranges.contains(c) => ranges(c)._2 > v
      case GreaterThanOrEqual(c, v: Long) if ranges.contains(c) => ranges(c)._2 >= v
      case LessThan(c, v: Long) if ranges.contains(c) => ranges(c)._1 < v
      case LessThanOrEqual(c, v: Long) if ranges.contains(c) => ranges(c)._1 <= v
      case _ => true
    }

  /** Parse one manifest's column zone maps: column -> (min, max). */
  private[sources] def zoneMaps(manifestJson: String): Map[String, (Long, Long)] = {
    // Jackson is on Spark's classpath; the manifests are engine-written
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(manifestJson)
    val cols = root.get("columns")
    if (cols == null || !cols.isArray) Map.empty
    else cols.elements().asScala.flatMap { c =>
      if (c.get("hasRange") != null && c.get("hasRange").asBoolean(false))
        Some(c.get("column").asText() ->
          (c.get("minVal").asLong(), c.get("maxVal").asLong()))
      else None
    }.toMap
  }

  /** Row-level check for the pushed comparisons (the reader enforces
    * exactly what pushFilters claimed).
    */
  private[sources] def rowMatches(row: DerivedRow, filters: Seq[Filter]): Boolean = {
    def v(c: String): Long = c match {
      case "len_content" => row.len_content
      case "hash64" => row.hash64
      case "commit_ord" => row.commit_ord
      case "repo_code" => row.repo_code
      case "lang_code" => row.lang_code
      case "path_code" => row.path_code
      case other => throw new IllegalStateException(s"unpushable column $other")
    }
    filters.forall {
      case EqualTo(c, x: Long) => v(c) == x
      case GreaterThan(c, x: Long) => v(c) > x
      case GreaterThanOrEqual(c, x: Long) => v(c) >= x
      case LessThan(c, x: Long) => v(c) < x
      case LessThanOrEqual(c, x: Long) => v(c) <= x
      case f => throw new IllegalStateException(s"unpushable filter $f")
    }
  }

  /** A filter this source fully enforces (zone-map skip + row check). */
  private[sources] def pushable(f: Filter): Boolean = f match {
    case EqualTo(c, _: Long) => longCols(c)
    case GreaterThan(c, _: Long) => longCols(c)
    case GreaterThanOrEqual(c, _: Long) => longCols(c)
    case LessThan(c, _: Long) => longCols(c)
    case LessThanOrEqual(c, _: Long) => longCols(c)
    case _ => false
  }
}

class GraftTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft:$path"
  override def schema(): StructType = GraftDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path, info)
}

// ------------------------------------------------------------------- read

/** One fully-pushed aggregate, answered from the manifests alone. */
private[sources] sealed trait GraftAgg
private[sources] case object CountStarAgg extends GraftAgg
private[sources] final case class MinAgg(col: String) extends GraftAgg
private[sources] final case class MaxAgg(col: String) extends GraftAgg

class GraftScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = GraftDataSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggs: Option[Seq[GraftAgg]] = None
  private var limit: Int = Int.MaxValue

  // PARTIALLY pushed: each reader stops decoding after `limit` surviving
  // rows (chunks after the cut are never decoded), Spark applies the
  // global limit across partitions
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def isPartiallyPushed(): Boolean = true

  private def fieldName(e: Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames().length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  /** COUNT(*)/MIN/MAX over integer columns, ungrouped and unfiltered,
    * translate to manifest lookups (row counts + zone maps are EXACT);
    * anything else stays in Spark.
    */
  private def translate(agg: Aggregation): Option[Seq[GraftAgg]] = {
    if (agg.groupByExpressions().nonEmpty || pushed.nonEmpty) return None
    val specs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(CountStarAgg)
      case m: Min => fieldName(m.column).filter(GraftDataSource.longCols).map(MinAgg)
      case m: Max => fieldName(m.column).filter(GraftDataSource.longCols).map(MaxAgg)
      case _ => None
    }
    if (specs.nonEmpty && specs.forall(_.isDefined)) Some(specs.map(_.get)) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case some @ Some(_) => aggs = some; true
      case None => false
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projection (e.g. count(*)) still needs one column to drive
    // row counts; keep the cheapest long column
    required =
      if (requiredSchema.isEmpty)
        StructType(Seq(StructField("len_content", LongType, nullable = false)))
      else requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, residual) = filters.partition(GraftDataSource.pushable)
    pushed = take
    residual // fully enforced below: zone-map skip + row-level check
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val confKv = ContainerIO.confSnapshot(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    aggs match {
      case Some(specs) => new GraftAggScan(path, specs, confKv)
      case None => new GraftScan(path, required, pushed, confKv, limit)
    }
  }
}

/** Completely-pushed aggregate scan: the answer comes from the
  * manifests (exact row counts and per-column zone maps), so the query
  * never opens a container. Emits exactly one row.
  */
class GraftAggScan(path: String, specs: Seq[GraftAgg],
                   confKv: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(specs.map {
    case CountStarAgg => StructField("count_star", LongType, nullable = false)
    case MinAgg(c) => StructField(s"min_$c", LongType, nullable = true)
    case MaxAgg(c) => StructField(s"max_$c", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft $path, PushedAggregates: [${specs.mkString(", ")}] (manifest-answered)"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = ContainerIO.confFrom(confKv)
    var rows = 0L
    var mins = Map.empty[String, Long]
    var maxs = Map.empty[String, Long]
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    ContainerIO.listNames(conf, s"$path/manifests")
      .filter(n => n.startsWith("part-") && n.endsWith(".json")).foreach { n =>
        val json = new String(ContainerIO.readAll(conf, s"$path/manifests/$n"),
          java.nio.charset.StandardCharsets.UTF_8)
        rows += om.readTree(json).get("rows").asLong(0L)
        GraftDataSource.zoneMaps(json).foreach { case (c, (lo, hi)) =>
          mins = mins.updated(c, mins.get(c).fold(lo)(math.min(_, lo)))
          maxs = maxs.updated(c, maxs.get(c).fold(hi)(math.max(_, hi)))
        }
      }
    val values: Array[Any] = specs.map {
      case CountStarAgg => java.lang.Long.valueOf(rows)
      case MinAgg(c) => mins.get(c).map(java.lang.Long.valueOf).orNull
      case MaxAgg(c) => maxs.get(c).map(java.lang.Long.valueOf).orNull
    }.toArray
    Array(GraftAggPartition(values.map {
      case null => null
      case l: java.lang.Long => l.longValue()
    }))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val vals = p.asInstanceOf[GraftAggPartition].values
          private var emitted = false
          override def next(): Boolean =
            if (emitted) false else { emitted = true; true }
          override def get(): InternalRow = {
            val row = new GenericInternalRow(vals.length)
            var i = 0
            while (i < vals.length) {
              vals(i) match {
                case null => row.setNullAt(i)
                case l: Long => row.setLong(i, l)
                case other => row.update(i, other)
              }
              i += 1
            }
            row
          }
          override def close(): Unit = ()
        }
    }
}

case class GraftAggPartition(values: Array[Any]) extends InputPartition

class GraftScan(path: String, required: StructType, filters: Array[Filter],
                confKv: Map[String, String], limit: Int = Int.MaxValue)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Manifest-derived table statistics, so Catalyst/AQE can size joins
    * (e.g. auto-broadcast a small graft table) without scanning it.
    * Conservative: raw (decoded) bytes, summed over ADMITTED containers
    * only — zone-map skipping shrinks the estimate with the filters.
    */
  override def estimateStatistics(): Statistics = {
    val conf = ContainerIO.confFrom(confKv)
    var rows = 0L
    var bytes = 0L
    var any = false
    ContainerIO.listNames(conf, s"$path/manifests")
      .filter(n => n.startsWith("part-") && n.endsWith(".json")).foreach { n =>
        val json = new String(ContainerIO.readAll(conf, s"$path/manifests/$n"),
          java.nio.charset.StandardCharsets.UTF_8)
        if (GraftDataSource.admit(GraftDataSource.zoneMaps(json), filters.toSeq)) {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = om.readTree(json)
          rows += root.get("rows").asLong(0L)
          bytes += root.get("rawBytes").asLong(0L)
          any = true
        }
      }
    val (r, b) = (rows, bytes)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (any) java.util.OptionalLong.of(b) else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (any) java.util.OptionalLong.of(r) else java.util.OptionalLong.empty()
    }
  }

  override def description(): String =
    s"graft $path, ReadSchema: ${required.fieldNames.mkString(",")}, " +
      s"PushedFilters: [${filters.mkString(", ")}]" +
      (if (limit != Int.MaxValue) s", PushedLimit: $limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = ContainerIO.confFrom(confKv)
    val blocks = ContainerIO.listNames(conf, s"$path/blocks")
      .filter(n => n.startsWith("part-") && n.endsWith(".gblk"))
    val admitted = blocks.filter { name =>
      val part = name.stripPrefix("part-").stripSuffix(".gblk")
      val mf = s"$path/manifests/part-$part.json"
      val ranges =
        if (ContainerIO.exists(conf, mf))
          GraftDataSource.zoneMaps(
            new String(ContainerIO.readAll(conf, mf), java.nio.charset.StandardCharsets.UTF_8))
        else Map.empty[String, (Long, Long)]
      GraftDataSource.admit(ranges, filters.toSeq)
    }
    admitted.sorted.map(n =>
      GraftInputPartition(s"$path/blocks/$n"): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, filters, confKv, limit)
}

case class GraftInputPartition(file: String) extends InputPartition

class GraftReaderFactory(required: StructType, filters: Array[Filter],
                         confKv: Map[String, String], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(
      partition.asInstanceOf[GraftInputPartition].file, required, filters,
      confKv, limit)
}

/** Decodes one container, emitting only the pruned columns; non-selected
  * column blocks are skipped byte-ranges. Pushed filters are re-checked
  * per row (they need the filter columns decoded even when not
  * projected).
  */
class GraftPartitionReader(file: String, required: StructType,
                           filters: Array[Filter], confKv: Map[String, String],
                           limit: Int = Int.MaxValue)
    extends PartitionReader[InternalRow] {

  private val filterCols: Set[String] = filters.toSeq.flatMap(_.references).toSet
  private val needed: Set[String] = required.fieldNames.toSet ++ filterCols

  private val it: Iterator[InternalRow] = {
    val bytes = ContainerIO.readAll(ContainerIO.confFrom(confKv), file)
    decodeProjected(bytes)
  }
  private var cur: InternalRow = _
  private var emitted = 0

  override def next(): Boolean =
    if (emitted < limit && it.hasNext) { cur = it.next(); emitted += 1; true }
    else false
  override def get(): InternalRow = cur
  override def close(): Unit = ()

  private def decodeProjected(bytes: Array[Byte]): Iterator[InternalRow] = {
    val r = new BlockReader(bytes)
    require(java.util.Arrays.equals(
      r.getBytes(ColumnarEngine.Magic.length), ColumnarEngine.Magic),
      s"bad container magic in $file")
    r.getVarint() // part id
    val fields = required.fields
    val chunks = Iterator.unfold(()) { _ =>
      if (!r.hasRemaining) None
      else {
        val n = {
          val l = r.getVarint()
          require(l >= 1 && l <= Int.MaxValue, s"implausible chunk rows $l")
          l.toInt
        }
        val nCols = {
          val l = r.getVarint()
          require(l >= 0 && l <= 64, s"implausible column count $l")
          l.toInt
        }
        val longs = new java.util.HashMap[String, Array[Long]]()
        val strs = new java.util.HashMap[String, Array[String]]()
        var c = 0
        while (c < nCols) {
          val nameLen = r.getVarint()
          require(nameLen >= 0 && nameLen <= 1024, s"implausible name length $nameLen")
          val name = new String(r.getBytes(nameLen.toInt),
            java.nio.charset.StandardCharsets.UTF_8)
          val kind = r.getByte()
          val blockLen = {
            val l = r.getVarint()
            require(l >= 0 && l <= bytes.length, s"implausible block length $l")
            l.toInt
          }
          val off = r.position
          r.skip(blockLen)
          if (needed.contains(name)) {
            if (kind == 0) longs.put(name, LongCodecs.decodeSlice(bytes, off, off + blockLen))
            else strs.put(name, StringCodecs.decodeSlice(bytes, off, off + blockLen))
          }
          c += 1
        }
        r.getBytes(32) // chunk digest (full-decode path enforces it)
        for (col <- needed) {
          val ok = (longs.containsKey(col) && longs.get(col).length == n) ||
            (strs.containsKey(col) && strs.get(col).length == n)
          require(ok, s"container missing/short column $col")
        }
        val rows = (0 until n).iterator.flatMap { j =>
          if (!passes(longs, j)) None
          else {
            val row = new GenericInternalRow(fields.length)
            var i = 0
            while (i < fields.length) {
              fields(i).dataType match {
                case LongType => row.setLong(i, longs.get(fields(i).name)(j))
                case _ => row.update(i,
                  UTF8String.fromString(strs.get(fields(i).name)(j)))
              }
              i += 1
            }
            Some(row: InternalRow)
          }
        }
        Some((rows, ()))
      }
    }
    chunks.flatten
  }

  private def passes(longs: java.util.HashMap[String, Array[Long]], j: Int): Boolean =
    filters.forall { f =>
      def v(c: String): Long = longs.get(c)(j)
      f match {
        case EqualTo(c, x: Long) => v(c) == x
        case GreaterThan(c, x: Long) => v(c) > x
        case GreaterThanOrEqual(c, x: Long) => v(c) >= x
        case LessThan(c, x: Long) => v(c) < x
        case LessThanOrEqual(c, x: Long) => v(c) <= x
        case _ => true
      }
    }
}

// ------------------------------------------------------------------ write

class GraftWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val in = info.schema()
    val expect = GraftDataSource.schema
    require(in.fields.map(f => (f.name, f.dataType)).toSeq ==
      expect.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft write requires schema ${expect.simpleString}, got ${in.simpleString}")
    new GraftWrite(path, doTruncate)
  }
}

class GraftWrite(path: String, truncate: Boolean) extends Write {
  override def toBatch: BatchWrite = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    if (truncate) {
      val fs = ContainerIO.fs(path, conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      ()
    } else require(ContainerIO.listNames(conf, s"$path/blocks").isEmpty,
      s"graft table at $path already has containers; part ids are " +
        "task-scoped so appending would collide with (and be silently " +
        "dropped by) the first-commit-wins markers — write with " +
        "mode(\"overwrite\") instead")
    ContainerIO.mkdirs(conf, s"$path/blocks")
    ContainerIO.mkdirs(conf, s"$path/manifests")
    new GraftBatchWrite(path, ContainerIO.confSnapshot(conf))
  }
}

case class GraftCommitMessage(part: Int, rows: Long) extends WriterCommitMessage

class GraftBatchWrite(path: String, confKv: Map[String, String]) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(path, confKv)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftWriterFactory(path: String, confKv: Map[String, String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(path, partitionId, confKv)
}

/** Streams rows through the engine's [[ColumnarEngine.PartitionEncoder]]:
  * chunk-bounded memory; the manifest write in `finish()` is the commit
  * marker (atomic, first-commit-wins across retries).
  */
class GraftDataWriter(path: String, part: Int, confKv: Map[String, String])
    extends DataWriter[InternalRow] {
  private val enc = new ColumnarEngine.PartitionEncoder(
    part, path, ContainerIO.confFrom(confKv))
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    // field order = GraftDataSource.schema = strings then longs
    enc.add(DerivedRow(
      row.getUTF8String(0).toString, row.getUTF8String(1).toString,
      row.getUTF8String(2).toString, row.getUTF8String(3).toString,
      row.getUTF8String(4).toString,
      row.getLong(5), row.getLong(6), row.getLong(7),
      row.getLong(8), row.getLong(9), row.getLong(10)))
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    enc.finish()
    GraftCommitMessage(part, n)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
