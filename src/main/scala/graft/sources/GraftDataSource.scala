package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.{ChunkStats, ColumnarEngine, ContainerFormat, ContainerInput, ContainerIO, DecodedChunk, DerivedRow, Manifests, ParsedManifest}

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * engine's container+manifest layout as a DataSource V2 table.
  *
  * Read side: input partitions are CHUNK ranges (the parquet row-group
  * shape) planned from the consolidated manifest index — one giant
  * container parallelizes across tasks, and zone-map skipping works at
  * chunk granularity. Pruning and filtering are pushed three ways:
  * non-selected column blocks are a position advance (never read off
  * storage, never decoded); comparison filters on the integer columns and
  * equality/IN filters on the string columns prune chunks against
  * per-chunk zone maps / dictionaries, then are re-checked row-level
  * during decode. The reader STREAMS blocks (`ContainerInput`) — it never
  * materializes a container, so task memory is bounded by one chunk
  * regardless of container size. Decoded blocks are CRC32C-verified
  * against the manifest; reads that select `content` additionally verify
  * the per-chunk content sha256 digest.
  *
  * Write side: each task streams rows through the engine's
  * [[graft.engine.ColumnarEngine.PartitionEncoder]] (chunk-bounded
  * memory) into an EPOCH-qualified container (`part-<queryId>-<task>`),
  * so appends never collide; manifests — the commit markers — are
  * published only at JOB commit together with the rewritten manifest
  * index, so a failed or killed job never exposes a partial table and an
  * overwrite destroys the old data only after the new table is live.
  *
  * Schema: ANY mix of BIGINT/INT/STRING (round 5), TIMESTAMP_NTZ/DATE
  * (round 6), and DOUBLE/BINARY/ARRAY<FLOAT> (round 7) columns, each
  * independently nullable. A first write defines the table's schema;
  * reads infer it from the committed manifests (the widest, under the
  * add-only-evolution prefix rule); appends must match it or extend it
  * with trailing nullable columns. The engine's own source-code shape
  * ([[graft.engine.DerivedRow]]) is simply the default for tables that
  * don't exist yet.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  /** Table schema from the committed manifests (any long/string mix —
    * round 5); the engine's fixed [[DerivedRow]] schema only as the
    * default for empty/absent tables (round 4 hard-coded it for every
    * table).
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("path"))
      .flatMap { p =>
        val conf = org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration
        // a time-traveled read infers the PINNED snapshot's schema — an
        // older snapshot may predate added columns (add-only evolution)
        GraftDataSource.inferFrom(p, conf,
          GraftDataSource.asOfVersion(options, conf, p))
      }
      .getOrElse(GraftDataSource.schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires a path"))
    new GraftTable(path, schema)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object GraftDataSource {
  /** The engine's table schema ([[DerivedRow]] field order) — the
    * default for tables that don't exist yet.
    */
  val schema: StructType = StructType(
    ColumnarEngine.stringColumns.map(StructField(_, StringType, nullable = false)) ++
      ColumnarEngine.longColumns.map(StructField(_, LongType, nullable = false)))

  private[sources] def schemaOf(specs: Seq[graft.engine.ColumnSpec]): StructType =
    StructType(specs.map(s => StructField(s.name, s.kind match {
      case 0 => LongType
      case 2 => IntegerType
      case 3 => TimestampNTZType
      case 4 => DateType
      case 5 => DoubleType
      case 6 => BinaryType
      case 7 => ArrayType(FloatType, containsNull = false)
      case 8 => DecimalType(s.precision, s.scale)
      case 9 => BooleanType
      case 10 => FloatType
      case _ => StringType
    }, nullable = s.nullable)))

  /** Validate + translate a Spark write/table schema into column specs;
    * rejects anything the container format can't hold. Temporal types
    * (round 6) ride the integer codec paths: TIMESTAMP_NTZ is kind 3 —
    * int64 micros through the kind-0 machinery (zone maps, filters,
    * aggregate pushdown apply unchanged); DATE is kind 4 — int32 days
    * through the kind-2 narrow path. DOUBLE (round 7) is kind 5 —
    * order-preserving sortable-long bits ([[graft.codecs.DoubleBits]])
    * through the kind-0 machinery, same inheritance. Field nullability
    * is recorded per column: nullable columns store per-chunk validity
    * bitmaps and support IS NULL / IS NOT NULL pushdown.
    */
  private[sources] def specsOf(st: StructType): Seq[graft.engine.ColumnSpec] = {
    require(st.fields.nonEmpty, "graft table needs at least one column")
    st.fields.toSeq.map { f =>
      f.dataType match {
        case LongType => graft.engine.ColumnSpec(f.name, 0, f.nullable)
        case StringType => graft.engine.ColumnSpec(f.name, 1, f.nullable)
        case IntegerType => graft.engine.ColumnSpec(f.name, 2, f.nullable)
        case TimestampNTZType => graft.engine.ColumnSpec(f.name, 3, f.nullable)
        case DateType => graft.engine.ColumnSpec(f.name, 4, f.nullable)
        case DoubleType => graft.engine.ColumnSpec(f.name, 5, f.nullable)
        // the LLM-pipeline shapes (round 7): opaque media payloads and
        // embeddings live in the engine's own table
        case BinaryType => graft.engine.ColumnSpec(f.name, 6, f.nullable)
        case ArrayType(FloatType, _) => graft.engine.ColumnSpec(f.name, 7, f.nullable)
        // DECIMAL (round 8): the unscaled long rides the kind-0 codec
        // machinery — p <= 18 is exactly what a long's 63 bits hold
        case d: DecimalType if d.precision <= 18 =>
          graft.engine.ColumnSpec(f.name, 8, f.nullable, d.precision, d.scale)
        case d: DecimalType => throw new IllegalArgumentException(
          s"graft DECIMAL columns support precision <= 18 (long-backed); " +
            s"column '${f.name}' is $d")
        case BooleanType => graft.engine.ColumnSpec(f.name, 9, f.nullable)
        // FLOAT (round 9): sortable-int bits through the kind-2 narrow
        // path — the kind-5 pattern at half width (a model-score column
        // no longer forces a cast to DOUBLE)
        case FloatType => graft.engine.ColumnSpec(f.name, 10, f.nullable)
        case other => throw new IllegalArgumentException(
          s"graft supports only BIGINT, INT, STRING, TIMESTAMP_NTZ, " +
            s"DATE, DOUBLE, FLOAT, BINARY, ARRAY<FLOAT>, DECIMAL(<=18), " +
            s"and BOOLEAN columns; column '${f.name}' is $other")
      }
    }
  }

  /** Committed schema of an existing table, from its manifests. Legacy
    * manifests (no schema field) are always the engine schema. With
    * add-only schema EVOLUTION (round 7) manifests may carry different
    * widths: every committed schema must be a PREFIX of the widest one
    * (appends may only add trailing nullable columns), and the widest
    * is the table's schema — containers written before a column was
    * added read back all-NULL for it. ANY parse failure surfaces as
    * IllegalArgumentException — this runs inside Spark's ANALYSIS
    * phase, where a raw NPE/parser exception would be wrapped as an
    * opaque internal error (fuzz contract).
    */
  /** Snapshot pin from read options (time travel, round 8):
    * `versionAsOf` = an explicit retained index version;
    * `timestampAsOf` = epoch millis or `java.sql.Timestamp` syntax,
    * resolved to the highest version committed at or before it.
    */
  private[sources] def asOfVersion(options: CaseInsensitiveStringMap,
      conf: org.apache.hadoop.conf.Configuration,
      path: String): Option[Long] = {
    val v = Option(options.get("versionAsOf")).map { s =>
      try s.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"versionAsOf must be a snapshot version number, got '$s'") }
    }
    val ts = Option(options.get("timestampAsOf")).map { s =>
      try s.toLong
      catch { case _: NumberFormatException =>
        try java.sql.Timestamp.valueOf(s).getTime
        catch { case _: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"timestampAsOf must be epoch millis or " +
              s"'yyyy-mm-dd hh:mm:ss[.f...]', got '$s'") } }
    }
    require(v.isEmpty || ts.isEmpty,
      "specify either versionAsOf or timestampAsOf, not both")
    v.orElse(ts.map(Manifests.versionAt(conf, path, _)))
  }

  /** Per-manifest column specs (legacy = the engine schema). */
  private[sources] def specsOfManifest(
      m: ParsedManifest): Seq[graft.engine.ColumnSpec] =
    if (m.schemaCols.isEmpty) specsOf(schema)
    else m.schemaCols.map { case (n, k) =>
      graft.engine.ColumnSpec.fromPacked(n, k) }

  /** The table's CURRENT schema from a committed-manifest snapshot
    * (round 8, rename support). Field IDENTITY is positional — sound
    * under the add-only invariant (no drops/reorders ever commit) —
    * so a position's kind/nullability/type parameters must be UNIFORM
    * across every manifest covering it, while its NAME is a label:
    * the manifest with the highest commitId covering the position
    * names it (a rename commits a zero-row schema MARKER through the
    * ordinary OCC path; older containers keep their historical labels
    * and readers translate per container).
    */
  private[sources] def currentSpecsOf(
      ms: Seq[ParsedManifest]): Seq[graft.engine.ColumnSpec] = {
    val perManifest = ms.map(m =>
      (m.name, m.commitId, specsOfManifest(m), m.ancestors.nonEmpty))
    val widest = perManifest.map(_._3.size).max
    (0 until widest).map { i =>
      val covering = perManifest.filter(_._3.size > i)
      // shape (everything but the label and the dropped bit) must agree
      // at each position
      val shapes = covering.map { c =>
        val s = c._3(i); (s.kind, s.nullable, s.precision, s.scale)
      }.distinct
      require(shapes.size == 1,
        s"graft table has inconsistent committed schemas at column " +
          s"position $i: ${covering.map(c => s"${c._1}:${c._3(i)}")
            .mkString("; ")} (appends may only add trailing nullable " +
          "columns; only names may change, via renameColumn)")
      // labels (and the dropped bit, round 9 — a drop is label-like
      // metadata) resolve from PLAIN manifests (appends + rename/drop
      // markers) when any covers the position: a compacted generation
      // carries its FOLDED sources' historical labels under a fresh high
      // commitId, and must not revert a rename/drop it didn't witness
      val labelSources = {
        val plain = covering.filterNot(_._4)
        if (plain.nonEmpty) plain else covering
      }
      val latest = labelSources.maxBy(_._2)._3(i)
      covering.head._3(i).copy(name = latest.name, dropped = latest.dropped)
    }
  }

  private[sources] def inferFrom(path: String,
      conf: org.apache.hadoop.conf.Configuration = null,
      asOf: Option[Long] = None): Option[StructType] = {
    val c = if (conf != null) conf
      else org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    try {
      val ms = asOf.fold(Manifests.readCommitted(c, path))(
        Manifests.readCommittedAt(c, path, _))
      if (ms.isEmpty) None
      else {
        // dropped positions (round 9) stay in the positional chain but
        // are projected out of the visible schema; the duplicate-name
        // guard applies to visible labels only (a re-added column may
        // legitimately reuse a dropped one's name at a new position)
        val visible = currentSpecsOf(ms).filterNot(_.dropped)
        require(visible.map(_.name).distinct.size == visible.size,
          s"graft table $path resolves duplicate current column names: " +
            visible.map(_.name).mkString(","))
        require(visible.nonEmpty,
          s"graft table $path has no visible columns (all dropped)")
        Some(schemaOf(visible))
      }
    } catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
        s"corrupt graft table metadata under $path", e)
    }
  }

  /** The table's FULL positional spec chain — dropped positions included
    * (round 9). None = no committed table yet.
    */
  private[sources] def fullSpecsFrom(path: String,
      conf: org.apache.hadoop.conf.Configuration = null)
      : Option[Seq[graft.engine.ColumnSpec]] = {
    val c = if (conf != null) conf
      else org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val ms = Manifests.readCommitted(c, path)
    if (ms.isEmpty) None else Some(currentSpecsOf(ms))
  }

  private[sources] val longCols = ColumnarEngine.longColumns.toSet
  private[sources] val strCols = ColumnarEngine.stringColumns.toSet

  // classification is by PHYSICAL representation: TIMESTAMP_NTZ columns
  // decode into the per-chunk long arrays (micros), DATE columns into
  // the int arrays (days), DECIMAL into the long arrays (unscaled), and
  // BOOLEAN into the int arrays (0/1) — each rides its lane's reader path
  private[sources] def longColsOf(st: StructType): Set[String] =
    st.fields.collect {
      case f if f.dataType == LongType || f.dataType == TimestampNTZType ||
        f.dataType.isInstanceOf[DecimalType] => f.name
    }.toSet

  /** DECIMAL columns and their scales — filter-constant translation
    * (logical BigDecimal -> stored unscaled long) needs the scale.
    */
  private[sources] def decScaleOf(st: StructType): Map[String, Int] =
    st.fields.collect {
      case f if f.dataType.isInstanceOf[DecimalType] =>
        f.name -> f.dataType.asInstanceOf[DecimalType].scale
    }.toMap

  private[sources] def boolColsOf(st: StructType): Set[String] =
    st.fields.collect { case f if f.dataType == BooleanType => f.name }.toSet

  /** Rewrite pushed filters on DECIMAL/BOOLEAN columns into their
    * PHYSICAL form (unscaled-long / 0-1 int constants) so every
    * downstream stage — zone-map admission, chunk pruning, row-level
    * re-check — runs the existing long/int machinery unchanged.
    * Comparisons against a constant finer than the column's scale
    * translate to the equivalent grid bound (floor/ceil of the scaled
    * value); an equality that can't be represented at the column scale
    * matches nothing and stays UNTRANSLATED (so [[pushable]] rejects it
    * and Spark evaluates it residually). Constants beyond long range
    * likewise stay untranslated.
    */
  /** (Round 9) FLOAT (kind 10) constants likewise pre-translate to their
    * order-preserving sortable-int storage form: the mapping is a
    * bijection so every comparison is exact — except ±0.0f, which SQL
    * calls equal but which map to TWO adjacent storage values (-1, 0):
    * equality expands to an IN over both, and each range bound picks the
    * side that preserves SQL semantics. NaN constants stay untranslated
    * (unpushed — Spark evaluates them residually), mirroring kind 5.
    */
  private[sources] def translateFilters(filters: Array[Filter],
      decScale: Map[String, Int], boolCols: Set[String],
      f32Cols: Set[String] = Set.empty): Array[Filter] = {
    def f32(f: Float): java.lang.Integer =
      java.lang.Integer.valueOf(graft.codecs.FloatBits.toSortableInt(f))
    // the inclusive sortable range SQL considers EQUAL to the constant
    def f32Lo(f: Float): java.lang.Integer = f32(if (f == 0.0f) -0.0f else f)
    def f32Hi(f: Float): java.lang.Integer = f32(if (f == 0.0f) 0.0f else f)
    def floorU(bd: java.math.BigDecimal, s: Int): Long =
      bd.setScale(s, java.math.RoundingMode.FLOOR).unscaledValue().longValueExact()
    def ceilU(bd: java.math.BigDecimal, s: Int): Long =
      bd.setScale(s, java.math.RoundingMode.CEILING).unscaledValue().longValueExact()
    def exactU(bd: java.math.BigDecimal, s: Int): Option[Long] =
      try Some(bd.setScale(s).unscaledValue().longValueExact())
      catch { case _: ArithmeticException => None }
    def tr(f: Filter): Filter =
      try f match {
        case EqualTo(c, x: java.math.BigDecimal) if decScale.contains(c) =>
          exactU(x, decScale(c)).fold(f)(u => EqualTo(c, java.lang.Long.valueOf(u)))
        case GreaterThan(c, x: java.math.BigDecimal) if decScale.contains(c) =>
          GreaterThan(c, java.lang.Long.valueOf(floorU(x, decScale(c))))
        case GreaterThanOrEqual(c, x: java.math.BigDecimal) if decScale.contains(c) =>
          GreaterThanOrEqual(c, java.lang.Long.valueOf(ceilU(x, decScale(c))))
        case LessThan(c, x: java.math.BigDecimal) if decScale.contains(c) =>
          LessThan(c, java.lang.Long.valueOf(ceilU(x, decScale(c))))
        case LessThanOrEqual(c, x: java.math.BigDecimal) if decScale.contains(c) =>
          LessThanOrEqual(c, java.lang.Long.valueOf(floorU(x, decScale(c))))
        case In(c, vs) if decScale.contains(c) && vs.nonEmpty &&
            vs.forall(_.isInstanceOf[java.math.BigDecimal]) =>
          // members unrepresentable at the column scale can never match:
          // dropping them preserves IN semantics exactly
          val exact = vs.flatMap(v =>
            exactU(v.asInstanceOf[java.math.BigDecimal], decScale(c)))
          if (exact.isEmpty) f
          else In(c, exact.map(java.lang.Long.valueOf(_): AnyRef))
        case EqualTo(c, x: java.lang.Float) if f32Cols(c) && !x.isNaN =>
          val (lo, hi) = (f32Lo(x), f32Hi(x))
          if (lo == hi) EqualTo(c, lo) else In(c, Array[Any](lo, hi))
        case GreaterThan(c, x: java.lang.Float) if f32Cols(c) && !x.isNaN =>
          GreaterThan(c, f32Hi(x))
        case GreaterThanOrEqual(c, x: java.lang.Float) if f32Cols(c) && !x.isNaN =>
          GreaterThanOrEqual(c, f32Lo(x))
        case LessThan(c, x: java.lang.Float) if f32Cols(c) && !x.isNaN =>
          LessThan(c, f32Lo(x))
        case LessThanOrEqual(c, x: java.lang.Float) if f32Cols(c) && !x.isNaN =>
          LessThanOrEqual(c, f32Hi(x))
        case In(c, vs) if f32Cols(c) && vs.nonEmpty &&
            vs.forall(v => v.isInstanceOf[java.lang.Float] &&
              !v.asInstanceOf[java.lang.Float].isNaN) =>
          In(c, vs.flatMap { v =>
            val x = v.asInstanceOf[java.lang.Float].floatValue()
            if (x == 0.0f) Seq[Any](f32Lo(x), f32Hi(x)) else Seq[Any](f32(x))
          })
        case EqualTo(c, x: java.lang.Boolean) if boolCols(c) =>
          EqualTo(c, java.lang.Integer.valueOf(if (x) 1 else 0))
        case In(c, vs) if boolCols(c) && vs.nonEmpty &&
            vs.forall(_.isInstanceOf[java.lang.Boolean]) =>
          In(c, vs.map(v => java.lang.Integer.valueOf(
            if (v.asInstanceOf[java.lang.Boolean]) 1 else 0): AnyRef))
        case other => other
      } catch { case _: ArithmeticException => f } // out-of-long constant
    filters.map(tr)
  }
  /** String AND binary columns: kind 6 decodes into the same byte-slice
    * column shape (a pushed string constant can never reach a binary
    * column — Spark types the filters — so sharing the needed-set is
    * safe and saves a fourth plumbing lane).
    */
  private[sources] def strColsOf(st: StructType): Set[String] =
    st.fields.collect {
      case f if f.dataType == StringType || f.dataType == BinaryType => f.name
    }.toSet
  private[sources] def fltColsOf(st: StructType): Set[String] =
    st.fields.collect {
      case f if f.dataType == ArrayType(FloatType, containsNull = false) ||
        f.dataType == ArrayType(FloatType, containsNull = true) => f.name
    }.toSet
  private[sources] def intColsOf(st: StructType): Set[String] =
    st.fields.collect {
      case f if f.dataType == IntegerType || f.dataType == DateType ||
        f.dataType == BooleanType || f.dataType == FloatType => f.name
    }.toSet

  /** Scalar FLOAT columns (kind 10): pushed Float constants pre-translate
    * to their order-preserving sortable-int storage form.
    */
  private[sources] def f32ColsOf(st: StructType): Set[String] =
    st.fields.collect { case f if f.dataType == FloatType => f.name }.toSet
  private[sources] def dblColsOf(st: StructType): Set[String] =
    st.fields.collect { case f if f.dataType == DoubleType => f.name }.toSet
  private[sources] def nullableColsOf(st: StructType): Set[String] =
    st.fields.collect { case f if f.nullable => f.name }.toSet

  /** Physical value of a pushed temporal filter constant: TIMESTAMP_NTZ
    * constants arrive as [[java.time.LocalDateTime]] (micros since epoch
    * is the stored long), DATE constants as [[java.sql.Date]] or
    * [[java.time.LocalDate]] depending on the session's Java-8-API flag
    * (epoch days is the stored int).
    */
  private[sources] def microsOf(x: java.time.LocalDateTime): Long =
    x.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + x.getNano / 1000L
  private[sources] def daysOf(x: Any): Option[Int] = x match {
    case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case _ => None
  }

  /** Default target split size (encoded bytes) when grouping admitted
    * chunks into input partitions.
    */
  final val DefaultMaxSplitBytes: Long = 128L << 20

  /** One declared write-partition transform (round 8):
    * `option("partitionBy", "lang, days(ts), bucket(8, repo)")`.
    * identity/days cluster+sort the write so the existing zone-map /
    * envelope machinery proves container-level skips; bucket(n, col)
    * additionally records each container's OBSERVED bucket-id set in
    * its manifest, which [[admitManifest]] uses to eliminate containers
    * for point/IN filters on the bucket column — the case hash
    * interleaving makes value zone maps useless for.
    */
  private[sources] sealed trait PartTransform {
    def col: String
    def render: String
  }
  private[sources] final case class IdentityT(col: String) extends PartTransform {
    def render = s"identity($col)"
  }
  private[sources] final case class DaysT(col: String) extends PartTransform {
    def render = s"days($col)"
  }
  private[sources] final case class BucketT(n: Int, col: String) extends PartTransform {
    def render = s"bucket($n,$col)"
  }

  private val BucketRe = """(?i)bucket\s*\(\s*(\d+)\s*,\s*([^\s()]+)\s*\)""".r
  private val DaysRe = """(?i)days\s*\(\s*([^\s()]+)\s*\)""".r

  private[sources] def parsePartitionBy(spec: String): Seq[PartTransform] =
    // split on commas OUTSIDE parentheses: "lang, bucket(8, repo)" is
    // two transforms, not three fragments
    spec.split(""",(?![^(]*\))""").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case BucketRe(n, c) =>
        require(n.toInt >= 2, s"bucket($n, $c): need at least 2 buckets")
        BucketT(n.toInt, c)
      case DaysRe(c) => DaysT(c)
      case c =>
        require(!c.contains("(") && !c.contains(")"),
          s"unsupported partition transform '$c'; supported: identity " +
            "(bare column), days(col), bucket(n, col)")
        IdentityT(c)
    }

  /** Stable bucket id of a stored value — writer-side recording and
    * read-side admission must agree (pruning correctness needs nothing
    * else), and the function deliberately MIRRORS Spark's
    * HashPartitioning (Murmur3, seed 42, pmod): a bucket write with
    * `writePartitions` = n then routes each bucket to exactly one
    * writer task, so every container records a near-singleton id set —
    * maximal elimination. A different task count only widens the sets;
    * admission stays sound.
    */
  private[sources] def bucketIdOfLong(v: Long, n: Int): Int =
    pmodInt(org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42), n)
  private[sources] def bucketIdOfInt(v: Int, n: Int): Int =
    pmodInt(org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42), n)
  private[sources] def bucketIdOfString(v: String, n: Int): Int = {
    val u = UTF8String.fromString(v)
    pmodInt(org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), 42), n)
  }
  @inline private def pmodInt(h: Int, n: Int): Int = ((h % n) + n) % n

  /** Bucket id of a pushed filter constant for column `col` of a
    * manifest recording `n`-bucket ids; None = not a bucketable constant
    * (admit). Decimal/boolean columns cannot be bucket columns (the
    * write builder rejects them), so the physical-constant translation
    * never reaches here with a rescaled meaning.
    */
  private[sources] def bucketIdOfConstant(x: Any, n: Int): Option[Int] = x match {
    case v: java.lang.Long => Some(bucketIdOfLong(v.longValue(), n))
    case v: java.lang.Integer => Some(bucketIdOfInt(v.intValue(), n))
    case v: String => Some(bucketIdOfString(v, n))
    case _ => None
  }

  /** Is every long range / string dict / string range / null count proof
    * UNABLE to rule this chunk out? Unknown/absent stats admit (skip only
    * on PROOF). String ranges are recorded only for all-ASCII chunks,
    * where Java, UTF8String, and DuckDB collation agree. Null counts are
    * recorded for every nullable column (explicit zeros included), so
    * `IS NOT NULL` skips all-null chunks and `IS NULL` skips
    * fully-present ones; an ABSENT entry (legacy manifest, non-nullable
    * column) admits.
    */
  private[sources] def admitChunk(c: ChunkStats, filters: Seq[Filter]): Boolean =
    admit(c.longRanges, filters) && filters.forall {
      case IsNotNull(col) => !c.nullCounts.get(col).contains(c.rows)
      case IsNull(col) => c.nullCounts.get(col).forall(_ > 0)
      case EqualTo(col, v: String) =>
        c.strDicts.get(col).forall(_.contains(v)) &&
          c.strRanges.get(col).forall { case (lo, hi) =>
            v.compareTo(lo) >= 0 && v.compareTo(hi) <= 0
          }
      case In(col, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        vs.exists { x =>
          val v = x.asInstanceOf[String]
          c.strDicts.get(col).forall(_.contains(v)) &&
            c.strRanges.get(col).forall { case (lo, hi) =>
              v.compareTo(lo) >= 0 && v.compareTo(hi) <= 0
            }
        }
      case _ => true
    }

  /** Container/partition-level numeric zone-map admission (legacy
    * manifests without a chunk index plan at this granularity). Int
    * (kind 2) columns record their ranges in the same map; their filter
    * constants arrive as Integer. Double (kind 5) columns record ranges
    * over their order-preserving sortable-long mapping; a constant maps
    * to a [lo, hi] PAIR because ±0.0 are two storage values SQL calls
    * equal (NaN constants are never pushed — [[pushable]] excludes
    * them — so an unmapped constant just admits).
    */
  private[sources] def admit(ranges: Map[String, (Long, Long)],
                             filters: Seq[Filter]): Boolean = {
    // (vLo, vHi): the inclusive sortable range of storage values SQL
    // considers EQUAL to the constant — a single point for everything
    // except double ±0.0
    def num(x: Any): Option[(Long, Long)] = x match {
      case v: java.lang.Long => val l = v.longValue(); Some((l, l))
      case v: java.lang.Integer => val l = v.longValue(); Some((l, l))
      // temporal constants prune against the same physical zone maps
      case v: java.time.LocalDateTime => val m = microsOf(v); Some((m, m))
      case v: java.lang.Double =>
        val d = v.doubleValue()
        if (d.isNaN) None
        else Some((
          graft.codecs.DoubleBits.toSortableLong(if (d == 0.0) -0.0 else d),
          graft.codecs.DoubleBits.toSortableLong(if (d == 0.0) 0.0 else d)))
      case _ => daysOf(x).map(d => (d.toLong, d.toLong))
    }
    filters.forall {
      case EqualTo(c, x) if ranges.contains(c) && num(x).isDefined =>
        val (lo, hi) = ranges(c); val (vLo, vHi) = num(x).get
        vHi >= lo && vLo <= hi
      case GreaterThan(c, x) if ranges.contains(c) && num(x).isDefined =>
        ranges(c)._2 > num(x).get._2
      case GreaterThanOrEqual(c, x) if ranges.contains(c) && num(x).isDefined =>
        ranges(c)._2 >= num(x).get._1
      case LessThan(c, x) if ranges.contains(c) && num(x).isDefined =>
        ranges(c)._1 < num(x).get._1
      case LessThanOrEqual(c, x) if ranges.contains(c) && num(x).isDefined =>
        ranges(c)._1 <= num(x).get._2
      case In(c, vs) if ranges.contains(c) && vs.nonEmpty &&
          vs.forall(num(_).isDefined) =>
        val (lo, hi) = ranges(c)
        vs.exists(x => { val (vLo, vHi) = num(x).get; vHi >= lo && vLo <= hi })
      case _ => true
    }
  }

  /** A filter this source fully enforces (zone-map/dict chunk skip +
    * row-level re-check). Long comparisons and IN; string equality and
    * IN (`lang = 'en'`, `repo IN (...)` — inequality on strings stays in
    * Spark: collation-safe range proofs only hold for the ASCII-recorded
    * stats, not arbitrary row values). Double comparisons and IN push
    * against the sortable-long zone maps — except NaN constants, whose
    * Spark ordering (greater than everything, equal to itself) diverges
    * from both IEEE and the sortable mapping's tail; they stay in Spark.
    * IsNotNull/IsNull prune whole chunks via per-chunk null counts and
    * re-check against the validity bitmaps.
    */
  private[sources] def pushable(f: Filter, longCols: Set[String],
                                strCols: Set[String],
                                intCols: Set[String] = Set.empty,
                                dblCols: Set[String] = Set.empty,
                                fltCols: Set[String] = Set.empty): Boolean = f match {
    case EqualTo(c, x: java.lang.Double) => dblCols(c) && !x.isNaN
    case GreaterThan(c, x: java.lang.Double) => dblCols(c) && !x.isNaN
    case GreaterThanOrEqual(c, x: java.lang.Double) => dblCols(c) && !x.isNaN
    case LessThan(c, x: java.lang.Double) => dblCols(c) && !x.isNaN
    case LessThanOrEqual(c, x: java.lang.Double) => dblCols(c) && !x.isNaN
    case In(c, vs) if dblCols(c) =>
      vs.nonEmpty && vs.forall(v => v.isInstanceOf[java.lang.Double] &&
        !v.asInstanceOf[java.lang.Double].isNaN)
    case EqualTo(c, _: Long) => longCols(c)
    case GreaterThan(c, _: Long) => longCols(c)
    case GreaterThanOrEqual(c, _: Long) => longCols(c)
    case LessThan(c, _: Long) => longCols(c)
    case LessThanOrEqual(c, _: Long) => longCols(c)
    // temporal IN must precede the generic long/int IN cases: those
    // guard only on the COLUMN set (which contains ts/date columns) and
    // would match-and-reject a temporal value list before these fire
    case In(c, vs) if longCols(c) &&
        vs.nonEmpty && vs.forall(_.isInstanceOf[java.time.LocalDateTime]) => true
    case In(c, vs) if intCols(c) &&
        vs.nonEmpty && vs.forall(daysOf(_).isDefined) => true
    case In(c, vs) if longCols(c) =>
      vs.nonEmpty && vs.forall(_.isInstanceOf[java.lang.Long])
    case EqualTo(c, _: Int) => intCols(c)
    case GreaterThan(c, _: Int) => intCols(c)
    case GreaterThanOrEqual(c, _: Int) => intCols(c)
    case LessThan(c, _: Int) => intCols(c)
    case LessThanOrEqual(c, _: Int) => intCols(c)
    case In(c, vs) if intCols(c) =>
      vs.nonEmpty && vs.forall(_.isInstanceOf[java.lang.Integer])
    case EqualTo(c, _: java.time.LocalDateTime) => longCols(c)
    case GreaterThan(c, _: java.time.LocalDateTime) => longCols(c)
    case GreaterThanOrEqual(c, _: java.time.LocalDateTime) => longCols(c)
    case LessThan(c, _: java.time.LocalDateTime) => longCols(c)
    case LessThanOrEqual(c, _: java.time.LocalDateTime) => longCols(c)
    case EqualTo(c, x) if daysOf(x).isDefined => intCols(c)
    case GreaterThan(c, x) if daysOf(x).isDefined => intCols(c)
    case GreaterThanOrEqual(c, x) if daysOf(x).isDefined => intCols(c)
    case LessThan(c, x) if daysOf(x).isDefined => intCols(c)
    case LessThanOrEqual(c, x) if daysOf(x).isDefined => intCols(c)
    case EqualTo(c, _: String) => strCols(c)
    case In(c, vs) if strCols(c) =>
      vs.nonEmpty && vs.forall(_.isInstanceOf[String])
    case IsNotNull(c) =>
      longCols(c) || strCols(c) || intCols(c) || dblCols(c) || fltCols(c)
    case IsNull(c) =>
      longCols(c) || strCols(c) || intCols(c) || dblCols(c) || fltCols(c)
    case _ => false
  }

  /** Compiled row-level predicate over a decoded chunk: the reader
    * enforces exactly what pushFilters claimed. String constants are
    * pre-encoded to UTF-8 ONCE and compared against the decoded slices —
    * no per-row String materialization. SQL null semantics: every
    * comparison/IN on a NULL row is not-true (the chunk's validity
    * bitmap gates each predicate), IsNull/IsNotNull test the bitmap
    * itself.
    */
  private[sources] type RowPred = (DecodedChunk, Int) => Boolean

  /** Wrap a value predicate so NULL rows of column `c` never pass. */
  @inline private def nn(c: String, p: RowPred): RowPred =
    (ch, j) => ch.validAt(c, j) && p(ch, j)

  private[sources] def compileFilters(filters: Array[Filter],
                                      longCols: Set[String]): Array[RowPred] =
    filters.map[RowPred] {
      case EqualTo(c, x: Long) => nn(c, (ch, j) => ch.longs.get(c)(j) == x)
      case GreaterThan(c, x: Long) => nn(c, (ch, j) => ch.longs.get(c)(j) > x)
      case GreaterThanOrEqual(c, x: Long) => nn(c, (ch, j) => ch.longs.get(c)(j) >= x)
      case LessThan(c, x: Long) => nn(c, (ch, j) => ch.longs.get(c)(j) < x)
      case LessThanOrEqual(c, x: Long) => nn(c, (ch, j) => ch.longs.get(c)(j) <= x)
      case EqualTo(c, x: Int) => nn(c, (ch, j) => ch.ints.get(c)(j) == x)
      case GreaterThan(c, x: Int) => nn(c, (ch, j) => ch.ints.get(c)(j) > x)
      case GreaterThanOrEqual(c, x: Int) => nn(c, (ch, j) => ch.ints.get(c)(j) >= x)
      case LessThan(c, x: Int) => nn(c, (ch, j) => ch.ints.get(c)(j) < x)
      case LessThanOrEqual(c, x: Int) => nn(c, (ch, j) => ch.ints.get(c)(j) <= x)
      // doubles: IEEE comparisons except that a NaN ROW ranks above
      // every constant (Spark's total order); NaN CONSTANTS are never
      // pushed. IEEE == makes -0.0 = 0.0, matching SQL equality.
      case EqualTo(c, x: Double) => nn(c, (ch, j) => ch.doubles.get(c)(j) == x)
      case GreaterThan(c, x: Double) =>
        nn(c, (ch, j) => { val a = ch.doubles.get(c)(j); a > x || a.isNaN })
      case GreaterThanOrEqual(c, x: Double) =>
        nn(c, (ch, j) => { val a = ch.doubles.get(c)(j); a >= x || a.isNaN })
      case LessThan(c, x: Double) => nn(c, (ch, j) => ch.doubles.get(c)(j) < x)
      case LessThanOrEqual(c, x: Double) => nn(c, (ch, j) => ch.doubles.get(c)(j) <= x)
      // temporal constants compare against the stored physical values
      // (micros in the long arrays, days in the int arrays)
      case EqualTo(c, x: java.time.LocalDateTime) =>
        val m = microsOf(x); nn(c, (ch, j) => ch.longs.get(c)(j) == m)
      case GreaterThan(c, x: java.time.LocalDateTime) =>
        val m = microsOf(x); nn(c, (ch, j) => ch.longs.get(c)(j) > m)
      case GreaterThanOrEqual(c, x: java.time.LocalDateTime) =>
        val m = microsOf(x); nn(c, (ch, j) => ch.longs.get(c)(j) >= m)
      case LessThan(c, x: java.time.LocalDateTime) =>
        val m = microsOf(x); nn(c, (ch, j) => ch.longs.get(c)(j) < m)
      case LessThanOrEqual(c, x: java.time.LocalDateTime) =>
        val m = microsOf(x); nn(c, (ch, j) => ch.longs.get(c)(j) <= m)
      case EqualTo(c, x) if daysOf(x).isDefined =>
        val d = daysOf(x).get; nn(c, (ch, j) => ch.ints.get(c)(j) == d)
      case GreaterThan(c, x) if daysOf(x).isDefined =>
        val d = daysOf(x).get; nn(c, (ch, j) => ch.ints.get(c)(j) > d)
      case GreaterThanOrEqual(c, x) if daysOf(x).isDefined =>
        val d = daysOf(x).get; nn(c, (ch, j) => ch.ints.get(c)(j) >= d)
      case LessThan(c, x) if daysOf(x).isDefined =>
        val d = daysOf(x).get; nn(c, (ch, j) => ch.ints.get(c)(j) < d)
      case LessThanOrEqual(c, x) if daysOf(x).isDefined =>
        val d = daysOf(x).get; nn(c, (ch, j) => ch.ints.get(c)(j) <= d)
      case In(c, vs) if vs.nonEmpty &&
          vs.forall(_.isInstanceOf[java.time.LocalDateTime]) =>
        val set = vs.map(x =>
          microsOf(x.asInstanceOf[java.time.LocalDateTime])).toSet
        nn(c, (ch, j) => set.contains(ch.longs.get(c)(j)))
      case In(c, vs) if vs.nonEmpty && vs.forall(daysOf(_).isDefined) =>
        val set = vs.map(daysOf(_).get).toSet
        nn(c, (ch, j) => set.contains(ch.ints.get(c)(j)))
      case EqualTo(c, x: String) =>
        val b = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        nn(c, (ch, j) => ch.strs.get(c).equalsBytes(j, b))
      case In(c, vs) if longCols(c) =>
        val set = vs.map(_.asInstanceOf[java.lang.Long].longValue()).toSet
        nn(c, (ch, j) => set.contains(ch.longs.get(c)(j)))
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[java.lang.Integer]) =>
        val set = vs.map(_.asInstanceOf[java.lang.Integer].intValue()).toSet
        nn(c, (ch, j) => set.contains(ch.ints.get(c)(j)))
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[java.lang.Double]) =>
        // an ARRAY scan with IEEE ==, not a Set: boxed-Double set
        // membership would miss -0.0 vs 0.0 (SQL calls them equal)
        val arr = vs.map(_.asInstanceOf[java.lang.Double].doubleValue())
        nn(c, (ch, j) => {
          val a = ch.doubles.get(c)(j)
          var i = 0
          var hit = false
          while (!hit && i < arr.length) { hit = a == arr(i); i += 1 }
          hit
        })
      case In(c, vs) =>
        val bs = vs.map(_.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        nn(c, (ch, j) => bs.exists(b => ch.strs.get(c).equalsBytes(j, b)))
      case IsNotNull(c) => (ch, j) => ch.validAt(c, j)
      case IsNull(c) => (ch, j) => !ch.validAt(c, j)
      case f => throw new IllegalStateException(s"unpushable filter $f")
    }

  /** Rewrite a pushed filter's column reference through a rename map
    * (current name -> a container's stored name, or the reverse). Only
    * the filter shapes this source ever pushes appear here.
    */
  private[sources] def renameRefs(f: Filter, m: Map[String, String]): Filter =
    if (m.isEmpty) f
    else f match {
      case EqualTo(c, v) => EqualTo(m.getOrElse(c, c), v)
      case GreaterThan(c, v) => GreaterThan(m.getOrElse(c, c), v)
      case GreaterThanOrEqual(c, v) => GreaterThanOrEqual(m.getOrElse(c, c), v)
      case LessThan(c, v) => LessThan(m.getOrElse(c, c), v)
      case LessThanOrEqual(c, v) => LessThanOrEqual(m.getOrElse(c, c), v)
      case In(c, vs) => In(m.getOrElse(c, c), vs)
      case IsNull(c) => IsNull(m.getOrElse(c, c))
      case IsNotNull(c) => IsNotNull(m.getOrElse(c, c))
      case other => other
    }

  /** Per-container rename map CURRENT name -> STORED name for the
    * positions this container covers (empty in the common no-renames
    * case, which keeps the fast paths allocation-free). `tableCols` is
    * the table's current schema names in positional order; Nil disables
    * translation (legacy callers).
    */
  private[sources] def storedNamesOf(m: ParsedManifest,
      tableCols: Seq[String]): Map[String, String] =
    if (tableCols.isEmpty) Map.empty
    else {
      val stored = specsOfManifest(m).map(_.name)
      tableCols.zip(stored).filter(p => p._1 != p._2).toMap
    }

  /** The filters THIS container may be admitted against, translated to
    * its stored (historical) labels — or None when a non-IsNull filter
    * references a column the container does not cover (it predates the
    * column, add-only evolution: all rows NULL there, so the filter
    * matches nothing and the container is skipped whole).
    *
    * IsNull on an uncovered column is trivially TRUE in that container
    * and MUST be dropped BEFORE name translation: after a rename X->Y
    * followed by a new column reusing the name X, the untranslated
    * current name "X" collides with the container's STORED pre-rename
    * label "X" at another position, and evaluating IsNull("X") against
    * THAT column's null counts (explicit 0) would prune a container
    * whose rows ALL match the current X IS NULL (round-8 advice, high).
    */
  private[sources] def containerFilters(m: ParsedManifest,
      filters: Seq[Filter], tableCols: Seq[String],
      defaultNames: Seq[String]): Option[Seq[Filter]] = {
    val storedNames: Seq[String] =
      if (m.schemaCols.isEmpty) defaultNames else m.schemaCols.map(_._1)
    val present: Set[String] =
      if (tableCols.isEmpty) storedNames.toSet
      else tableCols.take(storedNames.size).toSet
    val (covered, uncovered) = filters.partition(_.references.forall(present))
    if (uncovered.exists(!_.isInstanceOf[IsNull])) None
    else {
      val toStored = storedNamesOf(m, tableCols)
      Some(if (toStored.isEmpty) covered
           else covered.map(renameRefs(_, toStored)))
    }
  }

  /** Container-level admission against the index SUMMARY (round 8,
    * two-level metadata): the manifest's whole-partition zone maps plus
    * the [[graft.engine.ManifestEnvelope]] fold of its chunk stats.
    * Same proof discipline as [[admitChunk]] — absent stats admit —
    * at group granularity, so a pruned container's per-chunk detail is
    * NEVER read off storage.
    */
  private[sources] def admitManifest(m: ParsedManifest,
                                     filters: Seq[Filter]): Boolean = {
    // bucket(n, col) transforms recorded by the writer: a point/IN
    // constant admits only containers whose observed bucket-id set can
    // hold it (n comes from the manifest's own partitioning record, so
    // mixed-n generations stay individually sound). Evaluated as an
    // independent conjunct so string constants ALSO keep their
    // dict/range proofs below.
    lazy val bucketN: Map[String, Int] =
      m.partitioning.flatMap {
        case BucketRe(n, c) => Some(c -> n.toInt)
        case _ => None
      }.toMap
    def bucketAdmits(col: String, x: Any): Boolean =
      (for {
        n <- bucketN.get(col)
        ids <- m.bucketIds.get(col)
        b <- bucketIdOfConstant(x, n)
      } yield ids.contains(b)).getOrElse(true)
    val buckets = m.bucketIds.isEmpty || filters.forall {
      case EqualTo(col, x) => bucketAdmits(col, x)
      case In(col, vs) if vs.nonEmpty => vs.exists(bucketAdmits(col, _))
      case _ => true
    }
    buckets && admit(m.longRanges, filters) && filters.forall {
      case IsNotNull(col) => !m.env.nullCounts.get(col).contains(m.rows)
      case IsNull(col) => m.env.nullCounts.get(col).forall(_ > 0L)
      case EqualTo(col, v: String) =>
        m.env.strDicts.get(col).forall(_.contains(v)) &&
          m.env.strRanges.get(col).forall { case (lo, hi) =>
            v.compareTo(lo) >= 0 && v.compareTo(hi) <= 0
          }
      case In(col, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        vs.exists { x =>
          val v = x.asInstanceOf[String]
          m.env.strDicts.get(col).forall(_.contains(v)) &&
            m.env.strRanges.get(col).forall { case (lo, hi) =>
              v.compareTo(lo) >= 0 && v.compareTo(hi) <= 0
            }
        }
      case _ => true
    }
  }

  /** Chunk-granular input partitions for a set of committed manifests:
    * admitted chunks grouped into runs of ≤ maxSplitBytes (shared by the
    * batch scan and the micro-batch stream).
    *
    * Two-level planning (round 8): containers are admitted against the
    * index summary FIRST ([[admitManifest]]); only survivors have their
    * per-chunk stats hydrated via `hydrate` (one commit-marker read per
    * admitted container) — index bytes parsed per plan are bounded by
    * the table's container count, chunk-stat bytes by ADMITTED
    * containers.
    */
  private[sources] def planPartitions(path: String,
      manifests: Seq[ParsedManifest], filters: Array[Filter],
      maxSplitBytes: Long,
      neededCols: Set[String] = Set.empty,
      hydrate: ParsedManifest => ParsedManifest = m => {
        require(!m.chunksElided,
          "planner bug: an index-elided manifest reached planPartitions " +
            "without a hydrator")
        m
      },
      tableCols: Seq[String] = Nil): Array[InputPartition] = {
    val defaultNames: Seq[String] = schema.fieldNames.toSeq
    val parts = Array.newBuilder[InputPartition]
    manifests.filterNot(_.schemaMarker).sortBy(_.name).foreach { m =>
      val file = m.blockFile(path)
      // rename support (round 8): a container written before a rename
      // stores blocks/stats under its HISTORICAL labels — admission and
      // the reader translate between the CURRENT names the query uses
      // and this container's stored names, positionally
      val toStored = storedNamesOf(m, tableCols)
      val storedNames: Seq[String] =
        if (m.schemaCols.isEmpty) defaultNames else m.schemaCols.map(_._1)
      // add-only schema evolution: a container written before a column
      // was added has no block for it — its rows are all-NULL there. A
      // value predicate or IsNotNull on such a column matches NOTHING in
      // this container (SQL three-valued logic): containerFilters
      // returns None and the container is skipped whole. IsNull on it is
      // trivially TRUE — dropped from the admission set BEFORE name
      // translation (rename + name-reuse collision, see containerFilters)
      // and dropped reader-side by effectiveFilters. `present` is in
      // CURRENT-name space (what neededCols/filters use).
      val present: Set[String] =
        if (tableCols.isEmpty) storedNames.toSet
        else tableCols.take(storedNames.size).toSet
      val absent = neededCols -- present
      val admission =
        containerFilters(m, filters.toSeq, tableCols, defaultNames)
      if (admission.exists(admitManifest(m, _))) {
        val mFilters = admission.get
        val hm = if (m.chunksElided) hydrate(m) else m
        val digestCur = toStored.collectFirst {
          case (cur, st) if st == m.digestCol => cur
        }.getOrElse(m.digestCol)
        if (hm.chunkIndex.isEmpty) {
          // legacy manifest: whole-container sequential stream
          parts += GraftInputPartition(file, Nil, digestCur, absent, toStored)
        } else {
          val admitted = hm.chunkIndex
            .filter(admitChunk(_, mFilters))
            .map(c => ChunkSpec(c.offset, c.length, c.rows, c.blockCrcs))
          var run = List.empty[ChunkSpec]
          var runBytes = 0L
          admitted.foreach { c =>
            if (run.nonEmpty && runBytes + c.length > maxSplitBytes) {
              parts += GraftInputPartition(file, run.reverse, digestCur,
                absent, toStored)
              run = Nil; runBytes = 0L
            }
            run = c :: run
            runBytes += c.length
          }
          if (run.nonEmpty)
            parts += GraftInputPartition(file, run.reverse, digestCur,
              absent, toStored)
        }
      }
    }
    parts.result()
  }

  /** Filters applicable inside a container that predates `absent`
    * columns: IsNull on an absent column is trivially TRUE (drop it);
    * any other filter referencing one matches nothing — planning
    * already skipped such containers, so reaching a reader with one is
    * a planner bug, not a data condition.
    */
  private[sources] def effectiveFilters(filters: Array[Filter],
      absent: Set[String]): Array[Filter] =
    if (absent.isEmpty) filters
    else {
      val kept = filters.filterNot(f =>
        f.isInstanceOf[IsNull] && f.references.exists(absent))
      kept.foreach(f => require(!f.references.exists(absent),
        s"planner bug: filter $f references a column this container " +
          s"predates (${absent.mkString(",")})"))
      kept
    }

  private[sources] def rowPasses(preds: Array[RowPred],
      chunk: DecodedChunk, j: Int): Boolean = {
    var i = 0
    while (i < preds.length) {
      if (!preds(i)(chunk, j)) return false
      i += 1
    }
    true
  }
}

class GraftTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft:$path"
  override def schema(): StructType = tableSchema
  // ACCEPT_ANY_SCHEMA: a write to a NEW table defines its schema (the
  // provider can't see the DataFrame at inferSchema time); the write
  // builder enforces the representable kinds and match-or-extend
  // appends (add-only evolution)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, tableSchema, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path, info)
}

// ------------------------------------------------------------------- read

/** One fully-pushed aggregate, answered from the manifests alone. `dt`
  * is the column's Spark type: every pushable type stores a physical
  * long/int whose zone maps live in the same manifest ranges, and the
  * result surfaces back as the column's own type (i32 for INT, micros
  * long for TIMESTAMP_NTZ, days int for DATE).
  */
private[sources] sealed trait GraftAgg
private[sources] case object CountStarAgg extends GraftAgg
private[sources] final case class MinAgg(col: String,
                                         dt: DataType = LongType) extends GraftAgg
private[sources] final case class MaxAgg(col: String,
                                         dt: DataType = LongType) extends GraftAgg
/** COUNT(col) = rows − Σ per-chunk null counts (round 7). `nullable`
  * false = the schema proves zero nulls (count == row count, any kind,
  * any manifest vintage); true = every committed manifest's chunks were
  * verified at translate time to carry a null-count entry for `col`
  * (legacy manifests reject the pushdown instead of undercounting).
  */
private[sources] final case class CountAgg(col: String,
                                           nullable: Boolean) extends GraftAgg

private[sources] object GraftAgg {
  /** Does this pushed-aggregate type store its values as int32? */
  def narrow(dt: DataType): Boolean = dt == IntegerType || dt == DateType
}

class GraftScanBuilder(path: String, tableSchema: StructType,
                       options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private val longCols = GraftDataSource.longColsOf(tableSchema)
  private val strCols = GraftDataSource.strColsOf(tableSchema)
  private val intCols = GraftDataSource.intColsOf(tableSchema)
  private val dblCols = GraftDataSource.dblColsOf(tableSchema)
  private val fltCols = GraftDataSource.fltColsOf(tableSchema)
  private var required: StructType = tableSchema
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

  /** Committed-manifest snapshot for aggregate-pushdown PROOFS:
    * COUNT(col) of a NULLABLE column is answerable only when every
    * chunk carries a null-count entry for it (a legacy manifest would
    * silently undercount nulls — reject instead), and string MIN/MAX
    * only when every chunk carries an all-ASCII range for it (the
    * collation-agreement proof). One driver-side metadata read, same
    * cost class as the schema inference that already happened; lazy at
    * the BUILDER level so COUNT(*)/numeric-MIN/MAX-only pushdowns never
    * pay it and the supportCompletePushDown + pushAggregation pair
    * reads it once.
    */
  /** Snapshot version pinned by `versionAsOf`/`timestampAsOf` read
    * options (time travel, round 8); None = the live table.
    */
  private lazy val pinned: Option[Long] = GraftDataSource.asOfVersion(
    options,
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration,
    path)

  private lazy val committedForStats: Option[Seq[graft.engine.ParsedManifest]] =
    try {
      val conf = ContainerIO.confFrom(ContainerIO.confSnapshot(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
      Some(pinned.fold(Manifests.readCommitted(conf, path))(
        Manifests.readCommittedAt(conf, path, _)))
    }
    catch { case scala.util.control.NonFatal(_) => None }

  /** The table's FULL positional name chain: the query's (visible)
    * field names at their full positions, with position-DROPPED columns
    * (round 9) keeping their tombstone labels in between — what every
    * positional zip between current and stored names must use. Without
    * drops this is exactly `tableSchema.fieldNames` (the fast path).
    */
  private lazy val chainNames: Seq[String] = {
    val visNames = tableSchema.fieldNames.toSeq
    committedForStats match {
      case Some(ms) if ms.nonEmpty =>
        val chain = GraftDataSource.currentSpecsOf(ms)
        if (!chain.exists(_.dropped)) visNames
        else {
          val it = visNames.iterator
          chain.map(s =>
            if (s.dropped) s.name
            else if (it.hasNext) it.next()
            else s.name) ++ it
        }
      case _ => visNames
    }
  }

  /** A column's STORED (historical) label inside one manifest — the
    * key its stats use (rename support).
    */
  private def storedNameIn(m: graft.engine.ParsedManifest, c: String): String =
    GraftDataSource.storedNamesOf(m, chainNames).getOrElse(c, c)

  /** COUNT(*)/COUNT(col)/MIN/MAX over integer columns, ungrouped and
    * unfiltered, translate to manifest lookups (row counts, per-chunk
    * null counts, and zone maps are EXACT); anything else stays in Spark.
    */
  private def translate(agg: Aggregation): Option[Seq[GraftAgg]] = {
    if (agg.groupByExpressions().nonEmpty || pushed.nonEmpty) return None
    def pushableType(c: String): Option[DataType] =
      tableSchema.fields.find(_.name == c).flatMap { f =>
        f.dataType match {
          case LongType | IntegerType | TimestampNTZType | DateType |
               DoubleType | FloatType => Some(f.dataType)
          // decimal zone maps hold unscaled longs, whose order IS the
          // decimal order at the column's fixed scale — MIN/MAX exact
          case d: DecimalType => Some(d)
          // string MIN/MAX: sound only when (a) the column is
          // non-nullable ("" null placeholders would pollute the chunk
          // mins) and (b) EVERY chunk of every committed manifest
          // recorded an all-ASCII range — where Java, UTF8String, and
          // DuckDB collation provably agree. Anything else stays in
          // Spark.
          case StringType if !f.nullable &&
              committedForStats.exists(_.forall(m =>
                // zero-row tombstones (delete) contribute no values
                m.schemaMarker || m.rows == 0 ||
                  (m.hasChunkIndex && m.env.strRanges
                    .contains(storedNameIn(m, c))))) =>
            Some(StringType)
          case _ => None
        }
      }
    def countable(c: String): Option[CountAgg] =
      tableSchema.fields.find(_.name == c).flatMap { f =>
        if (!f.nullable) Some(CountAgg(c, nullable = false))
        else committedForStats.filter(_.forall(m =>
          m.schemaMarker || m.rows == 0 ||
          // a manifest that PREDATES the column (add-only evolution)
          // is all-NULL for it — provable by POSITION (names are labels;
          // the FULL chain keeps dropped positions in the count)
          (m.schemaCols.nonEmpty &&
            chainNames.indexOf(c) >= m.schemaCols.size) ||
            (m.hasChunkIndex && m.env.nullCounts
              .contains(storedNameIn(m, c)))))
          .map(_ => CountAgg(c, nullable = true))
      }
    val specs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(CountStarAgg)
      case m: Min => fieldName(m.column)
        .flatMap(c => pushableType(c).map(MinAgg(c, _)))
      case m: Max => fieldName(m.column)
        .flatMap(c => pushableType(c).map(MaxAgg(c, _)))
      case c: Count if !c.isDistinct => fieldName(c.column).flatMap(countable)
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
    // row counts; prefer a FIXED-WIDTH column (cheapest decode), then a
    // string, and only then binary/float-array — the heaviest blocks to
    // decode just for counting rows
    required =
      if (requiredSchema.isEmpty) {
        def weight(dt: DataType): Int = dt match {
          case LongType | IntegerType | TimestampNTZType | DateType |
               DoubleType | FloatType | BooleanType | _: DecimalType => 0
          case StringType => 1
          case _ => 2 // binary / float-array
        }
        StructType(Seq(tableSchema.fields.minBy(f => weight(f.dataType))))
      }
      else requiredSchema

  private val decScale = GraftDataSource.decScaleOf(tableSchema)
  private val boolCols = GraftDataSource.boolColsOf(tableSchema)
  private val f32Cols = GraftDataSource.f32ColsOf(tableSchema)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // decimal/boolean/float predicates are first rewritten to their
    // PHYSICAL constants (unscaled long / 0-1 int / sortable int), then
    // the existing long/int pushdown machinery admits them untouched; a
    // filter whose translated form is unpushable stays residual in its
    // ORIGINAL form
    val translated =
      GraftDataSource.translateFilters(filters, decScale, boolCols, f32Cols)
    val paired = filters.zip(translated)
    pushed = paired.collect { case (_, t) if
      GraftDataSource.pushable(t, longCols, strCols, intCols, dblCols, fltCols) => t }
    paired.collect { case (o, t) if
      !GraftDataSource.pushable(t, longCols, strCols, intCols, dblCols, fltCols) => o }
    // fully enforced below: chunk zone-map skip + row-level check
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val confKv = ContainerIO.confSnapshot(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val maxSplit = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(GraftDataSource.DefaultMaxSplitBytes)
    val verify = Option(options.get("verifyContent")).forall(_.toBoolean)
    aggs match {
      case Some(specs) => new GraftAggScan(path, specs, confKv, pinned,
        chainNames)
      case None => new GraftScan(path, required, pushed, confKv, limit,
        maxSplit, verify, longCols, strCols, intCols, dblCols, fltCols,
        pinned, chainNames)
    }
  }
}

/** Completely-pushed aggregate scan: the answer comes from the manifest
  * index (exact row counts and per-partition zone maps), so the query
  * never opens a container. Emits exactly one row.
  */
class GraftAggScan(path: String, specs: Seq[GraftAgg],
                   confKv: Map[String, String],
                   asOf: Option[Long] = None,
                   tableCols: Seq[String] = Nil) extends Scan with Batch {
  override def readSchema(): StructType = StructType(specs.map {
    case CountStarAgg => StructField("count_star", LongType, nullable = false)
    case MinAgg(c, dt) => StructField(s"min_$c", dt, nullable = true)
    case MaxAgg(c, dt) => StructField(s"max_$c", dt, nullable = true)
    case CountAgg(c, _) => StructField(s"count_$c", LongType, nullable = false)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft $path, PushedAggregates: [${specs.mkString(", ")}] (manifest-answered)"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = ContainerIO.confFrom(confKv)
    var rows = 0L
    var mins = Map.empty[String, Long]
    var maxs = Map.empty[String, Long]
    // COUNT(col) accumulators: rows minus the chunk null counts. A
    // non-nullable CountAgg never reads counts (zero by schema proof); a
    // nullable one was admitted only after translate() verified every
    // committed manifest carries entries, so getOrElse(0) here can only
    // fire on a manifest appended SINCE planning — written by this
    // library, which always records entries for nullable columns.
    val countCols = specs.collect { case CountAgg(c, n) => (c, n) }
    var nonNull = Map.empty[String, Long]
    // string MIN/MAX fold the per-chunk all-ASCII ranges (translate()
    // admitted the pushdown only after proving every chunk carries one)
    val strAggCols = specs.collect {
      case MinAgg(c, StringType) => c
      case MaxAgg(c, StringType) => c
    }.toSet
    var sMins = Map.empty[String, String]
    var sMaxs = Map.empty[String, String]
    // a pinned (time-travel) read folds an immutable snapshot — the
    // concurrent-append race guards below can never fire for it
    asOf.fold(Manifests.readCommitted(conf, path))(
      Manifests.readCommittedAt(conf, path, _))
      .filterNot(_.schemaMarker).foreach { m =>
      rows += m.rows
      // rename support: this container's stats are keyed by its stored
      // (historical) labels; fold them under the CURRENT names
      val toStored = GraftDataSource.storedNamesOf(m, tableCols)
      val toCur = toStored.map(_.swap)
      def stored(c: String): String = toStored.getOrElse(c, c)
      // a container PREDATES a column iff the column's table POSITION
      // is past the container's width (names are labels, not identity)
      def predates(c: String): Boolean = m.schemaCols.nonEmpty && {
        if (tableCols.isEmpty) !m.schemaCols.exists(_._1 == c)
        else tableCols.indexOf(c) >= m.schemaCols.size
      }
      m.longRanges.foreach { case (c0, (lo, hi)) =>
        val c = toCur.getOrElse(c0, c0)
        mins = mins.updated(c, mins.get(c).fold(lo)(math.min(_, lo)))
        maxs = maxs.updated(c, maxs.get(c).fold(hi)(math.max(_, hi)))
      }
      countCols.foreach { case (c, nullable) =>
        val nulls =
          if (!nullable) 0L
          else if (predates(c))
            m.rows // container predates the column: all-NULL for it
          // translate() proved every committed manifest carries entries —
          // but this is a FRESH read, and a manifest appended since
          // planning could legally lack one (a non-current writer).
          // Silently treating it as zero nulls would OVERCOUNT: fail
          // retriable-loud, mirroring the string MIN/MAX guard below.
          else m.env.nullCounts.getOrElse(stored(c),
            if (m.rows == 0) 0L
            else throw new IllegalStateException(
              s"graft COUNT snapshot changed: column '$c' gained a " +
                s"manifest without null counts since planning (concurrent " +
                s"append to $path); retry the query"))
        nonNull = nonNull.updated(c, nonNull.getOrElse(c, 0L) + m.rows - nulls)
      }
      // translate() proved every committed container's envelope carries
      // a range for these columns — but this is a FRESH manifest read,
      // and an append landing between planning and here can legally add
      // a non-ASCII container with no range. Silently excluding its
      // values would be a wrong MIN/MAX: fail retriable-loud instead
      // (the re-planned query sees the new container and keeps the
      // aggregate in Spark).
      if (strAggCols.nonEmpty && m.rows > 0) strAggCols.foreach { c =>
        m.env.strRanges.get(stored(c)) match {
          case None => throw new IllegalStateException(
            s"graft string aggregate snapshot changed: column '$c' gained " +
              s"a container without an ASCII range since planning " +
              s"(concurrent append to $path); retry the query")
          case Some((lo, hi)) =>
            sMins = sMins.updated(c,
              sMins.get(c).filter(_.compareTo(lo) <= 0).getOrElse(lo))
            sMaxs = sMaxs.updated(c,
              sMaxs.get(c).filter(_.compareTo(hi) >= 0).getOrElse(hi))
        }
      }
    }
    // double zone maps store the order-preserving sortable-long mapping;
    // surface the aggregate back as the double it encodes
    def surface(v: Long, dt: DataType): Any =
      if (GraftAgg.narrow(dt)) java.lang.Integer.valueOf(v.toInt)
      else if (dt == DoubleType)
        java.lang.Double.valueOf(graft.codecs.DoubleBits.fromSortableLong(v))
      else if (dt == FloatType)
        // kind-10 zone maps carry the widened sortable ints
        java.lang.Float.valueOf(graft.codecs.FloatBits.fromSortableInt(v.toInt))
      else dt match {
        case d: DecimalType =>
          org.apache.spark.sql.types.Decimal.createUnsafe(v, d.precision, d.scale)
        case _ => java.lang.Long.valueOf(v)
      }
    val values: Array[Any] = specs.map {
      case CountStarAgg => java.lang.Long.valueOf(rows)
      case MinAgg(c, StringType) => sMins.get(c).orNull
      case MaxAgg(c, StringType) => sMaxs.get(c).orNull
      case MinAgg(c, dt) => mins.get(c).map(surface(_, dt)).orNull
      case MaxAgg(c, dt) => maxs.get(c).map(surface(_, dt)).orNull
      case CountAgg(c, _) => java.lang.Long.valueOf(nonNull.getOrElse(c, 0L))
    }.toArray
    Array(GraftAggPartition(values.map {
      case null => null
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.longValue()
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.floatValue()
      case dec: org.apache.spark.sql.types.Decimal => dec
      case s: String => s
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
                case n: Int => row.setInt(i, n)
                case d: Double => row.setDouble(i, d)
                case f: Float => row.setFloat(i, f)
                case s: String => row.update(i, UTF8String.fromString(s))
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

/** One chunk's read plan: byte range + expected block CRCs. */
case class ChunkSpec(offset: Long, length: Long, rows: Int,
                     crcs: Map[String, Long])

/** A run of chunks from one container. Empty `chunks` = stream the whole
  * file sequentially (legacy manifests without a chunk index, and the
  * direct-reader fuzz surface). `digestCol` is the manifest's recorded
  * digest column ("" = chunk digests not verifiable for this partition).
  * `absentCols` (round 7, add-only schema evolution): needed columns the
  * container predates — the reader surfaces them as NULL for every row
  * (planning already skipped containers a non-IsNull filter on such a
  * column would empty).
  */
case class GraftInputPartition(file: String, chunks: Seq[ChunkSpec],
                               digestCol: String = "content",
                               absentCols: Set[String] = Set.empty,
                               renames: Map[String, String] = Map.empty)
    extends InputPartition

class GraftScan(path: String, required: StructType,
                initialFilters: Array[Filter],
                confKv: Map[String, String], limit: Int = Int.MaxValue,
                maxSplitBytes: Long = GraftDataSource.DefaultMaxSplitBytes,
                verifyContent: Boolean = true,
                longCols: Set[String] = GraftDataSource.longCols,
                strCols: Set[String] = GraftDataSource.strCols,
                intCols: Set[String] = Set.empty,
                dblCols: Set[String] = Set.empty,
                fltCols: Set[String] = Set.empty,
                asOf: Option[Long] = None,
                tableCols: Seq[String] = Nil)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Compile-time pushed filters plus any runtime filters accepted in
    * [[filter]]; both chunk admission and the row-level re-check use the
    * combined set.
    */
  private var filters: Array[Filter] = initialFilters

  /** Runtime (DPP-style) filtering: a broadcast join's build-side keys
    * arrive as an `In` filter before `planInputPartitions`, so a
    * dim-filtered join decodes only the chunks whose zone maps/dicts can
    * hold matching keys — the dynamic-partition-pruning shape, at chunk
    * granularity.
    */
  override def filterAttributes(): Array[NamedReference] =
    // only the scan's OUTPUT columns — Spark resolves these against the
    // pruned schema, and any of them can drive chunk admission
    required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(runtime: Array[Filter]): Unit = {
    // runtime (DPP) filters on decimal/boolean keys arrive in LOGICAL
    // form — translate to physical constants like the builder did
    val accepted = GraftDataSource.translateFilters(runtime,
      GraftDataSource.decScaleOf(required), GraftDataSource.boolColsOf(required),
      GraftDataSource.f32ColsOf(required))
      .filter(GraftDataSource.pushable(_, longCols, strCols, intCols,
        dblCols, fltCols))
    filters = filters ++ accepted
  }

  /** Parsed committed manifests, read ONCE per scan: statistics,
    * runtime-filter admission, and input-partition planning all reuse
    * this snapshot (filters only affect chunk admission, never the
    * manifest set) — at 10^5 partitions the index parse is the driver
    * cost worth not paying three times per query.
    */
  private lazy val committedSnapshot: Seq[ParsedManifest] = {
    val conf = ContainerIO.confFrom(confKv)
    asOf.fold(Manifests.readCommitted(conf, path))(
      Manifests.readCommittedAt(conf, path, _))
      .filter(_.rows > 0)
  }

  private def committed(): Seq[ParsedManifest] = committedSnapshot

  /** Per-scan hydration cache (two-level metadata): an index-elided
    * manifest's chunk detail is read from its commit marker AT MOST
    * once per scan, and only for containers the summary-level admission
    * let through — the planning cost scales with admitted containers,
    * never with table size.
    */
  private val hydrated =
    new java.util.concurrent.ConcurrentHashMap[String, ParsedManifest]()
  private def hydrate(m: ParsedManifest): ParsedManifest =
    if (!m.chunksElided) m
    else hydrated.computeIfAbsent(m.name, _ =>
      Manifests.loadChunkIndex(ContainerIO.confFrom(confKv), path, m))

  /** Manifest-derived table statistics, so Catalyst/AQE can size joins
    * (e.g. auto-broadcast a small graft table) without scanning it.
    * Conservative: raw (decoded) bytes, prorated over ADMITTED chunks —
    * zone-map skipping shrinks the estimate with the filters.
    */
  override def estimateStatistics(): Statistics = {
    var rows = 0L
    var bytes = 0L
    var any = false
    committed().filterNot(_.schemaMarker).foreach { m =>
      // index-elided manifests estimate at SUMMARY granularity (whole
      // container in or out) rather than paying a chunk-detail read per
      // container just for statistics — a conservative overestimate
      // under selective filters, refined to chunk granularity by the
      // actual planning that follows. Filters translate to the
      // container's stored names (rename support); containerFilters
      // also drops IsNull on columns the container predates and zeroes
      // containers a value filter on such a column can't match.
      val admittedRows =
        GraftDataSource.containerFilters(m, filters.toSeq, tableCols,
            tableCols) match {
          case None => 0L
          case Some(mFilters) =>
            if (m.chunksElided)
              if (GraftDataSource.admitManifest(m, mFilters)) m.rows else 0L
            else if (m.chunkIndex.nonEmpty)
              m.chunkIndex.filter(GraftDataSource.admitChunk(_, mFilters))
                .map(_.rows.toLong).sum
            else if (GraftDataSource.admit(m.longRanges, mFilters)) m.rows
            else 0L
        }
      if (admittedRows > 0) {
        rows += admittedRows
        bytes += (m.rawBytes.toDouble * admittedRows / math.max(m.rows, 1L)).toLong
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

  /** Chunk-granular splits: admitted chunks of each committed container
    * grouped into runs of ≤ maxSplitBytes — a single giant container
    * parallelizes across tasks, and a selective filter decodes only the
    * chunks its zone maps/dicts admit. Containers without a manifest are
    * ORPHANS of failed writes and are never planned (the manifest is the
    * commit marker on the read side too).
    */
  override def planInputPartitions(): Array[InputPartition] =
    GraftDataSource.planPartitions(path, committed(), filters, maxSplitBytes,
      required.fieldNames.toSet ++ filters.flatMap(_.references), hydrate,
      tableCols)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, filters, confKv, limit, verifyContent,
      longCols, strCols, intCols, dblCols, fltCols)

  /** `readStream.format("graft")` — micro-batch TAILING of this table:
    * each trigger reads exactly the manifests committed since the last
    * processed offset ([[GraftMicroBatchStream]]), with the same pushed
    * filters, pruned columns, chunk admission, and verified readers as
    * a batch scan.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(asOf.isEmpty,
      "graft time travel (versionAsOf/timestampAsOf) is batch-only; a " +
        "stream tails the live table")
    new GraftMicroBatchStream(path, checkpointLocation, required, filters,
      confKv, maxSplitBytes, verifyContent, longCols, strCols, intCols,
      dblCols, fltCols, tableCols)
  }
}

class GraftReaderFactory(required: StructType, filters: Array[Filter],
                         confKv: Map[String, String], limit: Int,
                         verifyContent: Boolean,
                         longCols: Set[String] = GraftDataSource.longCols,
                         strCols: Set[String] = GraftDataSource.strCols,
                         intCols: Set[String] = Set.empty,
                         dblCols: Set[String] = Set.empty,
                         fltCols: Set[String] = Set.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new GraftPartitionReader(p.file, p.chunks, required, filters, confKv,
      limit, verifyContent, longCols, strCols, p.digestCol, intCols, dblCols,
      fltCols, p.absentCols, p.renames)
  }

  /** The decoded data is already columnar (`Array[Long]`/`Array[String]`
    * per block) — hand Spark `ColumnarBatch`es instead of materializing a
    * `GenericInternalRow` per row; `ColumnarToRow` (codegen'd) or
    * downstream columnar operators take it from there.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    // ARRAY<FLOAT> needs a child vector per batch — the row reader's
    // primitive-array path is simpler and the embedding consumers
    // (ANN/dedup) immediately explode into scalar math anyway
    !required.fields.exists(_.dataType.isInstanceOf[ArrayType])

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new GraftColumnarReader(p.file, p.chunks, required, filters, confKv,
      limit, verifyContent, longCols, strCols, p.digestCol, intCols, dblCols,
      fltCols, p.absentCols, p.renames)
  }
}

/** Shared streaming chunk iteration for the row and columnar readers:
  * per chunk, needed column blocks are read (bounded by one block at a
  * time) and decoded, non-needed blocks are position advances; reads
  * that decode `content` verify the chunk digest.
  */
private[sources] final class ChunkCursor(
    file: String, chunks: Seq[ChunkSpec], required: StructType,
    filters: Array[Filter], confKv: Map[String, String],
    verifyContent: Boolean,
    longCols: Set[String] = GraftDataSource.longCols,
    strCols: Set[String] = GraftDataSource.strCols,
    digestCol: String = "content",
    intCols: Set[String] = Set.empty,
    dblCols: Set[String] = Set.empty,
    fltCols: Set[String] = Set.empty,
    renames: Map[String, String] = Map.empty) {

  private val filterCols: Set[String] = filters.toSeq.flatMap(_.references).toSet
  // rename support: the query works in CURRENT names, this container's
  // blocks are keyed by its stored names — request stored, then re-key
  // each decoded chunk back to current before anything row-level runs
  @inline private def st(c: String): String = renames.getOrElse(c, c)
  val neededLongs: Set[String] =
    (required.fieldNames.toSet ++ filterCols).intersect(longCols).map(st)
  val neededStrs: Set[String] =
    (required.fieldNames.toSet ++ filterCols).intersect(strCols).map(st)
  val neededInts: Set[String] =
    (required.fieldNames.toSet ++ filterCols).intersect(intCols).map(st)
  val neededDbls: Set[String] =
    (required.fieldNames.toSet ++ filterCols).intersect(dblCols).map(st)
  val neededFlts: Set[String] =
    (required.fieldNames.toSet ++ filterCols).intersect(fltCols).map(st)
  private val verify =
    verifyContent && digestCol.nonEmpty && neededStrs.contains(st(digestCol))

  /** Re-key a decoded chunk's column maps stored -> current. Two-phase
    * (remove all, then insert) so a SWAP rename (a<->b across two
    * renames) can't clobber one side mid-move.
    */
  private def rekey(c: DecodedChunk): DecodedChunk = {
    def fix[T](m: java.util.HashMap[String, T]): Unit = {
      val moved = new java.util.HashMap[String, T]()
      renames.foreach { case (cur, stored) =>
        if (cur != stored) {
          val v = m.remove(stored)
          if (v != null) moved.put(cur, v)
        }
      }
      m.putAll(moved)
    }
    fix(c.longs); fix(c.strs); fix(c.ints); fix(c.doubles); fix(c.nulls)
    fix(c.flts)
    c
  }

  private val conf = ContainerIO.confFrom(confKv)
  private val hPath = new org.apache.hadoop.fs.Path(file)
  private val fs = ContainerIO.fs(file, conf)

  /** A scan planned from a prior index snapshot can race an overwrite,
    * epoch replay, or compaction that deletes the old generation's block
    * files after its new snapshot goes live. That is a CONTROLLED
    * condition — the table is fine, this reader's snapshot is stale —
    * so it must surface as a retriable snapshot-superseded error, never
    * a raw FileNotFoundException (every other corruption path here is
    * require-guarded the same way).
    */
  private def snapshotSuperseded(): Nothing =
    throw new IllegalStateException(
      s"graft snapshot superseded: $file was removed by a concurrent " +
        "overwrite/compaction after this scan was planned — re-run the query")

  private val fileLen =
    try fs.getFileStatus(hPath).getLen
    catch { case _: java.io.FileNotFoundException => snapshotSuperseded() }
  private val in =
    try fs.open(hPath)
    catch { case _: java.io.FileNotFoundException => snapshotSuperseded() }

  val chunkIter: Iterator[DecodedChunk] = {
    val raw0 =
      if (chunks.nonEmpty) chunks.iterator.map { cs =>
        require(cs.offset >= 0 && cs.length >= 0 && cs.offset + cs.length <= fileLen,
          s"chunk range [${cs.offset}, +${cs.length}) overruns $file ($fileLen bytes)")
        val ci = new ContainerInput(in, cs.offset, cs.offset + cs.length)
        val chunk = ContainerFormat.readChunk(ci, neededLongs, neededStrs,
          cs.crcs, neededInts, neededDbls, neededFlts)
        require(ci.atEnd, s"chunk at ${cs.offset} shorter than its indexed length")
        require(chunk.rows == cs.rows, s"chunk at ${cs.offset} row count mismatch")
        chunk
      } else {
        val ci = new ContainerInput(in, 0L, fileLen)
        ContainerFormat.readPrelude(ci)
        new Iterator[DecodedChunk] {
          override def hasNext: Boolean = !ci.atEnd
          override def next(): DecodedChunk =
            ContainerFormat.readChunk(ci, neededLongs, neededStrs,
              Map.empty, neededInts, neededDbls, neededFlts)
        }
      }
    val raw = if (renames.isEmpty) raw0 else raw0.map(rekey)
    if (!verify) raw
    else raw.map { c => ContainerFormat.verifyContentDigest(c, digestCol); c }
  }

  def close(): Unit = in.close()
}

/** Vectorized reader: one `ColumnarBatch` per (filtered) chunk, filled
  * straight from the decoded column arrays.
  */
class GraftColumnarReader(file: String, chunks: Seq[ChunkSpec],
                          required: StructType, filters: Array[Filter],
                          confKv: Map[String, String],
                          limit: Int, verifyContent: Boolean,
                          longCols: Set[String] = GraftDataSource.longCols,
                          strCols: Set[String] = GraftDataSource.strCols,
                          digestCol: String = "content",
                          intCols: Set[String] = Set.empty,
                          dblCols: Set[String] = Set.empty,
                          fltCols: Set[String] = Set.empty,
                          absentCols: Set[String] = Set.empty,
                          renames: Map[String, String] = Map.empty)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  // schema evolution: this container predates `absentCols` — their rows
  // are all-NULL here. IsNull on them is trivially true (dropped from
  // the compiled predicates); planning skipped containers any other
  // filter on them would empty; the cursor must not request their blocks.
  private val effFilters = GraftDataSource.effectiveFilters(filters, absentCols)
  private val cursor = new ChunkCursor(file, chunks, required, effFilters,
    confKv, verifyContent, longCols -- absentCols, strCols -- absentCols,
    digestCol, intCols -- absentCols, dblCols -- absentCols,
    fltCols -- absentCols, renames)
  private val preds = GraftDataSource.compileFilters(effFilters, longCols)
  private val fields = required.fields
  private val fieldAbsent: Array[Boolean] =
    required.fields.map(f => absentCols.contains(f.name))
  private var batch: ColumnarBatch = _
  private var emitted = 0

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    while (emitted < limit && cursor.chunkIter.hasNext) {
      val chunk = cursor.chunkIter.next()
      // selection vector: row indices surviving the pushed filters
      val sel = new Array[Int](chunk.rows)
      var m = 0
      var j = 0
      while (j < chunk.rows && emitted + m < limit) {
        if (GraftDataSource.rowPasses(preds, chunk, j)) {
          sel(m) = j; m += 1
        }
        j += 1
      }
      if (m > 0) {
        val vecs = new Array[ColumnVector](fields.length)
        var i = 0
        while (i < fields.length) {
          val name = fields(i).name
          val v = new OnHeapColumnVector(m, fields(i).dataType)
          // per-chunk validity bitmap (nullable columns only); selected
          // NULL rows become vector nulls, their placeholder values are
          // never surfaced
          val nullBm = chunk.nulls.get(name)
          @inline def isNullRow(r: Int): Boolean =
            nullBm != null && (nullBm(r >> 3) & (1 << (r & 7))) != 0
          if (fieldAbsent(i)) v.putNulls(0, m)
          else fields(i).dataType match {
            case LongType | TimestampNTZType =>
              val src = chunk.longs.get(name)
              var k = 0
              while (k < m) {
                val r = sel(k)
                if (isNullRow(r)) v.putNull(k) else v.putLong(k, src(r))
                k += 1
              }
            case IntegerType | DateType =>
              val src = chunk.ints.get(name)
              var k = 0
              while (k < m) {
                val r = sel(k)
                if (isNullRow(r)) v.putNull(k) else v.putInt(k, src(r))
                k += 1
              }
            case DoubleType =>
              val src = chunk.doubles.get(name)
              var k = 0
              while (k < m) {
                val r = sel(k)
                if (isNullRow(r)) v.putNull(k) else v.putDouble(k, src(r))
                k += 1
              }
            case d: DecimalType =>
              // p <= 18: the vector's decimal storage is the unscaled
              // long — exactly what the chunk holds
              val src = chunk.longs.get(name)
              var k = 0
              while (k < m) {
                val r = sel(k)
                if (isNullRow(r)) v.putNull(k)
                else v.putDecimal(k, org.apache.spark.sql.types.Decimal
                  .createUnsafe(src(r), d.precision, d.scale), d.precision)
                k += 1
              }
            case BooleanType =>
              val src = chunk.ints.get(name)
              var k = 0
              while (k < m) {
                val r = sel(k)
                if (isNullRow(r)) v.putNull(k)
                else v.putBoolean(k, src(r) != 0)
                k += 1
              }
            case FloatType =>
              // kind 10: sortable-int bits in the narrow lane
              val src = chunk.ints.get(name)
              var k = 0
              while (k < m) {
                val r = sel(k)
                if (isNullRow(r)) v.putNull(k)
                else v.putFloat(k, graft.codecs.FloatBits.fromSortableInt(src(r)))
                k += 1
              }
            case _ =>
              // straight from the decoded UTF-8 slices: no String
              // materialization, no re-encode
              val u = chunk.strs.get(name)
              var k = 0
              while (k < m) {
                val r = sel(k)
                if (isNullRow(r)) v.putNull(k)
                else v.putByteArray(k, u.pool, u.offsets(r), u.lens(r))
                k += 1
              }
          }
          vecs(i) = v
          i += 1
        }
        emitted += m
        batch = new ColumnarBatch(vecs, m)
        return true
      }
    }
    false
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
  override def close(): Unit = {
    if (batch != null) { batch.close(); batch = null }
    cursor.close()
  }
}

/** Streaming reader over one partition's chunk ranges: per chunk, needed
  * column blocks are read (bounded by one block at a time) and decoded,
  * non-needed blocks are position advances. Pushed filters are re-checked
  * per row; reads that decode `content` verify the chunk digest.
  */
class GraftPartitionReader(file: String, chunks: Seq[ChunkSpec],
                           required: StructType, filters: Array[Filter],
                           confKv: Map[String, String],
                           limit: Int, verifyContent: Boolean,
                           longCols: Set[String] = GraftDataSource.longCols,
                           strCols: Set[String] = GraftDataSource.strCols,
                           digestCol: String = "content",
                           intCols: Set[String] = Set.empty,
                           dblCols: Set[String] = Set.empty,
                           fltCols: Set[String] = Set.empty,
                           absentCols: Set[String] = Set.empty,
                           renames: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {

  /** Sequential whole-file stream (legacy tables; fuzz surface). */
  def this(file: String, required: StructType, filters: Array[Filter],
           confKv: Map[String, String]) =
    this(file, Nil, required, filters, confKv, Int.MaxValue, false)

  // schema evolution: see GraftColumnarReader — absent columns are
  // all-NULL in this container and their blocks are never requested
  private val effFilters = GraftDataSource.effectiveFilters(filters, absentCols)
  private val cursor = new ChunkCursor(file, chunks, required, effFilters,
    confKv, verifyContent, longCols -- absentCols, strCols -- absentCols,
    digestCol, intCols -- absentCols, dblCols -- absentCols,
    fltCols -- absentCols, renames)
  private val preds = GraftDataSource.compileFilters(effFilters, longCols)

  private val fields = required.fields
  private val fieldAbsent: Array[Boolean] =
    required.fields.map(f => absentCols.contains(f.name))
  private val it: Iterator[InternalRow] = cursor.chunkIter.flatMap { chunk =>
    (0 until chunk.rows).iterator.flatMap { j =>
      if (!GraftDataSource.rowPasses(preds, chunk, j)) None
      else {
        val row = new GenericInternalRow(fields.length)
        var i = 0
        while (i < fields.length) {
          val name = fields(i).name
          if (fieldAbsent(i) || !chunk.validAt(name, j)) row.setNullAt(i)
          else fields(i).dataType match {
            case LongType | TimestampNTZType =>
              row.setLong(i, chunk.longs.get(name)(j))
            case IntegerType | DateType =>
              row.setInt(i, chunk.ints.get(name)(j))
            case DoubleType =>
              row.setDouble(i, chunk.doubles.get(name)(j))
            case d: DecimalType =>
              row.update(i, org.apache.spark.sql.types.Decimal.createUnsafe(
                chunk.longs.get(name)(j), d.precision, d.scale))
            case BooleanType =>
              row.setBoolean(i, chunk.ints.get(name)(j) != 0)
            case FloatType =>
              row.setFloat(i, graft.codecs.FloatBits.fromSortableInt(
                chunk.ints.get(name)(j)))
            case BinaryType =>
              // InternalRow owns its binary — copy the slice out
              val u = chunk.strs.get(name)
              row.update(i, java.util.Arrays.copyOfRange(
                u.pool, u.offsets(j), u.offsets(j) + u.lens(j)))
            case _: ArrayType =>
              row.update(i,
                org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
                  .fromPrimitiveArray(chunk.flts.get(name).slice(j)))
            case _ =>
              // zero-copy view over the decoded UTF-8 slice
              val u = chunk.strs.get(name)
              row.update(i, UTF8String.fromBytes(u.pool, u.offsets(j), u.lens(j)))
          }
          i += 1
        }
        Some(row: InternalRow)
      }
    }
  }

  private var cur: InternalRow = _
  private var emitted = 0

  override def next(): Boolean =
    if (emitted < limit && it.hasNext) { cur = it.next(); emitted += 1; true }
    else false
  override def get(): InternalRow = cur
  override def close(): Unit = cursor.close()
}

// -------------------------------------------------------------- streaming read

/** Streaming offset = a monotone BATCH id, O(1) no matter how long the
  * tail runs. The manifest names each batch covers live in the source's
  * own seen-log under the checkpoint (`FileStreamSource`'s shape — the
  * first cut serialized the full cumulative name set into every offset,
  * which grows without bound over the life of a query).
  */
case class GraftStreamOffset(batch: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"batch":$batch}"""
}

object GraftStreamOffset {
  def parse(json: String): GraftStreamOffset = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    if (root.isArray) // the short-lived pre-release name-set format
      throw new IllegalArgumentException(
        "this checkpoint holds a pre-release graft stream offset " +
          "(manifest-name array); restart the query with a fresh " +
          "checkpoint location")
    val b = root.get("batch")
    require(b != null && b.canConvertToLong, s"bad graft stream offset: $json")
    GraftStreamOffset(b.asLong())
  }
}

/** Micro-batch tailing of a graft table. Every time `latestOffset` sees
  * committed manifests it has not logged yet, it assigns them the next
  * batch id and persists that name list as
  * `<checkpoint>/graft-seen/<batch>.json` BEFORE returning the offset —
  * so `planInputPartitions(start, end)` (including replays after a
  * restart) resolves any (start, end] range from the durable log, while
  * the offsets Spark checkpoints stay O(1). Batches plan chunk-granular
  * with the scan's pushed filters and pruned columns. Append-mostly
  * semantics: an epoch REPLAY or an overwrite re-commits new names,
  * which the tail emits as new data (the `FileStreamSource` contract on
  * rewrites).
  *
  * Log GC (round 6): per-batch entries at or below a COMMITTED offset
  * are only needed for their seen-set names (Spark never replays below
  * its committed offset), so `commit(end)` folds them into one
  * `<end>.compact.json` once [[GraftMicroBatchStream.CompactInterval]]
  * of them accumulate and deletes the per-batch files — the
  * `FileStreamSource` compaction shape. The log under the checkpoint
  * stays bounded by the interval plus one compact file (whose size
  * grows with the table's total manifest history, as
  * FileStreamSource's does).
  */
class GraftMicroBatchStream(path: String, checkpointLocation: String,
                            required: StructType,
                            filters: Array[Filter],
                            confKv: Map[String, String],
                            maxSplitBytes: Long, verifyContent: Boolean,
                            longCols: Set[String], strCols: Set[String],
                            intCols: Set[String],
                            dblCols: Set[String] = Set.empty,
                            fltCols: Set[String] = Set.empty,
                            tableCols: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val conf = ContainerIO.confFrom(confKv)
  private val logDir = s"$checkpointLocation/graft-seen"
  private val LogName = """(\d+)\.json""".r
  private val CompactName = """(\d+)\.compact\.json""".r
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // batch id -> the manifest names that batch covers (mirror of the
  // on-disk log; loaded lazily, appended as latestOffset assigns).
  // Batches folded into a compact file live in (compactedThrough,
  // compactedNames) instead: their names still count as seen, but they
  // are no longer per-batch resolvable (Spark never replays them).
  private val seenLog = scala.collection.mutable.Map.empty[Long, Seq[String]]
  private var compactedThrough: Long = -1L
  private var compactedNames: Set[String] = Set.empty

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def readNames(file: String): Seq[String] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new String(ContainerIO.readAll(conf, file),
      java.nio.charset.StandardCharsets.UTF_8))
    require(root.isArray, s"corrupt graft stream seen-log entry $file")
    root.elements().asScala.map(_.asText()).toSeq
  }

  private def refreshLog(): Unit = {
    val names = ContainerIO.listNames(conf, logDir)
    // highest compact file wins; per-batch entries it folded are gone
    names.collect { case n @ CompactName(b) => (b.toLong, n) }
      .sortBy(_._1).lastOption.foreach { case (b, n) =>
        if (b > compactedThrough) {
          compactedNames = readNames(s"$logDir/$n").toSet
          compactedThrough = b
          seenLog.filterInPlace { case (id, _) => id > b }
        }
      }
    names.foreach {
      case n @ LogName(b) =>
        val id = b.toLong
        if (id > compactedThrough && !seenLog.contains(id))
          seenLog(id) = readNames(s"$logDir/$n")
      case _ => ()
    }
  }

  // one manifest-index read+parse per trigger: latestOffset refreshes,
  // the same trigger's planInputPartitions reuses (replaced manifests
  // since the refresh just stop resolving — same semantics as a fresh
  // read); a restart-replay with no prior latestOffset reads directly
  @volatile private var lastCommitted: Seq[ParsedManifest] = null

  private def committed(): Seq[ParsedManifest] = {
    val ms = Manifests.readCommitted(conf, path).filter(_.rows > 0)
    lastCommitted = ms
    ms
  }

  override def initialOffset(): Offset = GraftStreamOffset(-1L)

  private def maxBatch: Long =
    if (seenLog.isEmpty) compactedThrough else seenLog.keys.max

  override def latestOffset(): Offset = {
    refreshLog()
    val seenAll = compactedNames ++ seenLog.values.flatten
    val fresh = committed().map(_.name).filterNot(seenAll).sorted
    if (fresh.isEmpty) GraftStreamOffset(maxBatch)
    else {
      val next = maxBatch + 1
      ContainerIO.mkdirs(conf, logDir)
      val body = fresh.map(q).mkString("[", ",", "]")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (ContainerIO.createExclusive(conf, s"$logDir/$next.json", body))
        seenLog(next) = fresh
      else refreshLog() // lost a (restart) race; the log has the truth
      GraftStreamOffset(maxBatch)
    }
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].batch
    val e = end.asInstanceOf[GraftStreamOffset].batch
    refreshLog()
    // a replayed range whose seen-log entries are GONE (checkpoint
    // restored without graft-seen/, deleted log files) must FAIL, not
    // silently commit an empty batch and skip those rows forever. A
    // batch at or below compactedThrough was folded by commit(), which
    // only ever runs on COMMITTED offsets Spark will not replay — if it
    // shows up anyway, the checkpoint and the log disagree: fail.
    (s + 1) to e foreach { b =>
      require(b > compactedThrough,
        s"graft stream batch $b was compacted below the committed " +
          s"offset under $logDir; a replay of offsets ($s, $e] should " +
          "be impossible — the checkpoint and seen-log disagree")
      require(seenLog.contains(b),
        s"graft stream seen-log entry for batch $b is missing under " +
          s"$logDir — the checkpoint is incomplete; cannot replay " +
          s"offsets ($s, $e] without it")
    }
    val want = seenLog.collect {
      case (b, names) if b > s && b <= e => names
    }.flatten.toSet
    // logged-but-since-replaced names (epoch replay, truncate) simply no
    // longer resolve; their replacements arrive as a later batch
    val ms = Option(lastCommitted).getOrElse(committed())
    val fresh = ms.filter(m => want.contains(m.name))
    val unresolved = want -- fresh.map(_.name)
    // SUBSTITUTION across compaction (round 7): a logged container that
    // GraftMaintenance.compact folded away has a live compacted
    // generation whose `ancestors` record exactly the consumed EPOCHS.
    // Substituting it keeps the replay exactly-once iff EVERY epoch the
    // candidate folded belongs to this replay range (compaction consumes
    // whole epochs, so coverage is all-or-nothing per epoch; an ancestor
    // outside the range would smuggle another batch's rows in — those
    // candidates stay warn-and-drop, the documented residual).
    val substituted: Seq[graft.engine.ParsedManifest] =
      if (unresolved.isEmpty) Nil
      else {
        val rangeEpochs = want.map(n =>
          Manifests.epochKey(Manifests.logicalName(n)))
        val missEpochs = unresolved.map(n =>
          Manifests.epochKey(Manifests.logicalName(n)))
        // legacy manifests may record per-container ancestor names —
        // match both the raw key and its epoch-stripped form
        def inSet(set: Set[String])(a: String): Boolean =
          set(a) || set(Manifests.epochKey(a))
        ms.filter { m =>
          !want.contains(m.name) && m.ancestors.nonEmpty &&
            m.ancestors.exists(inSet(missEpochs)) &&
            m.ancestors.forall(inSet(rangeEpochs))
        }
      }
    val coveredEpochs = substituted
      .flatMap(m => m.ancestors ++ m.ancestors.map(Manifests.epochKey)).toSet
    val dropped = unresolved.filterNot(n =>
      coveredEpochs(Manifests.epochKey(Manifests.logicalName(n))))
    if (substituted.nonEmpty) log.info(
      s"graft stream replay of ($s, $e] on $path: substituting " +
        s"${substituted.size} compacted generation(s) for " +
        s"${(unresolved -- dropped).size} folded logged manifest(s)")
    if (dropped.nonEmpty) {
      // a dropped name whose epoch lives inside a compacted generation
      // we could NOT substitute (its ancestors span epochs outside this
      // replay range) means this batch's rows exist in the table but
      // cannot be re-emitted exactly-once: silently dropping them would
      // lose committed data from the replay (round-7 residual). Fail
      // LOUDLY instead — the stream cannot replay across that
      // compaction boundary and needs a fresh checkpoint.
      def inLive(n: String): Boolean = {
        val ek = Manifests.epochKey(Manifests.logicalName(n))
        ms.exists(m => m.ancestors.nonEmpty &&
          m.ancestors.exists(a => a == ek || Manifests.epochKey(a) == ek))
      }
      val foldedAway = dropped.filter(inLive)
      if (foldedAway.nonEmpty) throw new IllegalStateException(
        s"graft stream replay of ($s, $e] on $path: " +
          s"${foldedAway.size} logged manifest(s) were folded into a " +
          s"compacted generation spanning epochs OUTSIDE this replay " +
          s"range (${foldedAway.toSeq.sorted.take(8).mkString(", ")}" +
          (if (foldedAway.size > 8) ", …" else "") + "); their rows " +
          "cannot be re-emitted exactly-once. Restart the query from a " +
          "fresh checkpoint, or pause consumers across compaction of a " +
          "streamed-from table")
      log.warn(
        s"graft stream replay of ($s, $e] on $path: ${dropped.size} " +
          s"logged manifest(s) no longer resolve (replaced by an epoch " +
          s"replay/overwrite since): ${dropped.toSeq.sorted.take(8).mkString(", ")}" +
          (if (dropped.size > 8) ", …" else "") +
          "; their replacement generations arrive as later batches")
    }
    GraftDataSource.planPartitions(path, fresh ++ substituted, filters,
      maxSplitBytes, required.fieldNames.toSet ++ filters.flatMap(_.references),
      Manifests.loadChunkIndex(conf, path, _), tableCols)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, filters, confKv, Int.MaxValue,
      verifyContent, longCols, strCols, intCols, dblCols, fltCols)

  /** Fold per-batch seen-log entries at or below the COMMITTED offset
    * into one `<end>.compact.json` once [[GraftMicroBatchStream
    * .CompactInterval]] of them accumulate (Spark replays only ranges
    * above its committed offset, so per-batch resolution below it is
    * dead weight — only the names' membership in the seen-set matters).
    * Best-effort: a crash mid-compaction leaves either the old
    * per-batch files, or the compact file plus some per-batch files it
    * already covers — `refreshLog` handles both.
    */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[GraftStreamOffset].batch
    refreshLog()
    val foldable = seenLog.keys.filter(b => b <= e).toSeq.sorted
    if (foldable.size < GraftMicroBatchStream.CompactInterval) return
    val names = (compactedNames ++
      foldable.flatMap(seenLog(_))).toSeq.sorted
    val body = names.map(q).mkString("[", ",", "]")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val top = foldable.max
    if (ContainerIO.createExclusive(conf, s"$logDir/$top.compact.json", body)) {
      val f = ContainerIO.fs(logDir, conf)
      // covered per-batch files and superseded compact files are GC'd
      ContainerIO.listNames(conf, logDir).foreach {
        case n @ LogName(b) if b.toLong <= top =>
          f.delete(new org.apache.hadoop.fs.Path(s"$logDir/$n"), false)
        case n @ CompactName(b) if b.toLong < top =>
          f.delete(new org.apache.hadoop.fs.Path(s"$logDir/$n"), false)
        case _ => ()
      }
      compactedNames = names.toSet
      compactedThrough = top
      seenLog.filterInPlace { case (id, _) => id > top }
    }
  }

  override def stop(): Unit = ()
}

object GraftMicroBatchStream {
  /** Compact the seen-log once this many committed per-batch entries
    * accumulate (FileStreamSource's compactInterval shape).
    */
  final val CompactInterval = 10
}

// ------------------------------------------------------------------ write

class GraftWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val in0 = info.schema()
    // any mix of BIGINT/INT/STRING/TIMESTAMP_NTZ/DATE/DOUBLE columns is
    // writable (specsOf validates); a first write defines the table's
    // schema, an APPEND must match the committed one on (name, kind) in
    // order, and an overwrite may replace it. NULLABILITY is the
    // table's, not the incoming DataFrame's: Spark schemas routinely
    // carry nullable=true for columns that hold no nulls (every toDF
    // string field does), so appends adopt the committed nullability —
    // an actual null aimed at a non-nullable table column still fails
    // per value in the writer, exactly as before
    val specs0 = GraftDataSource.specsOf(in0)
    val in =
      if (doTruncate) in0
      else GraftDataSource.inferFrom(path).map { existing =>
        val tableSpecs = GraftDataSource.specsOf(existing)
        val tPairs = tableSpecs.map(s => (s.name, s.kind))
        val wPairs = specs0.map(s => (s.name, s.kind))
        if (wPairs == tPairs)
          StructType(in0.fields.lazyZip(tableSpecs).map((f, s) =>
            f.copy(nullable = s.nullable)))
        else if (wPairs.size > tPairs.size &&
            wPairs.take(tPairs.size) == tPairs) {
          // add-only schema EVOLUTION: the append keeps the committed
          // schema as its prefix and adds trailing columns. Added
          // columns must be NULLABLE — containers written before the
          // add have no block for them and read back all-NULL, which
          // only a nullable column can represent.
          val added = in0.fields.drop(tableSpecs.size)
          added.foreach(f => require(f.nullable,
            s"graft schema evolution: added column '${f.name}' must be " +
              s"nullable (rows written before the add are NULL there)"))
          StructType(in0.fields.take(tableSpecs.size)
            .lazyZip(tableSpecs).map((f, s) => f.copy(nullable = s.nullable))
            ++ added)
        } else throw new IllegalArgumentException(
          s"graft append schema mismatch: table has ${existing.simpleString}, " +
            s"write is ${in0.simpleString} (an append must match the " +
            s"committed schema, or extend it with trailing nullable columns)")
      }.getOrElse(in0)
    val chunkRows = Option(info.options().get("chunkRows")).map(_.toInt)
      .getOrElse(ColumnarEngine.ChunkRows)
    val sortBy = Option(info.options().get("sortBy")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    sortBy.foreach(c => require(in.fieldNames.contains(c),
      s"sortBy column '$c' is not in the write schema ${in.simpleString}"))
    // partition transforms (round 8): identity/days cluster+sort the
    // write; bucket(n, col) additionally records observed bucket ids
    val partBy = Option(info.options().get("partitionBy"))
      .map(GraftDataSource.parsePartitionBy).getOrElse(Nil)
    partBy.foreach { t =>
      val f = in.fields.find(_.name == t.col).getOrElse(
        throw new IllegalArgumentException(
          s"partitionBy column '${t.col}' is not in the write schema " +
            in.simpleString))
      t match {
        case GraftDataSource.DaysT(c) =>
          require(f.dataType == TimestampNTZType || f.dataType == DateType,
            s"days($c) needs a TIMESTAMP_NTZ or DATE column, got ${f.dataType}")
        case GraftDataSource.BucketT(_, c) =>
          require(f.dataType == LongType || f.dataType == IntegerType ||
              f.dataType == StringType,
            s"bucket(n, $c) needs a BIGINT, INT, or STRING column, " +
              s"got ${f.dataType}")
        case _ => ()
      }
    }
    // writer-task count for clustered writes: AQE otherwise coalesces a
    // small clustered write into one task/container, defeating the
    // layout the transforms were declared for
    val writeParts = Option(info.options().get("writePartitions"))
      .map(_.toInt).getOrElse(0)
    // column drops (round 9): the manifests' schema chain must keep
    // dropped positions (field identity is positional) — interleave the
    // visible write specs into the committed full chain. Tables without
    // drops pass Nil (the untouched fast path).
    val fullCols: Seq[(String, Int)] =
      if (doTruncate) Nil
      else GraftDataSource.fullSpecsFrom(path) match {
        case Some(chain) if chain.exists(_.dropped) =>
          val it = GraftDataSource.specsOf(in).iterator
          (chain.map(s => if (s.dropped) s else it.next()) ++ it)
            .map(s => (s.name, s.packed))
        case _ => Nil
      }
    new GraftWrite(path, doTruncate, info.queryId(), chunkRows, in, sortBy,
      partBy, writeParts, fullCols)
  }
}

/** `option("sortBy", "colA,colB")` declares the write CLUSTERED by the
  * full sort key and sorted within partitions by it — Spark plans the
  * exchange + sort itself (the DSv2 `RequiresDistributionAndOrdering`
  * contract), so per-chunk dictionaries and zone maps come out
  * selective without the caller hand-sorting the DataFrame (what c6
  * had to do before round 5). Clustering hashes on ALL sort columns,
  * not just the head: a zipf-skewed leading column (one hot language,
  * one giant repo) would otherwise land in a single writer task, while
  * the within-partition sort alone already gives every chunk its
  * near-pure dictionary runs.
  */
class GraftWrite(path: String, truncate: Boolean, epoch: String,
                 chunkRows: Int, writeSchema: StructType,
                 sortBy: Seq[String] = Nil,
                 partBy: Seq[GraftDataSource.PartTransform] = Nil,
                 writeParts: Int = 0,
                 fullCols: Seq[(String, Int)] = Nil)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  /** Distribution for the declared layout. Bucket transforms cluster by
    * Spark's `bucket()` expression (plus the other transforms' source
    * columns); identity/days-only layouts use RANGE distribution over
    * the source columns — contiguous value runs per task, the tightest
    * zone maps (`days()` as a clustering expression is unsupported for
    * path-based tables, and range-by-ts subsumes it). The distribution
    * only CO-LOCATES rows; pruning correctness rests on zone maps and
    * writer-recorded bucket ids, never on which task Spark routed a
    * row to.
    */
  override def requiredDistribution(): Distribution =
    if (sortBy.isEmpty && partBy.isEmpty) Distributions.unspecified()
    else if (partBy.exists(_.isInstanceOf[GraftDataSource.BucketT]))
      // hash-cluster by the bucket SOURCE columns (Spark can't resolve
      // a bucket() transform without a function catalog on path-based
      // tables); with writePartitions = n this routes each of OUR
      // Murmur3 buckets to exactly one task — see bucketIdOfLong
      Distributions.clustered(
        (partBy.map(t => Expressions.column(t.col): Expression) ++
          sortBy.map(c => Expressions.column(c): Expression)).toArray)
    else if (partBy.nonEmpty) Distributions.ordered(requiredOrdering())
    else Distributions.clustered(
      sortBy.map(c => Expressions.column(c): Expression).toArray)

  override def requiredOrdering(): Array[SortOrder] =
    // sort by the partition SOURCE columns first (tight zone maps per
    // container for identity/days), then the declared sort key
    (partBy.map(_.col) ++ sortBy).distinct
      .map(c => Expressions.sort(Expressions.column(c),
        SortDirection.ASCENDING)).toArray

  override def requiredNumPartitions(): Int = writeParts
  private def prepare(): Map[String, String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    ContainerIO.mkdirs(conf, s"$path/blocks")
    ContainerIO.mkdirs(conf, s"$path/manifests")
    ContainerIO.confSnapshot(conf)
  }

  override def toBatch: BatchWrite =
    new GraftBatchWrite(path, truncate, epoch, prepare(), chunkRows,
      writeSchema, partBy, fullCols)

  /** `writeStream.format("graft")` — append-only micro-batch sink. Each
    * micro-batch commits as one epoch (`<queryId>-e<epochId>`), so a
    * replayed batch after a failure re-stages identical containers under
    * identical names (first-commit-wins) and re-publishes the same
    * manifests: the sink is idempotent per epoch, which with the
    * checkpointed epoch id gives effective exactly-once table contents.
    */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!truncate,
      "graft streaming sink is append-only (outputMode(\"append\"))")
    new GraftStreamingWrite(path, epoch, prepare(), chunkRows, writeSchema,
      partBy, fullCols)
  }
}

case class GraftCommitMessage(name: String, rows: Long,
                              manifestJson: String) extends WriterCommitMessage

/** Two concurrent appends can each be a valid add-only extension of the
  * schema they SAW yet incompatible with each other (one adds `b`, one
  * adds `c`). The loser aborts with this inside its OCC index commit —
  * otherwise the committed schemas stop forming a prefix chain and every
  * subsequent read fails inference.
  */
class SchemaEvolutionConflict(msg: String) extends IllegalStateException(msg)

private[sources] object GraftCommits {

  /** Logical partition identity of a staged container name (see
    * [[Manifests.logicalName]]). A replayed streaming epoch (or a task
    * retry) re-stages the same logical name under a fresh attempt id;
    * publish REPLACES any previous generation of the same logical name
    * instead of appending a duplicate.
    */
  private[sources] def logicalName(n: String): String =
    Manifests.logicalName(n)

  /** Publish one job's (or micro-batch's) staged containers: write the
    * manifests (commit markers) first, then commit the new consolidated
    * index snapshot via OCC ([[Manifests.commitIndex]] — safe against a
    * concurrent append or streaming epoch), and only AFTER the new
    * snapshot is live delete the generations this commit replaced
    * (everything on truncate; the previous generation of each published
    * EPOCH otherwise). Re-publishing an epoch is idempotent BY EPOCH:
    * the replay's containers replace the original generation WHOLE,
    * regardless of how the replay re-partitioned the epoch's rows —
    * and when the original generation was COMPACTED away
    * ([[GraftMaintenance.compact]] records the consumed logical names
    * as the compacted manifest's `ancestors`), the replay is DROPPED
    * instead of appended: its rows already live inside the compacted
    * container, so re-adding them would double every row of the epoch.
    */
  def publish(confKv: Map[String, String], path: String, truncate: Boolean,
              messages: Array[WriterCommitMessage]): Unit = {
    val conf = ContainerIO.confFrom(confKv)
    // one commit-generation stamp for everything this publish lands: the
    // listing-fallback normalizer selects WHOLE generations by it when a
    // crash window leaves two generations of an epoch on disk, and the
    // per-epoch container count lets it tell a complete generation from
    // a publish that crashed mid-way through its manifest writes
    val commitId = Manifests.newCommitId(conf, path)
    val raw = messages.collect {
      case m: GraftCommitMessage if m.rows > 0 => m
    }.sortBy(_.name)
    val epochParts = raw.groupBy(m =>
      Manifests.epochKey(logicalName(m.name))).view.mapValues(_.length).toMap
    val fresh = raw.map(m => m.copy(manifestJson = Manifests.stampCommit(
      m.manifestJson, commitId,
      epochParts(Manifests.epochKey(logicalName(m.name))))))
    if (fresh.isEmpty && !truncate) return
    fresh.foreach { m =>
      ContainerIO.writeAtomic(conf,
        s"$path/manifests/.tmp-part-${m.name}-commit",
        Manifests.manifestPath(path, m.name),
        m.manifestJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    // names among `fresh` whose EPOCH was already folded into a live
    // compacted container — decided against the snapshot the WINNING
    // commit attempt saw (set by the last transform run). Matching is
    // epoch-granular ([[Manifests.epochKey]]): a replay may run with a
    // different partition count, so per-container matching would drop
    // only the name-colliding part and append the rest as duplicates.
    // Compaction consumes only WHOLE epochs (GraftMaintenance), so an
    // ancestor epoch key always means "every row of that epoch lives in
    // a compacted generation".
    @volatile var droppedReplays = Set.empty[String]
    @volatile var priorNames = Seq.empty[String]
    // priorNames captures the snapshot the winning commit superseded —
    // exactly the state this commit's deletes must be judged against
    val newSchema: Seq[(String, Int)] =
      if (fresh.isEmpty) Nil
      else Manifests.parseWithFallback(fresh.head.manifestJson).schemaCols
    try Manifests.commitIndex(conf, path, old => {
      // parse each old manifest ONCE per attempt: this transform runs on
      // the commit hot path of every write/epoch, over O(partitions)
      // JSONs
      val parsedOld = old.map(Manifests.parseWithFallback)
      priorNames = parsedOld.map(_.name)
      // add-only evolution guard (round 7, rename-aware since round 8):
      // this write's schema must match or extend the snapshot's CURRENT
      // schema (positional identity with last-commit-wins names — an
      // old container's historical label is not a conflict, a
      // concurrent divergent add or rename IS). The write builder
      // already validated against the snapshot it SAW; this re-check
      // inside the OCC transform is what catches the race.
      if (!truncate && newSchema.nonEmpty && parsedOld.nonEmpty) {
        val cur = GraftDataSource.currentSpecsOf(parsedOld)
          .map(s => (s.name, s.packed))
        if (cur != newSchema.take(cur.size) &&
            newSchema != cur.take(newSchema.size))
          throw new SchemaEvolutionConflict(
            s"concurrent schema evolution on $path: the table's current " +
              s"columns are ${cur.map(_._1).mkString(",")}, incompatible " +
              s"with this write's ${newSchema.map(_._1).mkString(",")}; " +
              "this append aborted")
      }
      // ancestors written before the commit-generation format were
      // per-container logical names: include their epochKey so legacy
      // compacted tables keep their replay protection
      val liveAncestors: Set[String] =
        if (truncate) Set.empty
        else {
          val anc = parsedOld.flatMap(_.ancestors).toSet
          anc ++ anc.map(Manifests.epochKey)
        }
      val (replays, active) = fresh.partition(m =>
        liveAncestors.contains(Manifests.epochKey(logicalName(m.name))))
      droppedReplays = replays.map(_.name).toSet
      // replacement is EPOCH-granular too: a replayed epoch may
      // re-partition the same rows, so per-logical-name replacement
      // would leave the old generation's surplus partitions alongside
      // the full replay — duplicates. Publishing an epoch replaces
      // EVERY container of its previous generation.
      val activeEpochs = active
        .map(m => Manifests.epochKey(logicalName(m.name))).toSet
      val kept =
        if (truncate) Nil
        else old.lazyZip(parsedOld).collect {
          case (j, pm) if !activeEpochs.contains(
            Manifests.epochKey(logicalName(pm.name))) => j
        }.toSeq
      kept ++ active.map(_.manifestJson)
    })
    catch {
      case e: SchemaEvolutionConflict =>
        // the commit markers written above must not linger: invisible to
        // index reads (never committed) but the listing fallback and
        // schema inference would trip over them
        val f = ContainerIO.fs(path, conf)
        fresh.foreach { m =>
          f.delete(new org.apache.hadoop.fs.Path(
            s"$path/blocks/part-${m.name}.gblk"), false)
          f.delete(new org.apache.hadoop.fs.Path(
            Manifests.manifestPath(path, m.name)), false)
        }
        throw e
    }
    val activeNames = fresh.map(_.name).toSet -- droppedReplays
    val activeEpochs = activeNames.map(n => Manifests.epochKey(logicalName(n)))
    def replaced(name: String): Boolean =
      !activeNames.contains(name) &&
        (truncate ||
          activeEpochs.contains(Manifests.epochKey(logicalName(name))))
    val doomed = priorNames.filter(replaced)
    val f = ContainerIO.fs(path, conf)
    doomed.foreach { n =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/blocks/part-$n.gblk"), false)
      f.delete(new org.apache.hadoop.fs.Path(Manifests.manifestPath(path, n)), false)
    }
    // a dropped replay's staged container + just-written manifest file
    // are dead weight (its rows live in the compacted generation)
    droppedReplays.foreach { n =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/blocks/part-$n.gblk"), false)
      f.delete(new org.apache.hadoop.fs.Path(Manifests.manifestPath(path, n)), false)
    }
  }

  /** Drop an aborted epoch's staged containers (unreachable anyway — no
    * manifest — but don't leave them as garbage).
    */
  def dropStaged(confKv: Map[String, String], path: String, epoch: String): Unit = {
    val conf = ContainerIO.confFrom(confKv)
    val f = ContainerIO.fs(path, conf)
    // ANCHORED match (staged names are `part-<epoch>-<part>-a<task>`): a
    // substring test could sweep another epoch whose name embeds this
    // one; the prefix + leading-digit check can't
    val prefix = s"part-$epoch-"
    ContainerIO.listNames(conf, s"$path/blocks")
      .filter(n => n.startsWith(prefix) && n.length > prefix.length &&
        n.charAt(prefix.length).isDigit)
      .foreach(n => f.delete(new org.apache.hadoop.fs.Path(s"$path/blocks/$n"), false))
  }
}

/** Job-level commit: tasks publish only attempt-qualified CONTAINERS
  * (invisible to readers — no manifest); this commit writes every
  * manifest plus a new OCC-committed `_manifest-index.v<N>.json`
  * snapshot, and — for overwrite — deletes the old generation only
  * AFTER the new one is live. A failed/killed job leaves the previous
  * table fully intact; `abort` garbage-collects this epoch's staged
  * containers.
  */
class GraftBatchWrite(path: String, truncate: Boolean, epoch: String,
                      confKv: Map[String, String], chunkRows: Int,
                      writeSchema: StructType = GraftDataSource.schema,
                      partBy: Seq[GraftDataSource.PartTransform] = Nil,
                      fullCols: Seq[(String, Int)] = Nil)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(path, epoch, confKv, chunkRows, writeSchema, partBy,
      fullCols)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftCommits.publish(confKv, path, truncate, messages)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftCommits.dropStaged(confKv, path, epoch)
}

/** Micro-batch streaming sink: every epoch appends via the same staged
  * containers + manifest publication as a batch append.
  */
class GraftStreamingWrite(path: String, queryEpoch: String,
                          confKv: Map[String, String], chunkRows: Int,
                          writeSchema: StructType = GraftDataSource.schema,
                          partBy: Seq[GraftDataSource.PartTransform] = Nil,
                          fullCols: Seq[(String, Int)] = Nil)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private def epochOf(epochId: Long) = s"$queryEpoch-e$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(path, queryEpoch, confKv, chunkRows,
      writeSchema, partBy, fullCols)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftCommits.publish(confKv, path, truncate = false, messages)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftCommits.dropStaged(confKv, path, epochOf(epochId))
}

class GraftStreamingWriterFactory(path: String, queryEpoch: String,
                                  confKv: Map[String, String], chunkRows: Int,
                                  writeSchema: StructType = GraftDataSource.schema,
                                  partBy: Seq[GraftDataSource.PartTransform] = Nil,
                                  fullCols: Seq[(String, Int)] = Nil)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(path, partitionId, s"$queryEpoch-e$epochId", confKv,
      chunkRows, taskId, writeSchema, partBy, fullCols)
}

class GraftWriterFactory(path: String, epoch: String,
                         confKv: Map[String, String], chunkRows: Int,
                         writeSchema: StructType = GraftDataSource.schema,
                         partBy: Seq[GraftDataSource.PartTransform] = Nil,
                         fullCols: Seq[(String, Int)] = Nil)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(path, partitionId, epoch, confKv, chunkRows, taskId,
      writeSchema, partBy, fullCols)
}

/** Streams rows through the engine's [[ColumnarEngine.PartitionEncoder]]:
  * chunk-bounded memory; the container written in `commit()` stays
  * INVISIBLE until [[GraftBatchWrite.commit]] publishes the manifests.
  *
  * The staged name is ATTEMPT-qualified (`<epoch>-<part>-a<taskId>`): a
  * retry or speculative attempt stages its own container and its commit
  * message describes exactly those bytes, so the driver can never publish
  * a manifest whose CRCs/digest belong to a different attempt's file
  * (round 4's shared final name + first-commit-wins rename could, when
  * an attempt died between its rename and its commit message and row
  * order upstream was nondeterministic). A losing attempt's `abort`
  * deletes its own staged container; one that dies uncleanly leaves an
  * orphan that no manifest references — invisible to every read path and
  * swept by job-level `abort`.
  */
class GraftDataWriter(path: String, part: Int, epoch: String,
                      confKv: Map[String, String], chunkRows: Int,
                      taskId: Long,
                      writeSchema: StructType = GraftDataSource.schema,
                      partBy: Seq[GraftDataSource.PartTransform] = Nil,
                      fullCols: Seq[(String, Int)] = Nil)
    extends DataWriter[InternalRow] {
  private val enc = new ColumnarEngine.PartitionEncoder(
    part, path, ContainerIO.confFrom(confKv),
    partName = s"$epoch-$part-a$taskId", chunkRowsCap = chunkRows,
    // fullCols (round 9, tables with dropped positions): the manifest's
    // positional chain incl. dropped placeholders; its live columns are
    // exactly the write schema's, in order
    schema = if (fullCols.isEmpty) GraftDataSource.specsOf(writeSchema)
      else fullCols.map { case (n, k) =>
        graft.engine.ColumnSpec.fromPacked(n, k) })
  // row positions of the string/numeric fields, in the encoder's
  // (strNames, longNames) order — both preserve writeSchema field order;
  // narrow (INT/DATE) fields ride the numeric array widened to Long (the
  // encoder writes them as kind-2/4 narrow blocks); TIMESTAMP_NTZ is
  // already a micros long in the InternalRow
  private def isNumeric(dt: DataType): Boolean =
    dt != StringType && dt != BinaryType && !dt.isInstanceOf[ArrayType]
  private def isNarrow(dt: DataType): Boolean =
    dt == IntegerType || dt == DateType
  private val strPos: Array[Int] = writeSchema.fields.zipWithIndex
    .collect { case (f, i) if f.dataType == StringType => i }
  private val binPos: Array[Int] = writeSchema.fields.zipWithIndex
    .collect { case (f, i) if f.dataType == BinaryType => i }
  private val fltPos: Array[Int] = writeSchema.fields.zipWithIndex
    .collect { case (f, i) if f.dataType.isInstanceOf[ArrayType] => i }
  private val longPos: Array[Int] = writeSchema.fields.zipWithIndex
    .collect { case (f, i) if isNumeric(f.dataType) => i }
  private val longIsInt: Array[Boolean] = writeSchema.fields
    .collect { case f if isNumeric(f.dataType) => isNarrow(f.dataType) }
  private val longIsDbl: Array[Boolean] = writeSchema.fields
    .collect { case f if isNumeric(f.dataType) => f.dataType == DoubleType }
  // float scalar (kind 10): sortable-int bits ride the numeric lane
  private val longIsF32: Array[Boolean] = writeSchema.fields
    .collect { case f if isNumeric(f.dataType) => f.dataType == FloatType }
  // decimal (kind 8): unscaled long; boolean (kind 9): 0/1
  private val longDec: Array[DecimalType] = writeSchema.fields
    .collect { case f if isNumeric(f.dataType) => f.dataType match {
      case d: DecimalType => d
      case _ => null
    } }
  private val longIsBool: Array[Boolean] = writeSchema.fields
    .collect { case f if isNumeric(f.dataType) => f.dataType == BooleanType }
  private val strNullable: Array[Boolean] = writeSchema.fields
    .collect { case f if f.dataType == StringType => f.nullable }
  private val longNullable: Array[Boolean] = writeSchema.fields
    .collect { case f if isNumeric(f.dataType) => f.nullable }
  private val binNullable: Array[Boolean] = writeSchema.fields
    .collect { case f if f.dataType == BinaryType => f.nullable }
  private val fltNullable: Array[Boolean] = writeSchema.fields
    .collect { case f if f.dataType.isInstanceOf[ArrayType] => f.nullable }
  private val fltElemNullable: Array[Boolean] = writeSchema.fields
    .collect { case f if f.dataType.isInstanceOf[ArrayType] =>
      f.dataType.asInstanceOf[ArrayType].containsNull }
  // value/mask arrays reused across rows (the encoder copies synchronously);
  // masks exist only when the schema declares any nullable column of that
  // group, so non-nullable tables keep the round-6 fast path
  private val strs = new Array[String](strPos.length)
  private val longs = new Array[Long](longPos.length)
  private val bins = new Array[Array[Byte]](binPos.length)
  private val fltsArr = new Array[Array[Float]](fltPos.length)
  private val strNulls: Array[Boolean] =
    if (strNullable.exists(identity)) new Array[Boolean](strPos.length) else null
  private val longNulls: Array[Boolean] =
    if (longNullable.exists(identity)) new Array[Boolean](longPos.length) else null
  private val binNulls: Array[Boolean] =
    if (binNullable.exists(identity)) new Array[Boolean](binPos.length) else null
  private val fltNulls: Array[Boolean] =
    if (fltNullable.exists(identity)) new Array[Boolean](fltPos.length) else null
  private var n = 0L

  // bucket(n, col) transforms: observe each container's bucket-id set
  // (bounded by n entries) for manifest-recorded container elimination.
  // lane: 0 = long, 1 = int, 2 = string (the hash must match the
  // constant type admission will see)
  private val bucketSpecs: Array[(Int, Int, Int)] = partBy.collect {
    case GraftDataSource.BucketT(bn, c) =>
      val pos = writeSchema.fieldNames.indexOf(c)
      val lane = writeSchema.fields(pos).dataType match {
        case LongType => 0
        case IntegerType => 1
        case _ => 2
      }
      (pos, bn, lane)
  }.toArray
  private val bucketSeen: Array[scala.collection.mutable.BitSet] =
    bucketSpecs.map(s => new scala.collection.mutable.BitSet(s._2))

  private def nullError(i: Int): Nothing = throw new IllegalArgumentException(
    s"graft write: null value in non-nullable column " +
      s"'${writeSchema.fields(i).name}' (row ${n + 1} of task $part)")

  override def write(row: InternalRow): Unit = {
    var b = 0
    while (b < bucketSpecs.length) {
      val (pos, bn, lane) = bucketSpecs(b)
      if (!row.isNullAt(pos)) {
        val id = lane match {
          case 0 => GraftDataSource.bucketIdOfLong(row.getLong(pos), bn)
          case 1 => GraftDataSource.bucketIdOfInt(row.getInt(pos), bn)
          case _ => GraftDataSource.bucketIdOfString(
            row.getUTF8String(pos).toString, bn)
        }
        bucketSeen(b) += id
      }
      b += 1
    }
    var i = 0
    while (i < strPos.length) {
      if (row.isNullAt(strPos(i))) {
        if (strNulls == null || !strNullable(i)) nullError(strPos(i))
        strNulls(i) = true
        strs(i) = null
      } else {
        if (strNulls != null) strNulls(i) = false
        strs(i) = row.getUTF8String(strPos(i)).toString
      }
      i += 1
    }
    i = 0
    while (i < longPos.length) {
      if (row.isNullAt(longPos(i))) {
        if (longNulls == null || !longNullable(i)) nullError(longPos(i))
        longNulls(i) = true
        longs(i) = 0L
      } else {
        if (longNulls != null) longNulls(i) = false
        longs(i) =
          if (longIsInt(i)) row.getInt(longPos(i)).toLong
          else if (longIsDbl(i))
            // kind 5: order-preserving sortable-long storage form
            graft.codecs.DoubleBits.toSortableLong(row.getDouble(longPos(i)))
          else if (longIsF32(i))
            // kind 10: sortable-int bits, widened through the narrow path
            graft.codecs.FloatBits.toSortableInt(row.getFloat(longPos(i))).toLong
          else if (longDec(i) != null)
            // kind 8: the unscaled long at the column's declared scale
            row.getDecimal(longPos(i), longDec(i).precision, longDec(i).scale)
              .toUnscaledLong
          else if (longIsBool(i))
            (if (row.getBoolean(longPos(i))) 1L else 0L) // kind 9
          else row.getLong(longPos(i))
      }
      i += 1
    }
    i = 0
    while (i < binPos.length) {
      if (row.isNullAt(binPos(i))) {
        if (binNulls == null || !binNullable(i)) nullError(binPos(i))
        binNulls(i) = true
        bins(i) = null
      } else {
        if (binNulls != null) binNulls(i) = false
        bins(i) = row.getBinary(binPos(i))
      }
      i += 1
    }
    i = 0
    while (i < fltPos.length) {
      if (row.isNullAt(fltPos(i))) {
        if (fltNulls == null || !fltNullable(i)) nullError(fltPos(i))
        fltNulls(i) = true
        fltsArr(i) = null
      } else {
        if (fltNulls != null) fltNulls(i) = false
        val ad = row.getArray(fltPos(i))
        // a null ELEMENT would silently decode as 0.0f downstream —
        // reject loudly (the stored shape is a dense float vector)
        if (fltElemNullable(i)) {
          var e = 0
          val m = ad.numElements()
          while (e < m) {
            if (ad.isNullAt(e)) throw new IllegalArgumentException(
              s"graft write: null element in float array column " +
                s"'${writeSchema.fields(fltPos(i)).name}' (row ${n + 1})")
            e += 1
          }
        }
        fltsArr(i) = ad.toFloatArray()
      }
      i += 1
    }
    enc.addRow(strs, longs, bins, fltsArr, strNulls, longNulls,
      binNulls, fltNulls)
    n += 1
  }

  /** The unpublished manifest of this task's staged container — shared
    * by the DSv2 `commit()` and the maintenance paths (upsert) that
    * stage appends under their own OCC swap instead of
    * [[GraftCommits.publish]].
    */
  private[sources] def commitManifest(): graft.engine.PartManifest =
    enc.finish(publishManifest = false).copy(
      partitioning = partBy.map(_.render),
      bucketIds = bucketSpecs.lazyZip(bucketSeen).map { case ((pos, _, _), seen) =>
        writeSchema.fields(pos).name -> seen.toSeq.sorted
      }.toMap)

  override def commit(): WriterCommitMessage = {
    val manifest = commitManifest()
    GraftCommitMessage(manifest.name, n, Manifests.manifestJson(manifest))
  }

  /** Best-effort delete of this attempt's own staged container (present
    * only when `commit()` already ran but the driver discarded the
    * message — e.g. the losing side of speculation). The name is
    * attempt-unique, so nothing else can reference it.
    */
  override def abort(): Unit = {
    val conf = ContainerIO.confFrom(confKv)
    ContainerIO.fs(path, conf).delete(
      new org.apache.hadoop.fs.Path(s"$path/blocks/part-${enc.name}.gblk"), false)
    ()
  }
  override def close(): Unit = ()
}
