package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL surface for graft table maintenance (round 7) — the operational
  * affordance lakehouse users expect from Iceberg/Delta-style catalogs:
  *
  * {{{
  *   spark.conf "spark.sql.catalog.graft" -> "graft.sources.GraftCatalog"
  *   CALL graft.system.compact(path => '/data/t', dry_run => true)
  *   CALL graft.system.compact('/data/t')
  *   CALL graft.system.vacuum('/data/t', grace_ms => 0)
  * }}}
  *
  * Built on Spark 4's stored-procedure connector API
  * ([[ProcedureCatalog]] / [[UnboundProcedure]]): each CALL binds,
  * runs the [[GraftMaintenance]] entry point on the driver, and returns
  * its report as rows (`dry_run => true` reports without touching the
  * table). Parameter defaults mirror the Scala API's.
  */
class GraftCatalog extends CatalogPlugin with ProcedureCatalog {
  private var catalogName = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val System = Array("system")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(System) || namespace.isEmpty)
      Array(Identifier.of(System, "compact"), Identifier.of(System, "vacuum"),
        Identifier.of(System, "rename_column"), Identifier.of(System, "delete"),
        Identifier.of(System, "expire_snapshots"),
        Identifier.of(System, "drop_column"), Identifier.of(System, "update"))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!ident.namespace.sameElements(System))
      throw new RuntimeException(
        s"graft catalog has no namespace ${ident.namespace.mkString(".")}; " +
          "procedures live under `system`")
    ident.name.toLowerCase match {
      case "compact" => GraftCatalog.CompactProcedure
      case "vacuum" => GraftCatalog.VacuumProcedure
      case "rename_column" => GraftCatalog.RenameColumnProcedure
      case "delete" => GraftCatalog.DeleteProcedure
      case "expire_snapshots" => GraftCatalog.ExpireSnapshotsProcedure
      case "drop_column" => GraftCatalog.DropColumnProcedure
      case "update" => GraftCatalog.UpdateProcedure
      case other => throw new RuntimeException(
        s"unknown graft procedure $other; have: compact, vacuum, " +
          "rename_column, delete, expire_snapshots, drop_column, update")
    }
  }
}

object GraftCatalog {

  private def in(name: String, dt: DataType, default: String = null,
                 comment: String = null): ProcedureParameter = {
    var b = ProcedureParameter.in(name, dt)
    if (default != null) b = b.defaultValue(default)
    if (comment != null) b = b.comment(comment)
    b.build()
  }

  /** One-row driver-side result relation for a procedure's report. */
  private final case class Report(schema: StructType, row: Array[Any])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      Array(new GenericInternalRow(row))
  }

  private def one(scan: Scan): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(scan).iterator()

  object CompactProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "Fold small committed containers of a graft table at whole-epoch " +
        "granularity (one OCC commit; concurrent appends survive). " +
        "dry_run => true reports the fold without performing it."
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      in("path", StringType, comment = "graft table directory"),
      in("target_bytes", LongType, default = (128L << 20).toString,
        comment = "max encoded bytes per compacted container"),
      in("min_containers", IntegerType, default = "2",
        comment = "smallest fold worth rewriting"),
      in("dry_run", BooleanType, default = "false"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (consumed, produced) = GraftMaintenance.compact(
        SparkSession.active,
        input.getUTF8String(0).toString,
        targetBytes = input.getLong(1),
        minContainers = input.getInt(2),
        dryRun = input.getBoolean(3))
      one(Report(
        StructType(Seq(
          StructField("containers_consumed", IntegerType, nullable = false),
          StructField("containers_produced", IntegerType, nullable = false),
          StructField("dry_run", BooleanType, nullable = false))),
        Array(consumed, produced, input.getBoolean(3))))
    }
  }

  object RenameColumnProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "rename_column"
    override def description(): String =
      "Rename a column of a graft table (metadata-only: commits a " +
        "zero-row schema marker; committed containers keep their " +
        "historical labels and readers translate per container)."
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      in("path", StringType, comment = "graft table directory"),
      in("from", StringType, comment = "current column name"),
      in("to", StringType, comment = "new column name"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      GraftMaintenance.renameColumn(
        SparkSession.active,
        input.getUTF8String(0).toString,
        input.getUTF8String(1).toString,
        input.getUTF8String(2).toString)
      one(Report(
        StructType(Seq(
          StructField("renamed", BooleanType, nullable = false))),
        Array(true)))
    }
  }

  object UpdateProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "update"
    override def description(): String =
      "Copy-on-write row-level UPDATE: rows matching the predicate are " +
        "rewritten with set_column = set_expr (any deterministic Spark " +
        "SQL expression over the row's original values, cast to the " +
        "column's type); only containers that may hold matches rewrite, " +
        "one OCC swap. Multi-column updates: the Scala API " +
        "GraftMaintenance.update(spark, path, predicate, Map(...))."
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      in("path", StringType, comment = "graft table directory"),
      in("predicate", StringType,
        comment = "SQL boolean expression; matching rows are updated"),
      in("set_column", StringType, comment = "column to assign"),
      in("set_expr", StringType,
        comment = "SQL expression for the new value"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val updated = GraftMaintenance.update(
        SparkSession.active,
        input.getUTF8String(0).toString,
        input.getUTF8String(1).toString,
        Map(input.getUTF8String(2).toString ->
          input.getUTF8String(3).toString))
      one(Report(
        StructType(Seq(
          StructField("rows_updated", LongType, nullable = false))),
        Array(updated)))
    }
  }

  object DropColumnProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_column"
    override def description(): String =
      "Drop a column of a graft table (metadata-only: a zero-row schema " +
        "marker tombstones the POSITION; committed containers keep " +
        "their data for time travel, readers project it out, appends " +
        "supply only the visible columns, and the name may later be " +
        "re-added as a fresh trailing column)."
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      in("path", StringType, comment = "graft table directory"),
      in("col", StringType, comment = "current column name to drop"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      GraftMaintenance.dropColumn(
        SparkSession.active,
        input.getUTF8String(0).toString,
        input.getUTF8String(1).toString)
      one(Report(
        StructType(Seq(
          StructField("dropped", BooleanType, nullable = false))),
        Array(true)))
    }
  }

  object DeleteProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "delete"
    override def description(): String =
      "Copy-on-write row-level DELETE: rewrite exactly the containers " +
        "that may hold rows matching the predicate (any deterministic " +
        "Spark SQL boolean expression), swap under one OCC commit. " +
        "Retained snapshots keep time-traveling to the pre-delete rows " +
        "until expire_snapshots + vacuum purge them."
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      in("path", StringType, comment = "graft table directory"),
      in("predicate", StringType,
        comment = "SQL boolean expression; matching rows are deleted"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val deleted = GraftMaintenance.delete(
        SparkSession.active,
        input.getUTF8String(0).toString,
        input.getUTF8String(1).toString)
      one(Report(
        StructType(Seq(
          StructField("rows_deleted", LongType, nullable = false))),
        Array(deleted)))
    }
  }

  object ExpireSnapshotsProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "expire_snapshots"
    override def description(): String =
      "Expire retained time-travel snapshots now: keep the newest " +
        "retain_last content-bearing versions (the tip counts), " +
        "optionally only versions older than older_than_ms. Expired " +
        "versions fail reads with the controlled 'no longer retained' " +
        "error and stop protecting their blocks from vacuum (the " +
        "delete-purge path). The rolling per-commit window is the " +
        "graft.snapshot.retention configuration key (default 8)."
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      in("path", StringType, comment = "graft table directory"),
      in("retain_last", LongType, default = "2",
        comment = "newest content-bearing versions to keep (>= 1)"),
      in("older_than_ms", LongType, default = "0",
        comment = "only expire versions at least this old"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val expired = GraftMaintenance.expireSnapshots(
        SparkSession.active,
        input.getUTF8String(0).toString,
        retainLast = input.getLong(1),
        olderThanMs = input.getLong(2))
      one(Report(
        StructType(Seq(
          StructField("snapshots_expired", IntegerType, nullable = false))),
        Array(expired)))
    }
  }

  object VacuumProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "Delete aged orphan blocks and tmp fragments of a graft table " +
        "(referenced = index snapshot UNION manifest listing). " +
        "dry_run => true counts without deleting."
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      in("path", StringType, comment = "graft table directory"),
      in("grace_ms", LongType, default = (72L * 60 * 60 * 1000).toString,
        comment = "minimum age before an unreferenced file is swept"),
      in("dry_run", BooleanType, default = "false"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val deleted = GraftMaintenance.vacuum(
        SparkSession.active,
        input.getUTF8String(0).toString,
        graceMs = input.getLong(1),
        dryRun = input.getBoolean(2))
      one(Report(
        StructType(Seq(
          StructField("files_deleted", IntegerType, nullable = false),
          StructField("dry_run", BooleanType, nullable = false))),
        Array(deleted, input.getBoolean(2))))
    }
  }
}
