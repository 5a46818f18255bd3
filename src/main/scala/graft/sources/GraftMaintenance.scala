package graft.sources

import org.apache.spark.sql.SparkSession

import graft.engine.{ColumnarEngine, ColumnSpec, ContainerFormat, ContainerIO, ContainerInput, DecodedChunk, Manifests, ParsedManifest, PartManifest}

/** Table maintenance for graft tables — the operational side a
  * long-running streaming sink needs: every micro-batch epoch commits
  * one container per task, so an always-on query accretes thousands of
  * tiny containers and manifests that chunk-granular planning cannot
  * help with (each file IS one small chunk). `compact` rewrites runs of
  * small containers into full-size ones and swaps them into the table
  * in one OCC index commit — the same shape as Iceberg's
  * `rewrite_data_files` maintenance procedure, built on the machinery
  * the write path already has ([[Manifests.commitIndex]] + the
  * manifest-as-commit-marker discipline of [[GraftCommits.publish]]).
  */
object GraftMaintenance {

  /** Raised when the containers selected for compaction were replaced
    * or removed by a concurrent commit (epoch replay, overwrite,
    * another compaction) between planning and the index commit: the
    * rewritten data would resurrect superseded rows, so the compaction
    * aborts — cleanly, with its staged output removed — and the table
    * is left exactly as the concurrent writer published it.
    */
  final class CompactionConflict(msg: String)
      extends java.util.ConcurrentModificationException(msg)

  /** Rewrite this table's small containers into ~`targetBytes` ones.
    *
    * Planning: committed containers whose encoded size is below
    * `targetBytes` are greedily binned (by name order — the streaming
    * sink's epoch order) into runs of up to `targetBytes`; every bin
    * with at least `minContainers` members is rewritten by one Spark
    * task that streams the bin's chunks through the shared container
    * parse (CRC + content-digest verified) into a fresh
    * [[ColumnarEngine.PartitionEncoder]] — chunk-bounded memory, codecs
    * re-selected on the bigger chunks.
    *
    * Commit: new manifests are written first (commit markers), then ONE
    * OCC index commit ([[Manifests.commitIndex]]) replaces exactly the
    * consumed manifests with the compacted ones — a concurrent append
    * or streaming epoch retries on top and is preserved; a concurrent
    * commit that REPLACED one of the consumed containers aborts the
    * compaction ([[CompactionConflict]]) instead of resurrecting its
    * rows. Old-generation files are deleted only after the new snapshot
    * is live; a reader that planned against the prior snapshot gets the
    * controlled snapshot-superseded error, never a raw
    * FileNotFoundException (see [[ChunkCursor]]).
    *
    * Exactly-once interplay: the compacted manifest records the consumed
    * EPOCH keys as its `ancestors` (compaction consumes only whole
    * epochs, so an ancestor always means "every row of that epoch lives
    * here"), and a streaming-sink epoch that is REPLAYED after its
    * containers were compacted away is dropped WHOLE by
    * [[GraftCommits.publish]] — even when the replay re-partitioned —
    * instead of re-appended. Downstream CONSUMERS tailing
    * this table via `readStream.format("graft")` follow the
    * FileStreamSource rewrite contract: a compacted generation is a new
    * manifest name, so a tailing query that already emitted the old
    * containers will emit the compacted container's rows AGAIN —
    * compact a streamed-FROM table only when downstream deduplicates or
    * can tolerate replays, or pause consumers across the maintenance
    * window.
    *
    * Returns (containers consumed, containers produced); (0, 0) when
    * nothing qualifies.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20,
              minContainers: Int = 2,
              dryRun: Boolean = false): (Int, Int) =
    compactWithHook(spark, path, targetBytes, minContainers, () => (),
      dryRun = dryRun)

  /** Test seams: `beforeCommit` runs after the rewritten containers are
    * staged but before this run's manifests are written — the window a
    * concurrent append/replace races into. `afterStage` runs after the
    * manifests (commit markers) are on disk but before the index commit
    * — the window a concurrent [[Manifests.consolidate]] (end of every
    * engine encode) can ADOPT the staged generation in.
    */
  private[graft] def compactWithHook(spark: SparkSession, path: String,
                                     targetBytes: Long, minContainers: Int,
                                     beforeCommit: () => Unit,
                                     afterStage: () => Unit = () => (),
                                     dryRun: Boolean = false): (Int, Int) = {
    require(targetBytes > 0 && minContainers >= 2,
      s"need targetBytes > 0 and minContainers >= 2, " +
        s"got ($targetBytes, $minContainers)")
    val confKv = ContainerIO.confSnapshot(spark)
    val conf = ContainerIO.confFrom(confKv)
    val committed = Manifests.readCommitted(conf, path).filter(_.rows > 0)
    if (committed.isEmpty) return (0, 0)
    // one BIN holds one schema generation: add-only evolution (round 7)
    // means a table may hold containers of different widths. An epoch is
    // always schema-homogeneous (one write job, one schema), so binning
    // runs independently per (schema, digestCol) group and a rewrite
    // never has to unify widths — the evolved table keeps its mixed
    // generations and readers null-fill the absent trailing columns.
    //
    // WHOLE-epoch planning within each group: an epoch (micro-batch /
    // job) is consumable only if EVERY one of its committed containers
    // qualifies — replay protection records ancestor EPOCHS, and "epoch
    // is an ancestor" must mean "all of its rows live in compacted
    // generations". An epoch with one over-size container is skipped.
    val work: Seq[(Seq[(String, Int)], String, Seq[ParsedManifest])] =
      committed.groupBy(m => (m.schemaCols, m.digestCol)).toSeq
        .sortBy(_._2.map(_.name).min)
        .flatMap { case ((schemaCols, digestCol), group) =>
          val smallNames = group
            .filter(_.encodedBytes < targetBytes).map(_.name).toSet
          val groups = group
            .groupBy(m => Manifests.epochKey(Manifests.logicalName(m.name)))
            .values.toSeq
            .filter(_.forall(m => smallNames(m.name)))
            .map(_.sortBy(_.name))
            .sortBy(_.head.name)
          // greedy size-binning over whole epoch groups, in epoch order
          val bins = Seq.newBuilder[Seq[ParsedManifest]]
          var run = List.empty[Seq[ParsedManifest]]
          var runBytes = 0L
          groups.foreach { g =>
            val gBytes = g.map(_.encodedBytes).sum
            if (run.nonEmpty && runBytes + gBytes > targetBytes) {
              bins += run.reverse.flatten; run = Nil; runBytes = 0L
            }
            run = g :: run
            runBytes += gBytes
          }
          if (run.nonEmpty) bins += run.reverse.flatten
          bins.result().filter(_.size >= minContainers)
            .map(b => (schemaCols, digestCol, b))
        }
    if (work.isEmpty) return (0, 0)
    // dry run: report the fold this run WOULD perform — (containers
    // consumed, containers produced) — without touching the table
    if (dryRun) return (work.map(_._3.size).sum, work.size)
    // the leading letter keeps the run id non-numeric: epochKey strips a
    // trailing all-digit segment, and an all-digit run id would let a
    // double epochKey application collapse "compact-<runId>" to the
    // constant "compact" — two such generations' coverage sets would
    // falsely intersect in the listing-fallback normalizer
    val runId = "r" + java.util.UUID.randomUUID().toString.take(7)
    // one task per bin; RDD because the payload is driver-planned
    // manifest metadata, not table rows (genuine per-partition
    // imperative rewrite). Chunk detail (index entries are summary-only
    // since round 8) hydrates INSIDE each task from the container's own
    // commit marker — the driver plans from summaries alone, so its
    // memory stays O(containers), not O(containers x chunks), at any
    // table size (round 9; the rewrite tasks need per-chunk offsets +
    // CRCs for verified streaming)
    val newManifests: Array[PartManifest] =
      try spark.sparkContext
        .parallelize(work.zipWithIndex, work.size)
        .map { case ((schemaCols, digestCol, ms0), bin) =>
          val c2 = ContainerIO.confFrom(confKv)
          val ms = ms0.map(Manifests.loadChunkIndex(c2, path, _))
          val schema =
            if (schemaCols.isEmpty) ColumnarEngine.DefaultSchema
            else schemaCols.map { case (n, k) => ColumnSpec.fromPacked(n, k) }
          rewriteBin(c2, path, ms, schema,
            digestCol, s"compact-$runId-$bin", bin)._1
        }
        .collect()
      catch {
        case scala.util.control.NonFatal(e) =>
          // a task hit FileNotFound (a concurrent overwrite/compaction
          // deleted a source container mid-read) or failed outright:
          // sweep THIS run's staged containers so nothing leaks, then
          // surface the controlled conflict shape for the FNF case.
          // Fatal errors (OOM, interrupts) propagate untouched — their
          // staged leftovers are vacuum's job
          val f = ContainerIO.fs(path, conf)
          ContainerIO.listNames(conf, s"$path/blocks")
            .filter(_.startsWith(s"part-compact-$runId-"))
            .foreach(n => f.delete(
              new org.apache.hadoop.fs.Path(s"$path/blocks/$n"), false))
          def hasFnf(t: Throwable): Boolean =
            t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
              hasFnf(t.getCause))
          if (hasFnf(e)) {
            val c = new CompactionConflict(
              s"a source container of $path vanished during the rewrite " +
                "(concurrent overwrite/compaction); compaction aborted, " +
                "staged output removed")
            c.initCause(e)
            throw c
          }
          throw e
      }

    beforeCommit()
    val consumed = work.flatMap(_._3).map(_.name).toSet
    swapGeneration(conf, path, consumed, newManifests.toSeq,
      what = "compaction", reclaimConsumed = true, afterStage = afterStage)
    (consumed.size, newManifests.length)
  }

  /** Publish a rewrite generation (shared by [[compact]] and [[delete]]):
    * stamp ONE commit id across the run's bins (a crashed run's stale
    * stage and its committed retry stay distinguishable in the
    * listing-fallback normalizer), write the new manifests first (the
    * commit-marker discipline of [[GraftCommits.publish]]), then ONE OCC
    * index swap replacing exactly `consumed`. A consumed container
    * replaced by a concurrent commit aborts with [[CompactionConflict]]
    * and the staged generation is swept.
    *
    * `reclaimConsumed = true` deletes the consumed generation's files
    * once the new snapshot is live (compaction's documented expire-now
    * semantics); [[delete]] passes false, so retained time-travel
    * snapshots keep reading the pre-delete rows until the generation
    * ages out of retention and [[vacuum]] sweeps it.
    */
  private def swapGeneration(conf: org.apache.hadoop.conf.Configuration,
                             path: String, consumed: Set[String],
                             newManifests: Seq[PartManifest],
                             what: String, reclaimConsumed: Boolean,
                             afterStage: () => Unit): Unit = {
    val commitId = Manifests.newCommitId(conf, path)
    val stamped = newManifests.map(_.copy(commitId = commitId))
    val newJsons = stamped.map(Manifests.manifestJson)
    val newNames = stamped.map(_.name).toSet
    stamped.foreach(m => Manifests.writeManifest(conf, path, m, 0L))
    afterStage()
    try {
      Manifests.commitIndex(conf, path, old => {
        val parsedOld = old.map(Manifests.parseWithFallback)
        val live = parsedOld.map(_.name).toSet
        // A concurrent Manifests.consolidate (end of every engine encode)
        // normalizes the LISTING — where this run's staged manifests
        // already sit as commit markers — and may have ADOPTED some or
        // all of this run's generation into the index, deleting the
        // consumed originals as superseded. Those bins are already
        // committed: a consumed name missing from the snapshot is a
        // genuine conflict only when no adopted bin of THIS run covers
        // its epoch (pre-round-7 this path threw CompactionConflict and
        // the handler deleted index-live compacted blocks — data loss).
        val adopted = parsedOld.filter(m => newNames(m.name))
        val adoptedCover = adopted
          .flatMap(m => m.ancestors ++ m.ancestors.map(Manifests.epochKey))
          .toSet
        val gone = consumed.filterNot(live).filterNot(n =>
          adoptedCover(Manifests.epochKey(Manifests.logicalName(n))))
        if (gone.nonEmpty) throw new CompactionConflict(
          s"containers ${gone.toSeq.sorted.mkString(", ")} were replaced " +
            s"by a concurrent commit during $what of $path; aborting")
        val adoptedNames = adopted.map(_.name).toSet
        old.lazyZip(parsedOld).collect {
          case (j, pm) if !consumed(pm.name) => j
        }.toSeq ++ newJsons.filter(j =>
          !adoptedNames(Manifests.parseWithFallback(j).name))
      })
    } catch {
      case e: CompactionConflict =>
        // drop the staged generation — but ONLY the part the live index
        // does not reference: a racing consolidate may have adopted some
        // bins (see above), and deleting those would orphan index-live
        // rows
        val liveNow = Manifests.readCommitted(conf, path).map(_.name).toSet
        val f = ContainerIO.fs(path, conf)
        newManifests.filterNot(m => liveNow(m.name)).foreach { m =>
          f.delete(new org.apache.hadoop.fs.Path(
            s"$path/blocks/part-${m.name}.gblk"), false)
          f.delete(new org.apache.hadoop.fs.Path(
            Manifests.manifestPath(path, m.name)), false)
        }
        throw e
    }
    if (reclaimConsumed) {
      // new snapshot is live: delete the consumed generation
      val f = ContainerIO.fs(path, conf)
      consumed.foreach { n =>
        f.delete(new org.apache.hadoop.fs.Path(s"$path/blocks/part-$n.gblk"), false)
        f.delete(new org.apache.hadoop.fs.Path(Manifests.manifestPath(path, n)), false)
      }
    }
  }

  /** Copy-on-write row-level DELETE (round 9) — the first operation a
    * real training-data pipeline owner asks for (takedown, dedup-purge):
    * rewrite exactly the containers that MAY hold matching rows, filter
    * the matches out, and swap the generation in ONE OCC index commit.
    *
    * Planning: the predicate (any deterministic Spark SQL boolean
    * expression over the table's columns — no subqueries) is resolved by
    * the ordinary analyzer against the table's current schema; its
    * conjuncts are translated to source filters and run through the SAME
    * admission the scan uses (zone maps, envelopes, null counts, bucket
    * ids, rename translation, add-only-evolution coverage), so
    * containers that provably hold no match are never touched — their
    * manifests, stats, and files stay byte-identical.
    *
    * Rewrite: one Spark task per affected container streams its chunks
    * (CRC + digest verified) through the compaction re-encoder, dropping
    * rows the bound predicate matches. A container where nothing matched
    * keeps its ORIGINAL manifest (the staged rewrite is discarded); a
    * fully-deleted container becomes a zero-row TOMBSTONE manifest (no
    * block file) so its epoch stays ancestor-covered — an epoch replay
    * or listing-fallback recovery can never resurrect the deleted rows.
    *
    * Commit: same OCC discipline as [[compact]] — a concurrent append
    * retries on top and survives; a concurrent commit that REPLACED an
    * affected container aborts with [[CompactionConflict]] and the
    * staged generation is swept. Unlike compact, the consumed
    * generation's files are NOT reclaimed eagerly: retained time-travel
    * snapshots (`versionAsOf`) keep seeing the pre-delete rows until the
    * generation ages out of snapshot retention, after which [[vacuum]]
    * sweeps it (run `CALL graft.system.expire_snapshots` + `vacuum` to
    * purge deleted rows from storage sooner).
    *
    * Streaming interplay: a tailing `readStream` that already emitted an
    * affected container follows the compaction substitution contract —
    * a replay re-emits the KEPT rows from the delete generation (deleted
    * rows are gone everywhere); a delete generation spanning epochs
    * outside a replay range fails loud, exactly like compaction.
    *
    * Returns the number of rows deleted.
    */
  def delete(spark: SparkSession, path: String, predicate: String): Long =
    deleteWithHook(spark, path, predicate, () => ())

  /** Test seams: `beforeCommit` runs after the rewrites are staged but
    * before the swap (the concurrent-append window); `afterStage` runs
    * after the new manifests (commit markers) are written but before the
    * index commit.
    */
  private[graft] def deleteWithHook(spark: SparkSession, path: String,
                                    predicate: String,
                                    beforeCommit: () => Unit,
                                    afterStage: () => Unit = () => ()): Long = {
    import org.apache.spark.sql.catalyst.expressions.{And, Expression, SubqueryExpression}
    val confKv = ContainerIO.confSnapshot(spark)
    val conf = ContainerIO.confFrom(confKv)
    val all = Manifests.readCommitted(conf, path)
    require(all.nonEmpty, s"no graft table at $path")
    val committed = all.filter(m => m.rows > 0 && !m.schemaMarker)
    if (committed.isEmpty) return 0L
    // the FULL positional chain (dropped positions included) drives the
    // positional zips; the predicate resolves against the VISIBLE schema
    val chain = GraftDataSource.currentSpecsOf(all)
    val st = GraftDataSource.schemaOf(chain.filterNot(_.dropped))
    val tableCols = chain.map(_.name)
    // full positions of the visible columns, ascending — a container
    // covers a PREFIX of them (chains are prefix-extensions)
    val visPositions: Seq[Int] =
      chain.zipWithIndex.filterNot(_._1.dropped).map(_._2)

    // resolve through the ordinary analyzer — full Spark SQL
    // expressiveness, name resolution, implicit casts — then bind to
    // positional ordinals for stored-row evaluation in the tasks
    val analyzed = spark.read.format("graft").load(path)
      .filter(org.apache.spark.sql.functions.expr(predicate))
      .queryExecution.analyzed
    val (cond, out) = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        (f.condition, f.child.output)
    }.getOrElse(throw new IllegalArgumentException(
      s"cannot resolve delete predicate '$predicate' against $path"))
    require(cond.deterministic,
      s"delete predicate must be deterministic: $predicate")
    require(!cond.exists(_.isInstanceOf[SubqueryExpression]),
      s"delete predicate must not contain a subquery: $predicate")
    val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(cond, out)

    // container admission: the predicate's conjuncts, translated to
    // source filters and through the scan's decimal/boolean
    // physical-constant translation — untranslatable conjuncts prune
    // nothing (conservative over-approximation of "has matches").
    // Hand-rolled attribute-vs-literal translation (Spark's own
    // DataSourceStrategy.translateFilter is protected[sql]); constants
    // surface as EXTERNAL values, the form pushed filters arrive in.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    val pushed = conjuncts(cond).flatMap(sourceFilterOf)
    val admission = GraftDataSource.translateFilters(pushed.toArray,
      GraftDataSource.decScaleOf(st), GraftDataSource.boolColsOf(st),
      GraftDataSource.f32ColsOf(st)).toSeq
    val defaultNames = GraftDataSource.schema.fieldNames.toSeq
    val affected = committed.filter { m =>
      GraftDataSource.containerFilters(m, admission, tableCols, defaultNames)
        .exists(GraftDataSource.admitManifest(m, _))
    }
    if (affected.isEmpty) return 0L

    val runId = "r" + java.util.UUID.randomUUID().toString.take(7)
    val width = visPositions.size
    // one task per affected container (1:1 rewrite keeps the schema
    // generation, partitioning metadata, and epoch coverage of each);
    // chunk detail hydrates INSIDE the task (driver stays O(containers)).
    // The collect (here and in update/upsert) returns ONE manifest per
    // affected container — bounded metadata, never rows.
    val outs: Array[(String, PartManifest, Long)] =
      try spark.sparkContext.parallelize(affected.zipWithIndex, affected.size)
        .map { case (m0, bin) =>
          val c2 = ContainerIO.confFrom(confKv)
          val m = Manifests.loadChunkIndex(c2, path, m0)
          val storedChain: Seq[(String, Int)] =
            if (m.schemaCols.isEmpty)
              ColumnarEngine.DefaultSchema.map(s => (s.name, s.packed))
            else m.schemaCols
          val schema = storedChain.map { case (n, k) =>
            ColumnSpec.fromPacked(n, k) }
          // the matcher's ordinals are VISIBLE positions; the covered
          // ones form a prefix (full positions are ascending)
          val containerCols = visPositions
            .takeWhile(_ < storedChain.size).map(storedChain)
          val matcher = new StoredRowMatcher(bound, containerCols, width)
          val (pm, dropped) = rewriteBin(c2, path, Seq(m), schema,
            m.digestCol, s"delete-$runId-$bin", bin, drop = matcher)
          if (dropped == 0L) {
            // nothing matched here (admission over-approximates):
            // discard the staged rewrite, the original stays committed
            ContainerIO.fs(path, c2).delete(new org.apache.hadoop.fs.Path(
              s"$path/blocks/part-${pm.name}.gblk"), false)
          }
          (m.name, pm, dropped)
        }
        .collect()
      catch {
        case scala.util.control.NonFatal(e) =>
          // same failure discipline as compact: sweep THIS run's staged
          // containers; surface a vanished source as the controlled
          // conflict shape
          val f = ContainerIO.fs(path, conf)
          ContainerIO.listNames(conf, s"$path/blocks")
            .filter(_.startsWith(s"part-delete-$runId-"))
            .foreach(n => f.delete(
              new org.apache.hadoop.fs.Path(s"$path/blocks/$n"), false))
          def hasFnf(t: Throwable): Boolean =
            t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
              hasFnf(t.getCause))
          if (hasFnf(e)) {
            val c = new CompactionConflict(
              s"a source container of $path vanished during the delete " +
                "rewrite (concurrent overwrite/compaction); delete " +
                "aborted, staged output removed")
            c.initCause(e)
            throw c
          }
          throw e
      }
    val changed = outs.filter(_._3 > 0L)
    if (changed.isEmpty) return 0L
    beforeCommit()
    swapGeneration(conf, path, changed.map(_._1).toSet,
      changed.map(_._2).toSeq, what = s"DELETE WHERE $predicate",
      reclaimConsumed = false, afterStage = afterStage)
    changed.map(_._3).sum
  }

  /** Copy-on-write row-level UPDATE (round 9) — DELETE's sibling on the
    * same machinery: rows matching `predicate` are rewritten with the
    * `set` assignments applied (column -> any deterministic Spark SQL
    * expression over the row's ORIGINAL values, cast to the column's
    * type); everything else about the container is preserved. Planning
    * prunes via the same scan admission as [[delete]]; affected
    * containers rewrite 1:1 at the table's CURRENT schema width (a
    * container predating an added column null-fills it, so an UPDATE can
    * backfill added columns); zero-match rewrites are discarded; the
    * swap is one OCC commit with DELETE's concurrency story (appends
    * survive, replaces abort, retained snapshots keep the pre-update
    * rows, epoch replays substitute the updated generation).
    *
    * Updating a partition-transform source column drops that container's
    * partitioning metadata (recorded bucket-id admission would otherwise
    * prune on stale facts); zone maps re-record from the updated values.
    *
    * Returns the number of rows updated.
    */
  def update(spark: SparkSession, path: String, predicate: String,
             set: Map[String, String]): Long =
    updateWithHook(spark, path, predicate, set, () => ())

  private[graft] def updateWithHook(spark: SparkSession, path: String,
                                    predicate: String,
                                    set: Map[String, String],
                                    beforeCommit: () => Unit): Long = {
    import org.apache.spark.sql.catalyst.expressions.{And, Expression, SubqueryExpression}
    require(set.nonEmpty, "update needs at least one column assignment")
    val confKv = ContainerIO.confSnapshot(spark)
    val conf = ContainerIO.confFrom(confKv)
    val all = Manifests.readCommitted(conf, path)
    require(all.nonEmpty, s"no graft table at $path")
    val committed = all.filter(m => m.rows > 0 && !m.schemaMarker)
    if (committed.isEmpty) return 0L
    val chain = GraftDataSource.currentSpecsOf(all)
    val visible = chain.filterNot(_.dropped)
    val st = GraftDataSource.schemaOf(visible)
    val tableCols = chain.map(_.name)
    val visPositions: Seq[Int] =
      chain.zipWithIndex.filterNot(_._1.dropped).map(_._2)
    set.keys.foreach(c => require(st.fieldNames.contains(c),
      s"update target '$c' is not a column of ${st.fieldNames.mkString(",")}"))

    // resolve the predicate AND the assignments through the analyzer in
    // one pass: a filter over a projection of (assignment expressions
    // cast to their target types), all bound to the relation's output
    val df = spark.read.format("graft").load(path)
    val setSeq = set.toSeq
    val probe = df.select(setSeq.map { case (c, e) =>
        org.apache.spark.sql.functions.expr(e)
          .cast(st(st.fieldIndex(c)).dataType).as(c)
      } :+ org.apache.spark.sql.functions.expr(predicate).as("_pred"): _*)
      .queryExecution.analyzed
    val (projList, out) = probe.collectFirst {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        (p.projectList, p.child.output)
    }.getOrElse(throw new IllegalArgumentException(
      s"cannot resolve update of $path"))
    def bind(e: Expression): Expression = {
      require(e.deterministic, s"update expressions must be deterministic: $e")
      require(!e.exists(_.isInstanceOf[SubqueryExpression]),
        s"update expressions must not contain a subquery: $e")
      org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(e, out)
    }
    import org.apache.spark.sql.catalyst.expressions.Alias
    val boundAssigns: Seq[(Int, Expression)] =
      projList.init.lazyZip(setSeq).map { case (a, (c, _)) =>
        (st.fieldIndex(c), bind(a.asInstanceOf[Alias].child))
      }.toSeq
    val cond = bind(projList.last.asInstanceOf[Alias].child)

    // admission: identical to delete's
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    val pushed = conjuncts(cond).flatMap(sourceFilterOf)
    val admission = GraftDataSource.translateFilters(pushed.toArray,
      GraftDataSource.decScaleOf(st), GraftDataSource.boolColsOf(st),
      GraftDataSource.f32ColsOf(st)).toSeq
    val defaultNames = GraftDataSource.schema.fieldNames.toSeq
    val affected = committed.filter { m =>
      GraftDataSource.containerFilters(m, admission, tableCols, defaultNames)
        .exists(GraftDataSource.admitManifest(m, _))
    }
    if (affected.isEmpty) return 0L

    val runId = "r" + java.util.UUID.randomUUID().toString.take(7)
    val width = visPositions.size
    val chainCols: Seq[(String, Int)] = chain.map(s => (s.name, s.packed))
    val targetOrds = boundAssigns.map(_._1)
    val outs: Array[(String, PartManifest, Long)] =
      try spark.sparkContext.parallelize(affected.zipWithIndex, affected.size)
        .map { case (m0, bin) =>
          val c2 = ContainerIO.confFrom(confKv)
          val m = Manifests.loadChunkIndex(c2, path, m0)
          val storedChain: Seq[(String, Int)] =
            if (m.schemaCols.isEmpty)
              ColumnarEngine.DefaultSchema.map(s => (s.name, s.packed))
            else m.schemaCols
          val containerCols = visPositions
            .takeWhile(_ < storedChain.size).map(storedChain)
          val matcher = new StoredRowMatcher(cond, containerCols, width)
          val (pm, updated) = rewriteUpdate(c2, path, m, chainCols,
            visPositions, matcher, boundAssigns, targetOrds,
            s"update-$runId-$bin", bin)
          if (updated == 0L) {
            ContainerIO.fs(path, c2).delete(new org.apache.hadoop.fs.Path(
              s"$path/blocks/part-${pm.name}.gblk"), false)
          }
          (m.name, pm, updated)
        }
        .collect()
      catch {
        case scala.util.control.NonFatal(e) =>
          val f = ContainerIO.fs(path, conf)
          ContainerIO.listNames(conf, s"$path/blocks")
            .filter(_.startsWith(s"part-update-$runId-"))
            .foreach(n => f.delete(
              new org.apache.hadoop.fs.Path(s"$path/blocks/$n"), false))
          def hasFnf(t: Throwable): Boolean =
            t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
              hasFnf(t.getCause))
          if (hasFnf(e)) {
            val c = new CompactionConflict(
              s"a source container of $path vanished during the update " +
                "rewrite (concurrent overwrite/compaction); update " +
                "aborted, staged output removed")
            c.initCause(e)
            throw c
          }
          throw e
      }
    val changed = outs.filter(_._3 > 0L)
    if (changed.isEmpty) return 0L
    beforeCommit()
    swapGeneration(conf, path, changed.map(_._1).toSet,
      changed.map(_._2).toSeq, what = s"UPDATE WHERE $predicate",
      reclaimConsumed = false, afterStage = () => ())
    changed.map(_._3).sum
  }

  /** Copy-on-write MERGE-style UPSERT (round 9) — the third leg of
    * row-level mutation: the SQL-equivalent of
    * `MERGE INTO target USING source ON <keys> WHEN MATCHED THEN UPDATE
    * SET * WHEN NOT MATCHED THEN INSERT *` (whole-row replace-by-key).
    * `source` must have exactly the table's visible schema; its key
    * tuples must be unique and non-null.
    *
    * Shape: the source's distinct keys collect to the driver and
    * broadcast as a stored-form key set (the broadcast-join MERGE — the
    * common dimension/correction-feed case; a shuffle-join rewrite for
    * arbitrarily large sources is future engine surface). Containers
    * that MAY hold a key (per-column IN admission over zone maps /
    * bucket facts, when the key set is ≤ 4096) rewrite 1:1 dropping the
    * matched rows; the source itself stages as fresh containers through
    * the ordinary write machinery; ONE OCC swap publishes rewrites +
    * appends together — readers never see a state with both (or
    * neither) version of a key. Concurrency, retention, and replay
    * interplay are DELETE's.
    *
    * Returns (rows replaced or deleted from the old generation, rows
    * appended from the source).
    */
  def upsert(spark: SparkSession, path: String,
             source: org.apache.spark.sql.DataFrame,
             keys: Seq[String]): (Long, Long) =
    upsertWithHook(spark, path, source, keys, () => ())

  private[graft] def upsertWithHook(spark: SparkSession, path: String,
                                    source: org.apache.spark.sql.DataFrame,
                                    keys: Seq[String],
                                    beforeCommit: () => Unit): (Long, Long) = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val confKv = ContainerIO.confSnapshot(spark)
    val conf = ContainerIO.confFrom(confKv)
    val all = Manifests.readCommitted(conf, path)
    require(all.nonEmpty, s"no graft table at $path")
    val committed = all.filter(m => m.rows > 0 && !m.schemaMarker)
    val chain = GraftDataSource.currentSpecsOf(all)
    val visible = chain.filterNot(_.dropped)
    val st = GraftDataSource.schemaOf(visible)
    val tableCols = chain.map(_.name)
    val visPositions: Seq[Int] =
      chain.zipWithIndex.filterNot(_._1.dropped).map(_._2)
    // the source must BE the visible schema (same names, kinds, order)
    val srcSpecs = GraftDataSource.specsOf(source.schema)
    require(srcSpecs.map(s => (s.name, s.kind, s.precision, s.scale)) ==
        visible.map(s => (s.name, s.kind, s.precision, s.scale)),
      s"upsert source schema ${source.schema.simpleString} must match " +
        s"the table's ${st.simpleString}")
    keys.foreach(k => require(st.fieldNames.contains(k),
      s"upsert key '$k' is not a column of ${st.fieldNames.mkString(",")}"))
    val keyVis = keys.map(st.fieldIndex)
    keyVis.foreach { v =>
      val kind = visible(v).kind
      require(Set(0, 1, 2, 3, 4, 8, 9)(kind),
        s"upsert key '${visible(v).name}' has unsupported kind $kind " +
          "(float/double/binary/array keys are not comparable-by-value)")
    }

    // the source is read THREE times (count, key collect, staging):
    // persist it for the op so all three see the SAME rows even when
    // the source plan is nondeterministic/non-idempotent (a shuffled
    // sample, a REST-backed view) — otherwise staged rows could carry
    // keys the collected set never saw and a key could end up twice
    val src = source.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try upsertPersisted(spark, path, src, keys, beforeCommit)
    finally { src.unpersist(); () }
  }

  private def upsertPersisted(spark: SparkSession, path: String,
                              source: org.apache.spark.sql.DataFrame,
                              keys: Seq[String],
                              beforeCommit: () => Unit): (Long, Long) = {
    val confKv = ContainerIO.confSnapshot(spark)
    val conf = ContainerIO.confFrom(confKv)
    val all = Manifests.readCommitted(conf, path)
    val committed = all.filter(m => m.rows > 0 && !m.schemaMarker)
    val chain = GraftDataSource.currentSpecsOf(all)
    val visible = chain.filterNot(_.dropped)
    val st = GraftDataSource.schemaOf(visible)
    val tableCols = chain.map(_.name)
    val visPositions: Seq[Int] =
      chain.zipWithIndex.filterNot(_._1.dropped).map(_._2)
    val keyVis = keys.map(st.fieldIndex)

    // distinct external key tuples -> driver; uniqueness is the upsert
    // contract (two source rows with one key would race each other).
    // ONE grouped aggregation answers both questions the old
    // count-then-distinct pair ran as two jobs over the persisted source
    // (round 10): the group rows ARE the distinct keys and the counts sum
    // to the source row count, so the duplicate check is unchanged.
    val keyRows = source
      .groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("_n"))
      .collect()
    val srcCount = keyRows.map(_.getLong(keys.length)).sum
    require(keyRows.length.toLong == srcCount,
      s"upsert source has ${srcCount - keyRows.length} duplicate key rows")
    require(keyRows.forall(r => !r.anyNull), "upsert keys must be non-null")
    def storedKeyOf(x: Any, spec: ColumnSpec): Any = spec.kind match {
      case 0 => x.asInstanceOf[java.lang.Long].longValue()
      case 3 => GraftDataSource.microsOf(x.asInstanceOf[java.time.LocalDateTime])
      case 8 => x.asInstanceOf[java.math.BigDecimal]
        .setScale(spec.scale).unscaledValue().longValueExact()
      case 2 => x.asInstanceOf[java.lang.Integer].intValue()
      case 4 => GraftDataSource.daysOf(x).getOrElse(
        throw new IllegalArgumentException(s"bad DATE key value $x"))
      case 9 => if (x.asInstanceOf[java.lang.Boolean]) 1 else 0
      case _ => x.asInstanceOf[String]
    }
    val keySet: Set[Seq[Any]] = keyRows.map(r =>
      keys.indices.map(i => storedKeyOf(r.get(i), visible(keyVis(i))))).toSet
    val keySetB = spark.sparkContext.broadcast(keySet)

    // container admission: per-column IN over the external key values —
    // implied conjuncts of key membership (zone maps, dicts, bucket
    // facts all apply). Above the IN cap, per-column [min, max] RANGE
    // conjuncts take over (also implied by membership): bounded-size
    // admission at ANY source size, so key-sorted/clustered tables keep
    // pruning whole containers outside the source's key range.
    val admission: Seq[org.apache.spark.sql.sources.Filter] =
      if (keyRows.isEmpty) Nil
      else {
        import org.apache.spark.sql.{sources => sf}
        val raw: Seq[sf.Filter] =
          if (keyRows.length <= 4096)
            keys.indices.map(i =>
              sf.In(keys(i), keyRows.map(_.get(i)).distinct.toArray))
          else keys.indices.flatMap { i =>
            // one Spark type per column, so values are mutually
            // comparable; booleans get no range proof (and need none)
            val vs = keyRows.map(_.get(i))
            def lt(a: Any, b: Any): Boolean = (a, b) match {
              case (x: java.lang.Long, y: java.lang.Long) => x < y
              case (x: java.lang.Integer, y: java.lang.Integer) => x < y
              case (x: String, y: String) => x.compareTo(y) < 0
              case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
                x.compareTo(y) < 0
              case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) =>
                x.isBefore(y)
              case (x: java.sql.Date, y: java.sql.Date) => x.before(y)
              case (x: java.time.LocalDate, y: java.time.LocalDate) =>
                x.isBefore(y)
              case _ => false
            }
            val comparable = vs.head match {
              case _: java.lang.Long | _: java.lang.Integer | _: String |
                   _: java.math.BigDecimal | _: java.time.LocalDateTime |
                   _: java.sql.Date | _: java.time.LocalDate => true
              case _ => false
            }
            if (!comparable) Nil
            else {
              val lo = vs.reduceLeft((a, b) => if (lt(b, a)) b else a)
              val hi = vs.reduceLeft((a, b) => if (lt(a, b)) b else a)
              Seq(sf.GreaterThanOrEqual(keys(i), lo),
                sf.LessThanOrEqual(keys(i), hi))
            }
          }
        GraftDataSource.translateFilters(raw.toArray,
          GraftDataSource.decScaleOf(st), GraftDataSource.boolColsOf(st),
          GraftDataSource.f32ColsOf(st)).toSeq
      }
    val defaultNames = GraftDataSource.schema.fieldNames.toSeq
    val affected =
      if (keyRows.isEmpty) Nil
      else committed.filter { m =>
        GraftDataSource.containerFilters(m, admission, tableCols, defaultNames)
          .exists(GraftDataSource.admitManifest(m, _))
      }

    val runId = "r" + java.util.UUID.randomUUID().toString.take(7)
    val epoch = s"upsert-$runId"
    val chunkRows = ColumnarEngine.ChunkRows
    val fullCols: Seq[(String, Int)] =
      if (chain.exists(_.dropped)) chain.map(s => (s.name, s.packed)) else Nil
    def drainQuietly(f: scala.concurrent.Future[_]): Unit =
      if (f != null)
        try scala.concurrent.Await.ready(f, scala.concurrent.duration.Duration.Inf)
        catch { case scala.util.control.NonFatal(_) => () }
    def sweepStaged(): Unit = {
      val f = ContainerIO.fs(path, conf)
      ContainerIO.listNames(conf, s"$path/blocks")
        .filter(n => n.startsWith(s"part-$epoch-") ||
          n.startsWith(s"part-merge-$runId-"))
        .foreach(n => f.delete(
          new org.apache.hadoop.fs.Path(s"$path/blocks/$n"), false))
    }
    var appendedF: scala.concurrent.Future[Array[PartManifest]] = null
    try {
      // 1) stage the source as fresh containers (attempt-qualified, one
      // new epoch) through the ordinary writer — unpublished until the
      // single swap below. Submitted CONCURRENTLY with the rewrite job in
      // step 2 (guide §2.6 — overlap independent jobs): the two touch
      // disjoint containers and only meet at the single swap, so the
      // rewrite's tasks back-fill cores the staging job leaves idle.
      // Failure handling below AWAITS this future before sweeping staged
      // output, so a crash can never race the sweep against a straggling
      // staging task.
      appendedF = scala.concurrent.Future {
        source.queryExecution.toRdd
          .mapPartitionsWithIndex { (pid, it) =>
            if (it.isEmpty) Iterator.empty
            else {
              // the real task ATTEMPT id (not pid): writeAtomic is
              // first-commit-wins, so a retry after a partial first attempt
              // must stage under a fresh name or the collected manifest can
              // describe different bytes than the committed file — the same
              // failure mode GraftDataWriter's DSv2 path guards against
              val attempt = Option(org.apache.spark.TaskContext.get())
                .map(_.taskAttemptId()).getOrElse(pid.toLong)
              val w = new GraftDataWriter(path, pid, epoch, confKv, chunkRows,
                attempt, st, Nil, fullCols)
              it.foreach(w.write)
              Iterator.single(w.commitManifest())
            }
          }.collect().filter(_.rows > 0)
      }(scala.concurrent.ExecutionContext.global)

      // 2) rewrite the admitted containers, dropping matched keys
      val keyVisSer = keyVis
      val visPosSer = visPositions
      val outs: Array[(String, PartManifest, Long)] =
        if (affected.isEmpty) Array.empty
        else spark.sparkContext.parallelize(affected.zipWithIndex, affected.size)
          .map { case (m0, bin) =>
            val c2 = ContainerIO.confFrom(confKv)
            val m = Manifests.loadChunkIndex(c2, path, m0)
            val storedChain: Seq[(String, Int)] =
              if (m.schemaCols.isEmpty)
                ColumnarEngine.DefaultSchema.map(s => (s.name, s.packed))
              else m.schemaCols
            val keyFull = keyVisSer.map(visPosSer)
            if (keyFull.exists(_ >= storedChain.size))
              // the container predates a key column: all-null keys,
              // nothing can match
              (m.name, null: PartManifest, 0L)
            else {
              val schema = storedChain.map { case (n, k) =>
                ColumnSpec.fromPacked(n, k) }
              val matcher = new StoredKeyMatcher(
                keyFull.map(storedChain), keySetB.value)
              val (pm, dropped) = rewriteBin(c2, path, Seq(m), schema,
                m.digestCol, s"merge-$runId-$bin", bin, drop = matcher)
              if (dropped == 0L) {
                ContainerIO.fs(path, c2).delete(new org.apache.hadoop.fs.Path(
                  s"$path/blocks/part-${pm.name}.gblk"), false)
              }
              (m.name, pm, dropped)
            }
          }.collect()
      val appended = scala.concurrent.Await.result(
        appendedF, scala.concurrent.duration.Duration.Inf)
      val changed = outs.filter(_._3 > 0L)
      if (changed.isEmpty && appended.isEmpty) return (0L, 0L)
      beforeCommit()
      // ONE swap: rewrites replace their originals, appends just land —
      // no reader ever sees a key twice or not at all
      swapGeneration(conf, path, changed.map(_._1).toSet,
        changed.map(_._2).toSeq ++ appended,
        what = s"UPSERT ON ${keys.mkString(",")}",
        reclaimConsumed = false, afterStage = () => ())
      (changed.map(_._3).sum, appended.map(_.rows).sum)
    } catch {
      case e: CompactionConflict =>
        // rewrite-side conflicts sweep their own staging, but the
        // CONCURRENT source staging may still be landing containers:
        // drain it, then sweep (idempotent) so nothing survives the abort
        drainQuietly(appendedF)
        sweepStaged()
        throw e
      case scala.util.control.NonFatal(e) =>
        drainQuietly(appendedF)
        sweepStaged()
        def hasFnf(t: Throwable): Boolean =
          t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
            hasFnf(t.getCause))
        if (hasFnf(e)) {
          val c = new CompactionConflict(
            s"a source container of $path vanished during the upsert " +
              "rewrite (concurrent overwrite/compaction); upsert aborted, " +
              "staged output removed")
          c.initCause(e)
          throw c
        }
        throw e
    } finally keySetB.destroy()
  }

  /** Stream one container through a CURRENT-width re-encoder, applying
    * the bound assignments to matched rows (UPDATE's rewrite). Every row
    * round-trips through the visible internal representation (the same
    * bijective per-kind conversions the matcher and readers use), which
    * also WIDENS containers predating added columns to the current
    * chain — a backfilling UPDATE works on them.
    */
  private def rewriteUpdate(conf: org.apache.hadoop.conf.Configuration,
                            path: String, m: ParsedManifest,
                            chainCols: Seq[(String, Int)],
                            visPositions: Seq[Int],
                            matcher: StoredRowMatcher,
                            assigns: Seq[(Int,
                              org.apache.spark.sql.catalyst.expressions.Expression)],
                            targetOrds: Seq[Int],
                            partName: String, bin: Int): (PartManifest, Long) = {
    val chainSpecs = chainCols.map { case (n, k) => ColumnSpec.fromPacked(n, k) }
    val containerSpecs: Seq[ColumnSpec] =
      if (m.schemaCols.isEmpty) ColumnarEngine.DefaultSchema
      else m.schemaCols.map { case (n, k) => ColumnSpec.fromPacked(n, k) }
    val enc = new ColumnarEngine.PartitionEncoder(bin, path, conf,
      partName = partName, schema = chainSpecs)
    // visible-ordinal -> (lane, laneIdx, spec) routing over the CURRENT
    // chain's live lanes (enc's own order)
    val visSpecs = visPositions.map(chainSpecs)
    val strIdx = scala.collection.mutable.Map.empty[String, Int]
    enc.strNames.zipWithIndex.foreach { case (n, i) => strIdx(n) = i }
    val longIdx = scala.collection.mutable.Map.empty[String, Int]
    enc.longNames.zipWithIndex.foreach { case (n, i) => longIdx(n) = i }
    val binIdx = scala.collection.mutable.Map.empty[String, Int]
    enc.binNames.zipWithIndex.foreach { case (n, i) => binIdx(n) = i }
    val fltIdx = scala.collection.mutable.Map.empty[String, Int]
    enc.fltNames.zipWithIndex.foreach { case (n, i) => fltIdx(n) = i }
    val strs = new Array[String](enc.strNames.length)
    val longs = new Array[Long](enc.longNames.length)
    val binsRow = new Array[Array[Byte]](enc.binNames.length)
    val fltsRow = new Array[Array[Float]](enc.fltNames.length)
    val strNulls = new Array[Boolean](enc.strNames.length)
    val longNulls = new Array[Boolean](enc.longNames.length)
    val binNulls = new Array[Boolean](enc.binNames.length)
    val fltNulls = new Array[Boolean](enc.fltNames.length)
    // read EVERY live column of the container (full rewrite)
    val live = containerSpecs.filterNot(_.dropped)
    val neededL = live.collect {
      case s if s.kind == 0 || s.kind == 3 || s.kind == 8 => s.name }.toSet
    val neededS6 = live.collect {
      case s if s.kind == 1 || s.kind == 6 => s.name }.toSet
    val neededI = live.collect {
      case s if s.kind == 2 || s.kind == 4 || s.kind == 9 ||
        s.kind == 10 => s.name }.toSet
    val neededD = live.collect { case s if s.kind == 5 => s.name }.toSet
    val neededF = live.collect { case s if s.kind == 7 => s.name }.toSet
    val ancestors = Manifests.capAncestors(
      Seq(Manifests.epochKey(Manifests.logicalName(m.name))) ++ m.ancestors)
    // partition-transform metadata survives only when no updated column
    // is one of its source columns (stale bucket-id/range facts would
    // prune wrongly); stored names compared, since the metadata was
    // recorded under them
    val targetStored = targetOrds.map(visPositions).filter(_ < containerSpecs.size)
      .map(fp => containerSpecs(fp).name).toSet
    val keepPart = m.partitioning.nonEmpty &&
      !m.partitioning.exists(p => targetStored.exists(t =>
        p.contains(s"($t)") || p.contains(s",$t)")))
    var updated = 0L
    val file = m.blockFile(path)
    val fs = ContainerIO.fs(file, conf)
    val p = new org.apache.hadoop.fs.Path(file)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val chunks: Iterator[DecodedChunk] =
        if (m.chunkIndex.nonEmpty) m.chunkIndex.iterator.map { cs =>
          val ci = new ContainerInput(in, cs.offset, cs.offset + cs.length)
          ContainerFormat.readChunk(ci, neededL, neededS6, cs.blockCrcs,
            neededI, neededD, neededF)
        } else {
          val ci = new ContainerInput(in, 0L, fileLen)
          ContainerFormat.readPrelude(ci)
          new Iterator[DecodedChunk] {
            override def hasNext: Boolean = !ci.atEnd
            override def next(): DecodedChunk =
              ContainerFormat.readChunk(ci, neededL, neededS6, Map.empty,
                neededI, neededD, neededF)
          }
        }
      chunks.foreach { chunk =>
        if (m.digestCol.nonEmpty)
          ContainerFormat.verifyContentDigest(chunk, m.digestCol)
        var j = 0
        while (j < chunk.rows) {
          val row = matcher.buildRow(chunk, j)
          if (matcher.matchesRow(row)) {
            updated += 1
            // all assignments see the ORIGINAL row: evaluate first,
            // apply after
            val vals = assigns.map(_._2.eval(row))
            assigns.lazyZip(vals).foreach { case ((ord, _), v) =>
              row.update(ord, v)
            }
          }
          // internal row -> encoder lanes, per kind (bijective on
          // stored values; the writer already canonicalized NaN)
          var v = 0
          while (v < visSpecs.length) {
            val s = visSpecs(v)
            val x = row.values(v)
            if (x == null) {
              require(s.nullable, s"update produced NULL for " +
                s"non-nullable column '${s.name}'")
              s.kind match {
                case 1 => strNulls(strIdx(s.name)) = true
                  strs(strIdx(s.name)) = null
                case 6 => binNulls(binIdx(s.name)) = true
                  binsRow(binIdx(s.name)) = null
                case 7 => fltNulls(fltIdx(s.name)) = true
                  fltsRow(fltIdx(s.name)) = null
                case _ => longNulls(longIdx(s.name)) = true
                  longs(longIdx(s.name)) = 0L
              }
            } else s.kind match {
              case 1 =>
                strNulls(strIdx(s.name)) = false
                strs(strIdx(s.name)) =
                  x.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
              case 6 =>
                binNulls(binIdx(s.name)) = false
                binsRow(binIdx(s.name)) = x.asInstanceOf[Array[Byte]]
              case 7 =>
                fltNulls(fltIdx(s.name)) = false
                fltsRow(fltIdx(s.name)) = x
                  .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
                  .toFloatArray()
              case k =>
                longNulls(longIdx(s.name)) = false
                longs(longIdx(s.name)) = k match {
                  case 0 | 3 => x.asInstanceOf[Long]
                  case 2 | 4 => x.asInstanceOf[Int].toLong
                  case 5 => graft.codecs.DoubleBits
                    .toSortableLong(x.asInstanceOf[Double])
                  case 8 => x.asInstanceOf[org.apache.spark.sql.types.Decimal]
                    .toUnscaledLong
                  case 9 => if (x.asInstanceOf[Boolean]) 1L else 0L
                  case 10 => graft.codecs.FloatBits
                    .toSortableInt(x.asInstanceOf[Float]).toLong
                  case other => throw new IllegalStateException(
                    s"unknown column kind $other for '${s.name}'")
                }
            }
            v += 1
          }
          enc.addRow(strs, longs, binsRow, fltsRow, strNulls, longNulls,
            binNulls, fltNulls)
          j += 1
        }
      }
    } finally in.close()
    (enc.finish(publishManifest = false).copy(ancestors = ancestors,
      partitioning = if (keepPart) m.partitioning else Nil,
      bucketIds =
        if (keepPart) m.bucketIds.map { case (k, v) => k -> v.toSeq.sorted }
        else Map.empty), updated)
  }

  /** Conservative Catalyst-expression -> source-Filter translation for
    * DELETE's container admission: attribute-vs-literal comparisons, IN,
    * IS [NOT] NULL, and AND/OR compositions translate; anything else
    * (casts around the attribute, functions, UDFs) returns None and the
    * conjunct simply prunes nothing. Literal constants convert to their
    * EXTERNAL representation ([[CatalystTypeConverters.convertToScala]])
    * — String / BigDecimal / LocalDateTime / Date — the exact form the
    * scan's pushed filters arrive in, so the admission machinery
    * ([[GraftDataSource.translateFilters]] + zone maps) applies
    * unchanged.
    */
  private def sourceFilterOf(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.{sources => sf}
    import org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala
    def ext(l: ce.Literal): Any = convertToScala(l.value, l.dataType)
    e match {
      case ce.EqualTo(a: ce.AttributeReference, l: ce.Literal) if l.value != null =>
        Some(sf.EqualTo(a.name, ext(l)))
      case ce.EqualTo(l: ce.Literal, a: ce.AttributeReference) if l.value != null =>
        Some(sf.EqualTo(a.name, ext(l)))
      case ce.GreaterThan(a: ce.AttributeReference, l: ce.Literal) if l.value != null =>
        Some(sf.GreaterThan(a.name, ext(l)))
      case ce.GreaterThan(l: ce.Literal, a: ce.AttributeReference) if l.value != null =>
        Some(sf.LessThan(a.name, ext(l)))
      case ce.GreaterThanOrEqual(a: ce.AttributeReference, l: ce.Literal) if l.value != null =>
        Some(sf.GreaterThanOrEqual(a.name, ext(l)))
      case ce.GreaterThanOrEqual(l: ce.Literal, a: ce.AttributeReference) if l.value != null =>
        Some(sf.LessThanOrEqual(a.name, ext(l)))
      case ce.LessThan(a: ce.AttributeReference, l: ce.Literal) if l.value != null =>
        Some(sf.LessThan(a.name, ext(l)))
      case ce.LessThan(l: ce.Literal, a: ce.AttributeReference) if l.value != null =>
        Some(sf.GreaterThan(a.name, ext(l)))
      case ce.LessThanOrEqual(a: ce.AttributeReference, l: ce.Literal) if l.value != null =>
        Some(sf.LessThanOrEqual(a.name, ext(l)))
      case ce.LessThanOrEqual(l: ce.Literal, a: ce.AttributeReference) if l.value != null =>
        Some(sf.GreaterThanOrEqual(a.name, ext(l)))
      case ce.In(a: ce.AttributeReference, vs)
          if vs.nonEmpty && vs.forall(v =>
            v.isInstanceOf[ce.Literal] && v.asInstanceOf[ce.Literal].value != null) =>
        Some(sf.In(a.name, vs.map(v => ext(v.asInstanceOf[ce.Literal])).toArray))
      case ce.IsNull(a: ce.AttributeReference) => Some(sf.IsNull(a.name))
      case ce.IsNotNull(a: ce.AttributeReference) => Some(sf.IsNotNull(a.name))
      case ce.And(l, r) =>
        for { lf <- sourceFilterOf(l); rf <- sourceFilterOf(r) }
          yield sf.And(lf, rf)
      case ce.Or(l, r) =>
        for { lf <- sourceFilterOf(l); rf <- sourceFilterOf(r) }
          yield sf.Or(lf, rf)
      case _ => None
    }
  }

  /** Rename a column (round 8). Field identity is POSITIONAL under the
    * add-only invariant, so a rename is pure metadata: one zero-row
    * SCHEMA MARKER manifest carrying the full current schema with the
    * new label commits through the ordinary OCC path (real commit
    * marker file — the listing fallback preserves it; compaction never
    * consumes zero-row manifests, so the marker outlives folds).
    * Current-name resolution takes the highest-commitId plain manifest
    * per position, so every committed container keeps its historical
    * labels and readers translate per container — old snapshots time-
    * travel under their old names, new filters/pushdowns use the new
    * one. A concurrent rename/append that changed the column loses with
    * [[SchemaEvolutionConflict]] inside the OCC transform.
    */
  def renameColumn(spark: SparkSession, path: String,
                   from: String, to: String): Unit =
    renameColumnWithHook(spark, path, from, to, () => ())

  /** Test seam: `beforeCommit` runs after the marker (with its first
    * candidate commitId) is staged but before the index commit — the
    * window a concurrent append races into (advice r8: its higher
    * commitId under the OLD label must not out-rank the marker).
    */
  private[graft] def renameColumnWithHook(spark: SparkSession, path: String,
                   from: String, to: String,
                   beforeCommit: () => Unit): Unit = {
    require(to.nonEmpty && to != from, s"bad rename target '$to'")
    schemaMarkerCommit(spark, path, beforeCommit,
      mutate = current => {
        val idx = current.indexWhere(_.name == from)
        require(idx >= 0,
          s"no column '$from' in ${current.map(_.name).mkString(",")}")
        require(!current.exists(_.name == to),
          s"column '$to' already exists in ${current.map(_.name).mkString(",")}")
        current.updated(idx, current(idx).copy(name = to))
      },
      recheck = (cur, idx) =>
        if (idx >= cur.size || cur(idx).name != from ||
            cur.exists(_.name == to))
          throw new SchemaEvolutionConflict(
            s"concurrent schema change on $path: cannot rename '$from' -> " +
              s"'$to' (current columns: ${cur.map(_.name).mkString(",")})"))
  }

  /** Drop a column (round 9). Field identity is POSITIONAL, so a drop is
    * pure metadata like a rename: a zero-row schema marker flags the
    * position DROPPED ([[graft.engine.ColumnSpec.DroppedFlag]]) and
    * relabels it with a reserved tombstone name. The position stays in
    * every manifest's chain — committed containers keep their data and
    * labels (retained snapshots time-travel to it) — but the current
    * schema projects it out: readers never request its blocks, appends
    * supply only the visible columns (the writer re-interleaves the
    * tombstone into the manifests' chain), and a LATER append may re-add
    * the same name as a fresh trailing position. Compaction preserves
    * the tombstone (compacted generations never label-resolve over plain
    * markers). A concurrent rename/append that changed the column loses
    * with [[SchemaEvolutionConflict]].
    */
  def dropColumn(spark: SparkSession, path: String, col: String): Unit =
    dropColumnWithHook(spark, path, col, () => ())

  private[graft] def dropColumnWithHook(spark: SparkSession, path: String,
                   col: String, beforeCommit: () => Unit): Unit =
    schemaMarkerCommit(spark, path, beforeCommit,
      mutate = current => {
        val idx = current.indexWhere(s => s.name == col && !s.dropped)
        require(idx >= 0,
          s"no column '$col' in ${current.filterNot(_.dropped)
            .map(_.name).mkString(",")}")
        require(current.count(s => !s.dropped) > 1,
          s"cannot drop '$col': it is the table's last visible column")
        val tomb = s"_dropped_p${idx}_" +
          java.util.UUID.randomUUID().toString.take(8)
        current.updated(idx, current(idx).copy(name = tomb, dropped = true))
      },
      recheck = (cur, idx) =>
        if (idx >= cur.size || cur(idx).name != col || cur(idx).dropped)
          throw new SchemaEvolutionConflict(
            s"concurrent schema change on $path: cannot drop '$col' " +
              s"(current columns: ${cur.filterNot(_.dropped)
                .map(_.name).mkString(",")})"))

  /** Shared zero-row schema-marker commit (rename, drop): `mutate`
    * produces the marker's chain from the current one (its single
    * changed position is re-validated by `recheck` against the snapshot
    * the OCC commit actually lands on).
    */
  private def schemaMarkerCommit(spark: SparkSession, path: String,
                   beforeCommit: () => Unit,
                   mutate: Seq[ColumnSpec] => Seq[ColumnSpec],
                   recheck: (Seq[ColumnSpec], Int) => Unit): Unit = {
    val conf = ContainerIO.confFrom(ContainerIO.confSnapshot(spark))
    val committed = Manifests.readCommitted(conf, path)
    require(committed.nonEmpty, s"no graft table at $path")
    val current = GraftDataSource.currentSpecsOf(committed)
    val mutated = mutate(current)
    val idx = current.indices.find(i => current(i) != mutated(i)).getOrElse(0)
    def mkMarker(commitId: String): PartManifest =
      PartManifest(part = 0, rows = 0L, chunks = 0,
        rawBytes = 0L, encodedBytes = 0L, skipped = false, digest = "",
        columns = Nil, name = s"schemamarker-$commitId-0",
        schemaCols = mutated.map(s => (s.name, s.packed)), digestCol = "",
        commitId = commitId, schemaMarker = true)
    var marker = mkMarker(Manifests.newCommitId(conf, path))
    Manifests.writeManifest(conf, path, marker, 0L)
    beforeCommit()
    try Manifests.commitIndex(conf, path, old => {
      // re-check against the snapshot this commit actually lands on
      val parsedOld = old.map(Manifests.parseWithFallback)
      val cur = GraftDataSource.currentSpecsOf(parsedOld)
      recheck(cur, idx)
      // last-commit-wins label resolution: the marker must outrank
      // EVERY manifest in the snapshot this commit actually lands on.
      // An append that committed between our newCommitId and here
      // carries a HIGHER id under the OLD label, and the rename would
      // report success but be silently reverted (round-8 advice,
      // medium). Regenerate above the snapshot's max — re-checked on
      // every OCC retry, each of which sees a fresher snapshot —
      // writing the new marker BEFORE the index commit keeps the
      // commit-marker-first discipline; the outranked marker file is
      // removed so it can't confuse the listing fallback.
      val maxPrefix = parsedOld.iterator
        .map(_.commitId.takeWhile(_.isDigit))
        .filter(f => f.nonEmpty && f.length <= 17)
        .map(_.toLong).maxOption.getOrElse(0L)
      val myPrefix = marker.commitId.takeWhile(_.isDigit).toLong
      if (myPrefix <= maxPrefix) {
        val stale = marker
        val id = f"${math.max(maxPrefix + 1,
          System.currentTimeMillis())}%013d-" +
          java.util.UUID.randomUUID().toString.take(8)
        marker = mkMarker(id)
        Manifests.writeManifest(conf, path, marker, 0L)
        ContainerIO.fs(path, conf).delete(new org.apache.hadoop.fs.Path(
          Manifests.manifestPath(path, stale.name)), false)
      }
      old :+ Manifests.manifestJson(marker)
    })
    catch {
      case e: SchemaEvolutionConflict =>
        ContainerIO.fs(path, conf).delete(new org.apache.hadoop.fs.Path(
          Manifests.manifestPath(path, marker.name)), false)
        throw e
    }
  }

  /** Remove UNREACHABLE files from a table directory: block containers
    * no committed manifest references (staged output of crashed or
    * zombie write attempts — invisible to every read path, but never
    * deleted when the job dies before its `abort` hook runs) and
    * leftover `.tmp-*` upload fragments. Only files older than
    * `graceMs` are touched — and the grace window must EXCEED the
    * longest write job this table can see: a large batch write's staged
    * containers are unreferenced from staging until JOB commit, so a
    * too-short grace deletes a slow job's output out from under its
    * commit (Iceberg's orphan-file procedure defaults to 3 days for
    * the same reason; so does this). Manifest files without an index
    * entry are NOT removed — they are the commit markers that
    * listing-fallback reads (mid-encode resume) depend on.
    *
    * Returns the number of files deleted.
    */
  def vacuum(spark: SparkSession, path: String,
             graceMs: Long = 72L * 60 * 60 * 1000,
             dryRun: Boolean = false): Int = {
    require(graceMs >= 0, s"graceMs must be >= 0: $graceMs")
    val conf = ContainerIO.confSnapshot(spark)
    val c = ContainerIO.confFrom(conf)
    // referenced = EVERY retained index snapshot (time travel keeps the
    // last SnapshotRetention versions readable — a block only an older
    // retained snapshot references must survive the sweep) UNION the
    // manifests/ listing: a mid-resume engine encode has per-partition
    // manifests the (stale) index doesn't know yet — their blocks are
    // committed data, not orphans
    val committedMs = Manifests.readCommitted(c, path)
    val committedNames = committedMs.map(_.name) ++
      Manifests.retainedSnapshotNames(c, path)
    val committedRefs = committedNames.toSet
    // SUPERSEDED generations (round 9): a delete keeps the consumed
    // generation's files so retained snapshots still time-travel to the
    // pre-delete rows. Once no current or retained snapshot references
    // such a container AND its epoch is ancestor-covered by a live
    // manifest (its surviving rows provably live there — the delete/
    // compaction coverage invariant), its lingering commit marker and
    // block are reclaimable. This is the delete-purge tail:
    // `delete` → `expire_snapshots` → `vacuum` removes deleted rows
    // from storage. Without a live index nothing is judged (disaster
    // recovery keeps everything).
    val indexLive = Manifests.readIndexSnapshot(c, path).isDefined
    val ancestorCover = committedMs
      .flatMap(m => m.ancestors ++ m.ancestors.map(Manifests.epochKey)).toSet
    def superseded(n: String): Boolean = indexLive && !committedRefs(n) &&
      ancestorCover(Manifests.epochKey(Manifests.logicalName(n)))
    val listedNames = ContainerIO.listNames(c, s"$path/manifests")
      .filter(n => n.startsWith("part-") && n.endsWith(".json"))
      .map(_.stripPrefix("part-").stripSuffix(".json"))
      .filterNot(superseded)
    val referenced =
      (committedNames ++ listedNames).map(n => s"part-$n.gblk").toSet
    val fs = ContainerIO.fs(path, c)
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    def sweep(dir: String, doomed: String => Boolean): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) return
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && st.getModificationTime < cutoff &&
            (n.startsWith(".tmp-") || doomed(n))) {
          if (dryRun) deleted += 1
          else if (fs.delete(st.getPath, false)) deleted += 1
        }
      }
    }
    sweep(s"$path/blocks", n => n.endsWith(".gblk") && !referenced(n))
    // Orphan SCHEMA MARKERS (round-8 advice, low): a renameColumn that
    // crashed between its marker write and its index commit leaves a
    // marker file the listing fallback would wrongly treat as a
    // committed rename. When a live index exists and neither the
    // current snapshot nor any retained one references the marker, it
    // is the stage of a failed rename — swept once aged. Data-container
    // manifests stay untouched (they are the commit markers mid-encode
    // resume depends on), and without any index nothing is judged
    // (disaster recovery keeps every marker).
    sweep(s"$path/manifests", n => indexLive &&
      n.startsWith("part-") && n.endsWith(".json") && {
        val base = n.stripPrefix("part-").stripSuffix(".json")
        (n.startsWith("part-schemamarker-") && !committedRefs(base)) ||
          // superseded-generation commit markers (see above): swept so
          // the listing fallback can never resurrect a generation whose
          // blocks this run reclaims
          superseded(base)
      })
    deleted
  }

  /** Expire retained time-travel snapshots now (see
    * [[Manifests.expireSnapshots]]): keep the newest `retainLast`
    * content-bearing versions (the current tip counts), optionally only
    * expiring versions older than `olderThanMs`. Returns the number of
    * versions expired. The rolling per-commit retention is configurable
    * via the `graft.snapshot.retention` Hadoop/Spark configuration key
    * (default ${Manifests.SnapshotRetention}).
    */
  def expireSnapshots(spark: SparkSession, path: String, retainLast: Long,
                      olderThanMs: Long = 0L): Int =
    Manifests.expireSnapshots(
      ContainerIO.confFrom(ContainerIO.confSnapshot(spark)), path,
      retainLast, olderThanMs)

  /** Stream one bin's containers chunk-by-chunk (CRC + digest verified)
    * into a fresh encoder under an unpublished manifest. Task memory is
    * bounded by one decoded chunk plus one encoder chunk buffer.
    * `drop` (the copy-on-write DELETE path) filters matched rows out of
    * the rewrite; the second return is how many rows were dropped.
    */
  private def rewriteBin(conf: org.apache.hadoop.conf.Configuration,
                         path: String, ms: Seq[ParsedManifest],
                         schema: Seq[ColumnSpec], digestCol: String,
                         partName: String, bin: Int,
                         drop: RowDropper = null): (PartManifest, Long) = {
    val enc = new ColumnarEngine.PartitionEncoder(bin, path, conf,
      partName = partName, schema = schema)
    // EPOCH identities folded into this container — with those the
    // sources themselves carried (a compaction of compactions): lets
    // publish() drop a replayed epoch whose rows live here, regardless
    // of the replay's partition count
    val ancestors = Manifests.capAncestors(
      ms.map(m => Manifests.epochKey(Manifests.logicalName(m.name))) ++
        ms.flatMap(_.ancestors))
    // dropped positions (round 9) hold no data: request no block, read
    // no lane (the encoder's own lanes are live-filtered the same way)
    val liveSchema = schema.filterNot(_.dropped)
    val neededL = liveSchema.collect {
      case s if s.kind == 0 || s.kind == 3 || s.kind == 8 => s.name }.toSet
    val neededS = liveSchema.collect { case s if s.kind == 1 => s.name }.toSet
    val neededI = liveSchema.collect {
      case s if s.kind == 2 || s.kind == 4 || s.kind == 9 ||
        s.kind == 10 => s.name }.toSet
    val neededD = liveSchema.collect { case s if s.kind == 5 => s.name }.toSet
    // kind 6 (binary) decodes into the byte-slice (str) map
    val neededS6 = neededS ++ liveSchema.collect { case s if s.kind == 6 => s.name }
    val neededF = liveSchema.collect { case s if s.kind == 7 => s.name }.toSet
    val numKind: Array[Int] =
      liveSchema.filter(s => s.kind != 1 && s.kind != 6 && s.kind != 7)
        .map(_.kind).toArray
    val strNames = enc.strNames
    val longNames = enc.longNames
    val binNames = enc.binNames
    val fltNames = enc.fltNames
    // null masks reused per row (addRow reads them synchronously); only
    // nullable schemas pay for them — and they must be PROPAGATED here or
    // compaction would silently turn NULLs into their stored placeholders
    val anyNullable = liveSchema.exists(_.nullable)
    val strNulls = if (anyNullable) new Array[Boolean](strNames.length) else null
    val longNulls = if (anyNullable) new Array[Boolean](longNames.length) else null
    val binNulls = if (anyNullable) new Array[Boolean](binNames.length) else null
    val fltNulls = if (anyNullable) new Array[Boolean](fltNames.length) else null
    var dropped = 0L
    ms.foreach { m =>
      val file = m.blockFile(path)
      val fs = ContainerIO.fs(file, conf)
      val p = new org.apache.hadoop.fs.Path(file)
      val fileLen = fs.getFileStatus(p).getLen
      val in = fs.open(p)
      try {
        val chunks: Iterator[DecodedChunk] =
          if (m.chunkIndex.nonEmpty) m.chunkIndex.iterator.map { cs =>
            val ci = new ContainerInput(in, cs.offset, cs.offset + cs.length)
            ContainerFormat.readChunk(ci, neededL, neededS6, cs.blockCrcs,
              neededI, neededD, neededF)
          } else {
            val ci = new ContainerInput(in, 0L, fileLen)
            ContainerFormat.readPrelude(ci)
            new Iterator[DecodedChunk] {
              override def hasNext: Boolean = !ci.atEnd
              override def next(): DecodedChunk =
                ContainerFormat.readChunk(ci, neededL, neededS6, Map.empty,
                  neededI, neededD, neededF)
            }
          }
        chunks.foreach { chunk =>
          if (digestCol.nonEmpty) ContainerFormat.verifyContentDigest(chunk, digestCol)
          val strCols = strNames.map(n => chunk.strs.get(n).strings)
          var j = 0
          while (j < chunk.rows) {
            if (drop != null && drop.matches(chunk, j)) { dropped += 1; j += 1 }
            else {
            val strs = new Array[String](strNames.length)
            var i = 0
            while (i < strNames.length) {
              if (anyNullable) strNulls(i) = !chunk.validAt(strNames(i), j)
              strs(i) = strCols(i)(j)
              i += 1
            }
            val longs = new Array[Long](longNames.length)
            i = 0
            while (i < longNames.length) {
              if (anyNullable) longNulls(i) = !chunk.validAt(longNames(i), j)
              longs(i) = numKind(i) match {
                // booleans (kind 9) decode into the int lane as 0/1;
                // floats (kind 10) pass their sortable bits through
                case 2 | 4 | 9 | 10 => chunk.ints.get(longNames(i))(j).toLong
                // back to the sortable-long storage form (bijective on
                // stored values: the writer already canonicalized NaN)
                case 5 => graft.codecs.DoubleBits.toSortableLong(
                  chunk.doubles.get(longNames(i))(j))
                // kind 8 (decimal unscaled) passes through the long lane
                case _ => chunk.longs.get(longNames(i))(j)
              }
              i += 1
            }
            val binsRow = new Array[Array[Byte]](binNames.length)
            i = 0
            while (i < binNames.length) {
              if (anyNullable) binNulls(i) = !chunk.validAt(binNames(i), j)
              val u = chunk.strs.get(binNames(i))
              binsRow(i) = java.util.Arrays.copyOfRange(
                u.pool, u.offsets(j), u.offsets(j) + u.lens(j))
              i += 1
            }
            val fltsRow = new Array[Array[Float]](fltNames.length)
            i = 0
            while (i < fltNames.length) {
              if (anyNullable) fltNulls(i) = !chunk.validAt(fltNames(i), j)
              fltsRow(i) = chunk.flts.get(fltNames(i)).slice(j)
              i += 1
            }
            enc.addRow(strs, longs, binsRow, fltsRow, strNulls, longNulls,
              binNulls, fltNulls)
            j += 1
            }
          }
        }
      } finally in.close()
    }
    // partition-transform metadata survives compaction CONSERVATIVELY:
    // identical declared transforms across all sources are kept, and a
    // bucket column's id set is the union — only when EVERY source
    // recorded one (absence = no proof = no pruning, never wrong)
    val partitioning =
      if (ms.nonEmpty && ms.forall(_.partitioning == ms.head.partitioning))
        ms.head.partitioning
      else Nil
    val bucketIds: Map[String, Seq[Int]] =
      if (partitioning.isEmpty) Map.empty
      else ms.head.bucketIds.keySet
        .filter(c => ms.forall(_.bucketIds.contains(c)))
        .map(c => c -> ms.flatMap(_.bucketIds(c)).distinct.sorted)
        .toMap
    (enc.finish(publishManifest = false).copy(ancestors = ancestors,
      partitioning = partitioning, bucketIds = bucketIds), dropped)
  }
}

/** A row-removal decision over decoded stored rows — the hook
  * [[GraftMaintenance]]'s rewrite streams matched rows through
  * (predicate DELETE, key-set upsert).
  */
private[sources] trait RowDropper extends Serializable {
  def matches(chunk: graft.engine.DecodedChunk, j: Int): Boolean
}

/** Key-set membership over decoded STORED rows (the upsert matcher): a
  * row matches when its key tuple — each component normalized to the
  * stored representation (unscaled/micros/days/0-1) — is in `keySet`.
  * Rows with a NULL key component never match (SQL join semantics).
  */
private[sources] final class StoredKeyMatcher(
    keyCols: Seq[(String, Int)], keySet: Set[Seq[Any]]) extends RowDropper {
  import graft.engine.DecodedChunk

  @transient private lazy val getters: Array[(DecodedChunk, Int) => Any] =
    keyCols.toArray.map { case (n0, packed) =>
      val s = graft.engine.ColumnSpec.fromPacked(n0, packed)
      val n = s.name
      val get: (DecodedChunk, Int) => Any = s.kind match {
        case 0 | 3 | 8 => (c, j) => c.longs.get(n)(j)
        case 2 | 4 | 9 => (c, j) => c.ints.get(n)(j)
        case 1 => (c, j) => c.strs.get(n).string(j)
        case other => throw new IllegalStateException(
          s"unsupported upsert key kind $other for '$n'")
      }
      if (s.nullable) (c: DecodedChunk, j: Int) =>
        if (c.validAt(n, j)) get(c, j) else null
      else get
    }

  def matches(chunk: DecodedChunk, j: Int): Boolean = {
    val t = new Array[Any](getters.length)
    var i = 0
    while (i < getters.length) {
      val v = getters(i)(chunk, j)
      if (v == null) return false
      t(i) = v
      i += 1
    }
    keySet.contains(t.toSeq)
  }
}

/** Evaluates a Catalyst predicate — resolved against the table's CURRENT
  * schema and bound to positional ordinals — on decoded STORED rows of
  * one container (the copy-on-write DELETE row filter). Positions the
  * container covers are surfaced in Spark's internal representation per
  * kind (micros/days for temporals, unscaled [[Decimal]], UTF8String
  * slices over the decoded pool — no String materialization); positions
  * past the container's width (add-only evolution) stay null, matching
  * the reader's null-fill. Ships to tasks with the bound expression;
  * the generated predicate and per-column getters build lazily on the
  * executor.
  */
private[sources] final class StoredRowMatcher(
    bound: org.apache.spark.sql.catalyst.expressions.Expression,
    containerCols: Seq[(String, Int)], width: Int) extends RowDropper {
  import graft.engine.DecodedChunk

  @transient private lazy val pred = {
    val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(bound)
    p.initialize(0)
    p
  }

  @transient private lazy val getters: Array[(DecodedChunk, Int) => Any] =
    containerCols.toArray.map { case (n0, packed) =>
      val s = graft.engine.ColumnSpec.fromPacked(n0, packed)
      val n = s.name
      val get: (DecodedChunk, Int) => Any = s.kind match {
        case 0 | 3 => (c, j) => c.longs.get(n)(j)
        case 2 | 4 => (c, j) => c.ints.get(n)(j)
        case 5 => (c, j) => c.doubles.get(n)(j)
        case 8 => (c, j) => org.apache.spark.sql.types.Decimal
          .createUnsafe(c.longs.get(n)(j), s.precision, s.scale)
        case 9 => (c, j) => c.ints.get(n)(j) != 0
        case 10 => (c, j) => java.lang.Float.valueOf(
          graft.codecs.FloatBits.fromSortableInt(c.ints.get(n)(j)))
        case 1 => (c, j) => {
          val u = c.strs.get(n)
          org.apache.spark.unsafe.types.UTF8String
            .fromBytes(u.pool, u.offsets(j), u.lens(j))
        }
        case 6 => (c, j) => {
          val u = c.strs.get(n)
          java.util.Arrays.copyOfRange(u.pool, u.offsets(j),
            u.offsets(j) + u.lens(j))
        }
        case 7 => (c, j) => org.apache.spark.sql.catalyst.expressions
          .UnsafeArrayData.fromPrimitiveArray(c.flts.get(n).slice(j))
        case other => throw new IllegalStateException(
          s"unknown column kind $other for '$n'")
      }
      if (s.nullable) (c: DecodedChunk, j: Int) =>
        if (c.validAt(n, j)) get(c, j) else null
      else get
    }

  /** The row in the CURRENT visible schema's internal representation:
    * covered positions from the decoded chunk, the rest null.
    */
  def buildRow(chunk: DecodedChunk, j: Int):
      org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(width)
    var i = 0
    while (i < getters.length) { row.update(i, getters(i)(chunk, j)); i += 1 }
    row
  }

  def matches(chunk: DecodedChunk, j: Int): Boolean =
    pred.eval(buildRow(chunk, j))

  def matchesRow(row: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    pred.eval(row)
}
