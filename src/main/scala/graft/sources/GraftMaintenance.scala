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
    // imperative rewrite)
    // hydrate chunk detail for exactly the containers being consumed
    // (index entries are summary-only since round 8); the rewrite tasks
    // need per-chunk offsets + CRCs for verified streaming
    val hydratedWork = work.map { case (s, d, ms) =>
      (s, d, ms.map(Manifests.loadChunkIndex(conf, path, _)))
    }
    val newManifests: Array[PartManifest] =
      try spark.sparkContext
        .parallelize(hydratedWork.zipWithIndex, hydratedWork.size)
        .map { case ((schemaCols, digestCol, ms), bin) =>
          val schema =
            if (schemaCols.isEmpty) ColumnarEngine.DefaultSchema
            else schemaCols.map { case (n, k) => ColumnSpec.fromPacked(n, k) }
          rewriteBin(ContainerIO.confFrom(confKv), path, ms, schema,
            digestCol, s"compact-$runId-$bin", bin)
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
    // one commit-generation stamp across the run's bins: a crashed
    // compaction's stale stage and its committed retry are then
    // distinguishable by the listing-fallback normalizer
    val commitId = Manifests.newCommitId(conf, path)
    val stamped = newManifests.map(_.copy(commitId = commitId))
    val newJsons = stamped.map(Manifests.manifestJson).toSeq
    val newNames = stamped.map(_.name).toSet
    // publish discipline of GraftCommits.publish: manifests (commit
    // markers) first, then the OCC snapshot swap, then old-file deletes
    stamped.foreach(m => Manifests.writeManifest(conf, path, m, 0L))
    afterStage()
    try {
      Manifests.commitIndex(conf, path, old => {
        val parsedOld = old.map(Manifests.parseWithFallback)
        val live = parsedOld.map(_.name).toSet
        // A concurrent Manifests.consolidate (end of every engine encode)
        // normalizes the LISTING — where this run's staged manifests
        // already sit as commit markers — and may have ADOPTED some or
        // all of this run's compacted generation into the index, deleting
        // the consumed originals as superseded. Those bins are already
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
            s"by a concurrent commit during compaction of $path; aborting")
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
    // new snapshot is live: delete the consumed generation
    val f = ContainerIO.fs(path, conf)
    consumed.foreach { n =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/blocks/part-$n.gblk"), false)
      f.delete(new org.apache.hadoop.fs.Path(Manifests.manifestPath(path, n)), false)
    }
    (consumed.size, newManifests.length)
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
    val conf = ContainerIO.confFrom(ContainerIO.confSnapshot(spark))
    val committed = Manifests.readCommitted(conf, path)
    require(committed.nonEmpty, s"no graft table at $path")
    val current = GraftDataSource.currentSpecsOf(committed)
    val idx = current.indexWhere(_.name == from)
    require(idx >= 0,
      s"no column '$from' in ${current.map(_.name).mkString(",")}")
    require(!current.exists(_.name == to),
      s"column '$to' already exists in ${current.map(_.name).mkString(",")}")
    val renamed = current.updated(idx, current(idx).copy(name = to))
    def mkMarker(commitId: String): PartManifest =
      PartManifest(part = 0, rows = 0L, chunks = 0,
        rawBytes = 0L, encodedBytes = 0L, skipped = false, digest = "",
        columns = Nil, name = s"schemamarker-$commitId-0",
        schemaCols = renamed.map(s => (s.name, s.packed)), digestCol = "",
        commitId = commitId, schemaMarker = true)
    var marker = mkMarker(Manifests.newCommitId(conf, path))
    Manifests.writeManifest(conf, path, marker, 0L)
    beforeCommit()
    try Manifests.commitIndex(conf, path, old => {
      // re-check against the snapshot this commit actually lands on
      val parsedOld = old.map(Manifests.parseWithFallback)
      val cur = GraftDataSource.currentSpecsOf(parsedOld)
      if (idx >= cur.size || cur(idx).name != from ||
          cur.exists(_.name == to))
        throw new SchemaEvolutionConflict(
          s"concurrent schema change on $path: cannot rename '$from' -> " +
            s"'$to' (current columns: ${cur.map(_.name).mkString(",")})")
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
    val committedNames = Manifests.readCommitted(c, path).map(_.name) ++
      Manifests.retainedSnapshotNames(c, path)
    val listedNames = ContainerIO.listNames(c, s"$path/manifests")
      .filter(n => n.startsWith("part-") && n.endsWith(".json"))
      .map(_.stripPrefix("part-").stripSuffix(".json"))
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
    val indexLive = Manifests.readIndexSnapshot(c, path).isDefined
    val committedSet = committedNames.toSet
    sweep(s"$path/manifests", n => indexLive &&
      n.startsWith("part-schemamarker-") && n.endsWith(".json") &&
      !committedSet(n.stripPrefix("part-").stripSuffix(".json")))
    deleted
  }

  /** Stream one bin's containers chunk-by-chunk (CRC + digest verified)
    * into a fresh encoder under an unpublished manifest. Task memory is
    * bounded by one decoded chunk plus one encoder chunk buffer.
    */
  private def rewriteBin(conf: org.apache.hadoop.conf.Configuration,
                         path: String, ms: Seq[ParsedManifest],
                         schema: Seq[ColumnSpec], digestCol: String,
                         partName: String, bin: Int): PartManifest = {
    val enc = new ColumnarEngine.PartitionEncoder(bin, path, conf,
      partName = partName, schema = schema)
    // EPOCH identities folded into this container — with those the
    // sources themselves carried (a compaction of compactions): lets
    // publish() drop a replayed epoch whose rows live here, regardless
    // of the replay's partition count
    val ancestors = Manifests.capAncestors(
      ms.map(m => Manifests.epochKey(Manifests.logicalName(m.name))) ++
        ms.flatMap(_.ancestors))
    val neededL = schema.collect {
      case s if s.kind == 0 || s.kind == 3 || s.kind == 8 => s.name }.toSet
    val neededS = schema.collect { case s if s.kind == 1 => s.name }.toSet
    val neededI = schema.collect {
      case s if s.kind == 2 || s.kind == 4 || s.kind == 9 => s.name }.toSet
    val neededD = schema.collect { case s if s.kind == 5 => s.name }.toSet
    // kind 6 (binary) decodes into the byte-slice (str) map
    val neededS6 = neededS ++ schema.collect { case s if s.kind == 6 => s.name }
    val neededF = schema.collect { case s if s.kind == 7 => s.name }.toSet
    val numKind: Array[Int] =
      schema.filter(s => s.kind != 1 && s.kind != 6 && s.kind != 7)
        .map(_.kind).toArray
    val strNames = enc.strNames
    val longNames = enc.longNames
    val binNames = enc.binNames
    val fltNames = enc.fltNames
    // null masks reused per row (addRow reads them synchronously); only
    // nullable schemas pay for them — and they must be PROPAGATED here or
    // compaction would silently turn NULLs into their stored placeholders
    val anyNullable = schema.exists(_.nullable)
    val strNulls = if (anyNullable) new Array[Boolean](strNames.length) else null
    val longNulls = if (anyNullable) new Array[Boolean](longNames.length) else null
    val binNulls = if (anyNullable) new Array[Boolean](binNames.length) else null
    val fltNulls = if (anyNullable) new Array[Boolean](fltNames.length) else null
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
                // booleans (kind 9) decode into the int lane as 0/1
                case 2 | 4 | 9 => chunk.ints.get(longNames(i))(j).toLong
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
    enc.finish(publishManifest = false).copy(ancestors = ancestors,
      partitioning = partitioning, bucketIds = bucketIds)
  }
}
