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
  *  - `nullCounts`:  column -> number of NULL rows in the chunk, recorded
  *                   for every NULLABLE column (0 included — the explicit
  *                   zero is what makes `IS NULL` pruning proof-based: an
  *                   ABSENT entry means "written before null counts" and
  *                   must admit). `IS NOT NULL` skips all-null chunks
  *                   (count == rows); `IS NULL` skips fully-present ones
  *                   (count == 0).
  */
final case class ChunkStats(
    offset: Long, length: Long, rows: Int,
    longRanges: Map[String, (Long, Long)],
    strDicts: Map[String, Seq[String]],
    strRanges: Map[String, (String, String)],
    blockCrcs: Map[String, Long],
    nullCounts: Map[String, Int] = Map.empty)

/** Container-level fold of the per-chunk statistics — the GROUP SUMMARY
  * of the two-level metadata tree (round 8). An entry appears only when
  * EVERY chunk of the container carries the underlying stat, so each
  * field keeps the same proof discipline as its per-chunk original:
  *
  *  - `strRanges`:  column -> (min, max) over all chunks, present iff
  *                  every chunk recorded an all-ASCII range — the
  *                  collation-agreement proof string MIN/MAX pushdown
  *                  and group-level string pruning need.
  *  - `strDicts`:   column -> union of the chunk dicts, present iff
  *                  every chunk has one and the union stays small.
  *  - `nullCounts`: column -> total NULL rows, present iff every chunk
  *                  has an entry (explicit zeros included) — feeds
  *                  COUNT(col) pushdown and IS [NOT] NULL group skip.
  */
final case class ManifestEnvelope(
    strRanges: Map[String, (String, String)] = Map.empty,
    strDicts: Map[String, Seq[String]] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty)

object ManifestEnvelope {
  /** Max recorded union-dict size: past this the dict stops pruning
    * meaningfully and only bloats the index entry.
    */
  final val DictCap = 64

  def fromChunks(chunks: Seq[ChunkStats]): ManifestEnvelope = {
    if (chunks.isEmpty) return ManifestEnvelope()
    val h = chunks.head
    val sr = h.strRanges.keySet
      .filter(c => chunks.forall(_.strRanges.contains(c)))
      .map { c =>
        val rs = chunks.map(_.strRanges(c))
        c -> (rs.map(_._1).min, rs.map(_._2).max)
      }.toMap
    val sd = h.strDicts.keySet
      .filter(c => chunks.forall(_.strDicts.contains(c)))
      .flatMap { c =>
        val u = chunks.flatMap(_.strDicts(c)).distinct.sorted
        if (u.size <= DictCap) Some(c -> u) else None
      }.toMap
    val nc = h.nullCounts.keySet
      .filter(c => chunks.forall(_.nullCounts.contains(c)))
      .map(c => c -> chunks.iterator.map(_.nullCounts(c).toLong).sum)
      .toMap
    ManifestEnvelope(sr, sd, nc)
  }
}

/** Driver-side view of one committed partition manifest. `schemaCols`
  * is (name, kind 0=long/1=string) in table order — empty for legacy
  * (pre-round-5) manifests, which are always the engine's
  * [[ColumnarEngine.DefaultSchema]]; `digestCol` names the string column
  * whose per-row sha256 feeds the chunk digests ("" = none).
  *
  * Two-level metadata (round 8): entries read from the consolidated
  * index carry `chunksElided = true` — their per-chunk stats were
  * stripped at index commit (the index stays O(containers), not
  * O(chunks)) and replaced by the container-level [[ManifestEnvelope]].
  * Planning prunes whole containers against the envelope first and
  * hydrates per-chunk detail ([[Manifests.loadChunkIndex]], one read of
  * the container's own `manifests/part-<name>.json`) only for
  * containers the summary admits.
  */
final case class ParsedManifest(
    name: String, part: Int, rows: Long, chunks: Int,
    rawBytes: Long, encodedBytes: Long, digest: String,
    longRanges: Map[String, (Long, Long)],
    chunkIndex: Seq[ChunkStats],
    schemaCols: Seq[(String, Int)] = Nil,
    digestCol: String = "content",
    ancestors: Seq[String] = Nil,
    commitId: String = "",
    commitParts: Int = 0,
    chunksElided: Boolean = false,
    storedEnvelope: Option[ManifestEnvelope] = None,
    partitioning: Seq[String] = Nil,
    bucketIds: Map[String, Set[Int]] = Map.empty,
    schemaMarker: Boolean = false) {
  def blockFile(tableDir: String): String = s"$tableDir/blocks/part-$name.gblk"

  /** Does this container HAVE a chunk index (inline or elided)? False
    * only for legacy whole-container-stream manifests.
    */
  def hasChunkIndex: Boolean = chunksElided || chunkIndex.nonEmpty

  /** Container-level stats fold: the stored summary when elided, else
    * computed from the inline chunk index (identical by construction).
    */
  lazy val env: ManifestEnvelope =
    storedEnvelope.getOrElse(ManifestEnvelope.fromChunks(chunkIndex))
}

/** Manifest + manifest-index IO.
  *
  * The manifest is the partition's COMMIT MARKER: a container file in
  * `blocks/` without a matching `manifests/part-<name>.json` is an orphan
  * from a failed attempt and must be invisible to every read path (scan,
  * statistics, aggregate pushdown all plan from manifests, never from a
  * blocks listing).
  *
  * `_manifest-index.v<N>.json` is a consolidated snapshot of every
  * committed manifest, published at job commit so query planning is ONE
  * file read instead of O(partitions) sequential round trips (at 10^5
  * partitions the per-file listing costs minutes of driver time per
  * query). Snapshots are VERSIONED and committed with optimistic
  * concurrency ([[commitIndex]]): each commit claims version N+1 via an
  * atomic create-if-absent and retries on top of any winner, so
  * concurrent appends — two batch jobs, or a streaming-sink epoch next
  * to a batch append — can never drop each other's manifests (round 4's
  * single-file read-modify-write could). Readers take the highest
  * version, fall back to the legacy unversioned `_manifest-index.json`
  * (pre-round-5 tables), then to listing `manifests/` (mid-encode resume
  * reads). At true 10^12-file scale the snapshot itself would be
  * sharded/partitioned Iceberg-style; one file per snapshot is right up
  * to ~10^5 partitions.
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

  /** Logical partition identity of a (staged) container name: the
    * attempt-qualifying `-a<taskId>` suffix stripped (a replayed epoch
    * or task retry re-stages the same logical name under a new attempt).
    */
  def logicalName(n: String): String = n.replaceFirst("-a\\d+$", "")

  /** Epoch (job / micro-batch) identity of a logical name: the trailing
    * partition ordinal stripped — `q-e5-3` and `q-e5-0` are the same
    * epoch `q-e5`. Replay protection across compaction works at THIS
    * granularity: a replay may re-partition differently, so matching
    * per-container names would only drop part of it.
    */
  def epochKey(logical: String): String = logical.replaceFirst("-\\d+$", "")

  /** Cap on recorded ancestor epoch keys per manifest. Replay depth is
    * bounded by the sink's uncommitted window (one or two epochs), so
    * trimming ancient ancestors can only re-open a replay that Spark
    * can no longer issue; the cap just bounds manifest size over a
    * table's lifetime.
    */
  final val MaxAncestors = 65536

  private val EpochNumRe = """.*-e(\d+)$""".r

  /** Sorted, deduplicated, capped ancestor list: when over the cap,
    * the LOWEST-numbered `-e<N>` epochs are trimmed first (only recent
    * epochs can still be replayed); non-numbered keys (batch job ids)
    * are preferred for retention over trimming-order guesses.
    */
  def capAncestors(anc: Seq[String]): Seq[String] = {
    val s = anc.distinct.sorted
    if (s.size <= MaxAncestors) s
    else {
      val (numbered, rest) = s.partition {
        case EpochNumRe(_) => true
        case _ => false
      }
      if (rest.size >= MaxAncestors)
        // no age order exists for job-id keys: the trim is lexical and
        // best-effort (a replay of a trimmed ancient job re-appends) —
        // reachable only past 65536 distinct compacted batch jobs
        rest.sorted.takeRight(MaxAncestors)
      else {
        val keepNumbered = numbered
          .sortBy { case EpochNumRe(e) => e.toLong; case _ => 0L }
          .takeRight(MaxAncestors - rest.size)
        (rest ++ keepNumbered).sorted
      }
    }
  }

  /** Monotone commit-generation stamp: every manifest landed by one
    * `publish`/`compact` call carries the same id, so the fallback
    * normalizer below can select WHOLE generations instead of mixing
    * containers of two generations of the same epoch (which may
    * partition the same rows differently).
    *
    * Monotonicity is PER TABLE, not per clock: the leading numeric field
    * is `max(max committed predecessor's field + 1, currentTimeMillis)`,
    * so a logically newer generation always orders lexically above every
    * generation visible when it was created — even when the committing
    * driver's wall clock runs BEHIND the previous committer's (streaming
    * restart on another machine, maintenance run elsewhere). Pure wall
    * clock (pre-round-7) let a skewed-back clock stamp a newer
    * generation lexically older, and consolidate's `commitId < maxKept`
    * cleanup would then permanently delete the newer generation in the
    * crash-window case.
    */
  def newCommitId(conf: Configuration, tableDir: String): String = {
    // only the commitId field matters here, and stampCommit always
    // serializes it FIRST — extract by prefix instead of building a
    // full JSON tree per manifest on the commit hot path (the index
    // snapshot is parsed again by commitIndex moments later anyway)
    def idOf(j: String): String =
      if (j.startsWith("{\"commitId\":\"")) {
        val s = 13
        val e = j.indexOf('"', s)
        if (e > s) j.substring(s, e) else ""
      } else if (!j.contains("\"commitId\"")) "" // unstamped (engine encode)
      else parseWithFallback(j).commitId // non-canonical order: full parse
    val prev = readCommittedJsons(conf, tableDir).iterator
      .map(j => idOf(j).takeWhile(_.isDigit))
      .filter(f => f.nonEmpty && f.length <= 17)
      .map(_.toLong).maxOption.getOrElse(0L)
    f"${math.max(prev + 1, System.currentTimeMillis())}%013d-" +
      java.util.UUID.randomUUID().toString.take(8)
  }

  /** Inject a commitId into a writer-produced manifest JSON (publish
    * stamps at commit time; the writers that serialize the manifest
    * can't know it).
    */
  def stampCommitId(json: String, id: String): String = {
    require(json.startsWith("{"), "manifest JSON must be an object")
    s"""{"commitId":${q(id)},""" + json.substring(1)
  }

  /** As [[stampCommitId]], also recording how many containers this
    * epoch's generation consists of — the fallback normalizer's
    * COMPLETENESS check (a publish that crashed mid-way through its
    * manifest-file writes leaves a partial newer generation, which must
    * never beat the complete committed one).
    */
  def stampCommit(json: String, id: String, epochParts: Int): String = {
    require(json.startsWith("{"), "manifest JSON must be an object")
    s"""{"commitId":${q(id)},"commitParts":$epochParts,""" + json.substring(1)
  }

  /** Normalize a `manifests/` LISTING into a consistent snapshot. The
    * versioned index is the authority; the listing is the fallback
    * (legacy tables, mid-encode resume, disaster recovery) and can
    * contain stale commit markers from crash windows — a publish or
    * compaction that died between its index commit and its cleanup
    * deletes. Resurrecting those doubles rows, so:
    *
    *  1. among PLAIN manifests (no ancestors) sharing an epoch, only
    *     the newest commit generation is kept — an epoch replay may
    *     re-partition the same rows, so whole generations are selected,
    *     never mixed;
    *  2. COMPACTED manifests (non-empty `ancestors` = exactly the
    *     epochs whose rows they hold) are taken newest-commit-first,
    *     dropping any whose ancestors intersect epochs already covered
    *     (a crashed compaction's stage, or the one it superseded);
    *  3. plain manifests whose epoch is covered by a kept compacted
    *     generation are dropped (their rows live in it).
    */
  private[engine] def normalizeFallback(jsons: Seq[String]): Seq[String] = {
    val parsed = jsons.map(parseWithFallback)
    if (parsed.forall(_.ancestors.isEmpty) &&
        parsed.map(m => epochKey(logicalName(m.name))).distinct.size ==
          parsed.size) return jsons // common shape: nothing to normalize
    val pairs = jsons.lazyZip(parsed).toSeq
    val (compacts, plain) = pairs.partition(_._2.ancestors.nonEmpty)
    // newest COMPLETE generation per plain epoch: a generation whose
    // recorded commitParts exceeds the manifests present is a publish
    // that crashed mid-stage — it must never beat the complete
    // committed generation below it (commitParts 0 = legacy/unknown,
    // treated as complete)
    val keptPlain = plain.groupBy(p => epochKey(logicalName(p._2.name)))
      .values.flatMap { group =>
        val gens = group.groupBy(_._2.commitId).toSeq
          .sortBy(_._1)(Ordering.String.reverse)
        def complete(g: Seq[(String, ParsedManifest)]): Boolean = {
          val want = g.map(_._2.commitParts).max
          want == 0 || g.size >= want
        }
        // NO complete generation at all = every generation of this epoch
        // is a publish that crashed mid-manifest-writes: surface NOTHING
        // rather than promote a partial epoch into the authoritative
        // index (a crashed publish is retried by its job/stream anyway)
        gens.find(g => complete(g._2)).map(_._2).getOrElse(Nil)
      }.toSeq
    // compacted generations, newest first, no overlapping coverage.
    // Coverage keys include epochKey of each stored ancestor so
    // manifests written when ancestors were per-container logical
    // names (pre-commit-generation format) still match
    var covered = Set.empty[String]
    val keptCompacts = compacts
      .sortBy(p => (p._2.commitId, p._2.name))(Ordering.Tuple2(
        Ordering.String.reverse, Ordering.String.reverse))
      .filter { p =>
        val anc = p._2.ancestors.toSet
        val ancKeys = anc ++ anc.map(epochKey)
        if ((ancKeys & covered).nonEmpty) false
        else { covered ++= ancKeys; true }
      }
    val out = keptCompacts ++
      keptPlain.filterNot(p => covered.contains(epochKey(logicalName(p._2.name))))
    // preserve listing order for deterministic index bodies
    val keep = out.map(_._2.name).toSet
    pairs.collect { case (j, pm) if keep(pm.name) => j }
  }

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
    // omitted entirely for non-nullable schemas (no bytes spent); nullable
    // columns always carry an entry, including explicit zeros (see class doc)
    val nulls =
      if (c.nullCounts.isEmpty) ""
      else c.nullCounts.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:$v" }
        .mkString(""","nullCounts":{""", ",", "}")
    s"""{"offset":${c.offset},"length":${c.length},"rows":${c.rows},""" +
      s""""longRanges":${longPairs(c.longRanges)},"strDicts":$dicts,""" +
      s""""strRanges":$sranges,"blockCrcs":$crcs$nulls}"""
  }

  def manifestJson(m: PartManifest): String = {
    val cols = m.columns.map(c =>
      s"""{"column":${q(c.column)},"codec":${q(c.codec)},"rawBytes":${c.rawBytes},""" +
      s""""encodedBytes":${c.encodedBytes},"minVal":${c.minVal},"maxVal":${c.maxVal},""" +
      s""""hasRange":${c.hasRange}}"""
    ).mkString("[", ",", "]")
    val chunks = m.chunkIndex.map(chunkJson).mkString("[", ",", "]")
    val schema = m.schemaCols.map { case (n, k) =>
      s"""{"name":${q(n)},"kind":$k}"""
    }.mkString("[", ",", "]")
    // ancestors: EPOCH keys this container compacted away (exactly the
    // epochs whose rows it holds) — publish() uses them to drop a
    // replayed epoch whole (exactly-once across compact), and the
    // listing-fallback normalizer uses them as the coverage set
    val anc =
      if (m.ancestors.isEmpty) ""
      else s""""ancestors":${m.ancestors.map(q).mkString("[", ",", "]")},"""
    val cid =
      if (m.commitId.isEmpty) ""
      else s""""commitId":${q(m.commitId)},"""
    // partition transforms (round 8): the write's declared transforms
    // and, for bucket(n, col) transforms, the container's OBSERVED
    // bucket ids — coarse container elimination for point filters on
    // the bucket column (zone maps can't help there: hash-colliding
    // values span the domain)
    val pt =
      if (m.partitioning.isEmpty) ""
      else s""""partitioning":${m.partitioning.map(q).mkString("[", ",", "]")},"""
    // a SCHEMA MARKER is a zero-row manifest whose only payload is its
    // schema: a column RENAME commits one through the ordinary OCC path
    // (real commit marker file, so the listing fallback preserves it),
    // and current-name resolution takes the highest-commitId schema per
    // position (round 8, field-identity-by-position under add-only)
    val sm = if (m.schemaMarker) s""""schemaMarker":true,""" else ""
    val bids =
      if (m.bucketIds.isEmpty) ""
      else m.bucketIds.toSeq.sortBy(_._1).map { case (c, ids) =>
        s"${q(c)}:${ids.sorted.mkString("[", ",", "]")}"
      }.mkString(""""bucketIds":{""", ",", "},")
    s"""{$cid"part":${m.part},"name":${q(m.name)},"rows":${m.rows},"chunks":${m.chunks},""" +
      s""""rawBytes":${m.rawBytes},"encodedBytes":${m.encodedBytes},""" +
      s""""digest":${q(m.digest)},"schema":$schema,"digestCol":${q(m.digestCol)},$anc$pt$bids$sm""" +
      s""""columns":$cols,"chunkIndex":$chunks}"""
  }

  /** Publish one manifest (the partition's commit marker) atomically. */
  def writeManifest(conf: Configuration, tableDir: String, m: PartManifest,
                    attempt: Long): Unit =
    ContainerIO.writeAtomic(conf,
      s"$tableDir/manifests/.tmp-part-${m.name}-a$attempt",
      manifestPath(tableDir, m.name),
      manifestJson(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Consolidate every committed manifest currently in `manifests/` into
    * the index (end of an engine encode job, including resumed runs).
    */
  def consolidate(conf: Configuration, tableDir: String): Unit = {
    // the listing MUST be taken inside the transform: each OCC retry
    // re-lists, so a concurrent publish's just-committed manifests are
    // in the snapshot this commit lands on top of (hoisting the listing
    // out of the loop would re-commit a stale pre-race view and drop
    // the concurrent writer's rows from the index)
    commitIndex(conf, tableDir,
      _ => normalizeFallback(listedManifestJsons(conf, tableDir)))
    // cleanup pass: stale generations the normalizer proves superseded
    // would otherwise leak forever (vacuum spares manifests/ and counts
    // their blocks as referenced). Only generations OLDER than every
    // kept commit are deleted — a NEWER partial generation may belong
    // to an in-flight publish whose index commit is imminent (its rows
    // are index-served either way; at worst it leaks until the next
    // consolidate after a genuinely newer commit).
    val listed = listedManifestJsons(conf, tableDir)
    val parsed = listed.map(parseWithFallback)
    val keptNames = normalizeFallback(listed).map(parseWithFallback(_).name).toSet
    val maxKept = parsed.filter(m => keptNames(m.name))
      .map(_.commitId).maxOption.getOrElse("")
    val fs = ContainerIO.fs(tableDir, conf)
    parsed.filterNot(m => keptNames(m.name))
      .filter(_.commitId < maxKept)
      .foreach { m =>
        fs.delete(new org.apache.hadoop.fs.Path(
          manifestPath(tableDir, m.name)), false)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$tableDir/blocks/part-${m.name}.gblk"), false)
      }
  }

  private val VersionedIndexRe = """_manifest-index\.v(\d+)\.json""".r

  private[engine] def versionedIndexes(conf: Configuration,
                                       tableDir: String): Seq[(Long, String)] =
    ContainerIO.listNames(conf, tableDir).collect {
      case n @ VersionedIndexRe(v) => (v.toLong, n)
    }.sortBy(_._1)

  /** Strip a manifest JSON's per-chunk stats for the consolidated index
    * (two-level metadata, round 8): `chunkIndex` is replaced by
    * `"chunksElided":true` plus the container-level [[ManifestEnvelope]].
    * The full detail stays in the container's own commit marker
    * (`manifests/part-<name>.json`), which planning reads lazily for
    * admitted containers only. Idempotent; legacy manifests without a
    * chunk index pass through unchanged (their absence of an index is
    * itself load-bearing: it means whole-container streaming).
    */
  private[engine] def elideChunks(json: String): String = {
    val om = new ObjectMapper()
    val root = om.readTree(json)
    if (!root.isObject) return json
    val obj = root.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val ci = obj.get("chunkIndex")
    if (ci == null || !ci.isArray || ci.isEmpty) return json
    val chunks = ci.elements().asScala.map(parseChunk).toSeq
    val envl = ManifestEnvelope.fromChunks(chunks)
    obj.remove("chunkIndex")
    obj.put("chunksElided", true)
    val e = om.createObjectNode()
    val sr = e.putObject("strRanges")
    envl.strRanges.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
      val a = sr.putArray(c); a.add(lo); a.add(hi)
    }
    val sd = e.putObject("strDicts")
    envl.strDicts.toSeq.sortBy(_._1).foreach { case (c, vs) =>
      val a = sd.putArray(c); vs.foreach(a.add)
    }
    val nc = e.putObject("nullCounts")
    envl.nullCounts.toSeq.sortBy(_._1).foreach { case (c, n) => nc.put(c, n) }
    obj.set("envelope", e)
    om.writeValueAsString(obj)
  }

  /** Hydrate an index-elided manifest's per-chunk stats from its own
    * commit marker file. A marker that vanished means a concurrent
    * compaction/overwrite superseded the snapshot this plan was built
    * on: surface the controlled retriable error, never a raw
    * FileNotFoundException. No-op for manifests already carrying their
    * chunk index.
    */
  def loadChunkIndex(conf: Configuration, tableDir: String,
                     m: ParsedManifest): ParsedManifest =
    if (!m.chunksElided) m
    else {
      chunkLoadCounter.incrementAndGet()
      val p = manifestPath(tableDir, m.name)
      val full =
        try parseWithFallback(new String(ContainerIO.readAll(conf, p),
          java.nio.charset.StandardCharsets.UTF_8))
        catch {
          case e: java.io.FileNotFoundException =>
            throw new IllegalStateException(
              s"graft snapshot superseded: manifest $p was removed by a " +
                "concurrent compaction/overwrite since planning; retry " +
                "the query", e)
        }
      m.copy(chunkIndex = full.chunkIndex, chunksElided = false,
        storedEnvelope = None)
    }

  /** Observability seam: per-process count of manifest-marker hydration
    * reads — the planning test proving group-level skip asserts bytes
    * read scale with ADMITTED containers, not table size.
    */
  val chunkLoadCounter = new java.util.concurrent.atomic.AtomicLong()

  private def indexBody(manifestJsons: Seq[String]): Array[Byte] =
    manifestJsons.map(elideChunks)
      .mkString("""{"version":1,"manifests":[""", ",", "]}")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def parseIndexJsons(bytes: Array[Byte]): Seq[String] = {
    val om = new ObjectMapper()
    val root = om.readTree(new String(bytes,
      java.nio.charset.StandardCharsets.UTF_8))
    val arr = root.get("manifests")
    if (arr == null || !arr.isArray) Nil
    else arr.elements().asScala.map(_.toString).toSeq
  }

  /** Highest LIVE committed index snapshot: (version, manifest JSONs).
    * Superseded versions are TOMBSTONED (truncated to zero bytes, see
    * [[commitIndex]]) — a tombstone at the top of a stale listing, a
    * vanished file, or a mid-truncation read all retry against a fresh
    * listing. Version -1 is the legacy unversioned
    * `_manifest-index.json` (pre-round-5 tables); `None` means no index
    * exists and callers fall back to listing `manifests/`.
    */
  def readIndexSnapshot(conf: Configuration,
                        tableDir: String): Option[(Long, Seq[String])] = {
    // generous retry budget: under heavy commit contention a reader's
    // stale listing can lose the open-vs-GC race several times in a row
    var tries = 0
    while (tries < 64) {
      versionedIndexes(conf, tableDir).lastOption match {
        case None =>
          val legacy = indexPath(tableDir)
          if (!ContainerIO.exists(conf, legacy)) return None
          try {
            val bytes = ContainerIO.readAll(conf, legacy)
            if (bytes.nonEmpty) return Some((-1L, parseIndexJsons(bytes)))
            tries += 1
          } catch {
            case _: java.io.FileNotFoundException => tries += 1
            // status said non-empty but the read hit the truncation: a
            // concurrent tombstone landed mid-read — retry fresh
            case _: java.io.EOFException => tries += 1
            case e: com.fasterxml.jackson.core.JacksonException =>
              throw new IllegalArgumentException(
                s"corrupt manifest index $legacy", e)
          }
        case Some((v, name)) =>
          try {
            val bytes = ContainerIO.readAll(conf, s"$tableDir/$name")
            // empty = we raced a commit that just tombstoned this
            // version (max moved past it between our listing and read)
            if (bytes.nonEmpty) return Some((v, parseIndexJsons(bytes)))
            tries += 1
          } catch {
            case _: java.io.FileNotFoundException => tries += 1
            // status said non-empty but the read hit the truncation: a
            // concurrent tombstone landed mid-read — retry fresh
            case _: java.io.EOFException => tries += 1
            case e: com.fasterxml.jackson.core.JacksonException =>
              // persistent corruption is a CONTROLLED failure (the fuzz
              // contract), not a raw parser exception
              throw new IllegalArgumentException(
                s"corrupt manifest index $tableDir/$name", e)
          }
      }
    }
    throw new java.io.IOException(
      s"manifest index for $tableDir kept vanishing mid-read")
  }

  /** How many superseded TOMBSTONED version claims stay behind the
    * current snapshot before their 0-byte files are finally deleted.
    * A tombstone pins its version number so no commit can ever re-claim
    * it; deleting one is safe only once no committer could still be
    * inside a read-snapshot→create window that old — 1024 full commit
    * cycles inside one such window is the documented impossibility
    * envelope.
    */
  final val TombstoneRetention = 1024L

  /** How many superseded index versions keep their CONTENT (not just
    * their tombstoned number): the snapshot time-travel window. A
    * `versionAsOf` read inside the window sees exactly the table that
    * version committed; older versions fail with the controlled
    * "not retained" error. Retained snapshots also extend vacuum's
    * referenced set, so blocks only they reference survive the sweep.
    * Time travel is GUARANTEED across appends; a generation that a
    * later overwrite / epoch replay / compaction replaced is reclaimed
    * eagerly by that commit (Iceberg-expire-now semantics), and a
    * retained snapshot referencing it fails retriable-loud at read.
    */
  final val SnapshotRetention = 8L

  /** The rolling retention actually applied at commit time: the
    * `graft.snapshot.retention` configuration key (settable per session
    * via `spark.hadoop.graft.snapshot.retention`, or per table by the
    * caller's Configuration) overrides the [[SnapshotRetention]] default.
    * For one-off reclamation beyond the rolling policy — the Iceberg
    * `expire_snapshots` shape — see [[expireSnapshots]] /
    * `CALL graft.system.expire_snapshots`.
    */
  def snapshotRetention(conf: Configuration): Long =
    math.max(0L, conf.getLong("graft.snapshot.retention", SnapshotRetention))

  /** Expire retained time-travel snapshots NOW (round 9): truncate the
    * content of superseded index versions beyond `retainLast` (the tip
    * counts as one of the retained), optionally only those older than
    * `olderThanMs`. An expired version keeps its tombstoned file (the
    * number stays pinned — see [[commitIndex]]) but reads of it fail
    * with the controlled "no longer retained" error, and [[vacuum]]'s
    * referenced set stops protecting the blocks only it referenced —
    * the delete-purge path: `delete` → `expire_snapshots` → `vacuum`
    * removes deleted rows from storage.
    *
    * Returns the number of versions expired.
    */
  def expireSnapshots(conf: Configuration, tableDir: String,
                      retainLast: Long,
                      olderThanMs: Long = 0L): Int = {
    require(retainLast >= 1,
      s"retain_last must be >= 1 (the current snapshot is never expired): " +
        s"$retainLast")
    require(olderThanMs >= 0, s"older_than_ms must be >= 0: $olderThanMs")
    val f = ContainerIO.fs(tableDir, conf)
    val now = System.currentTimeMillis()
    // rank content-bearing versions, newest first; the newest retainLast
    // stay (the tip is by construction among them)
    val withContent = versionedIndexes(conf, tableDir).flatMap { case (v, n) =>
      val p = new org.apache.hadoop.fs.Path(s"$tableDir/$n")
      try {
        val st = f.getFileStatus(p)
        if (st.getLen > 0) Some((v, p, st.getModificationTime)) else None
      } catch { case _: java.io.FileNotFoundException => None }
    }.sortBy(-_._1)
    var expired = 0
    withContent.drop(retainLast.toInt).foreach { case (_, p, mtime) =>
      if (mtime <= now - olderThanMs) {
        // truncate, never delete: the version number stays pinned
        try { f.create(p, true).close(); expired += 1 }
        catch { case _: java.io.IOException => () }
      }
    }
    expired
  }

  /** Optimistic-concurrency commit of a new index snapshot (the Iceberg
    * shape): read the current snapshot, apply `transform`, and publish it
    * as `_manifest-index.v<current + 1>.json` via an ATOMIC
    * create-if-absent ([[ContainerIO.createExclusive]]). A concurrent
    * commit that claimed the same version makes the create fail, and this
    * commit re-reads and retries on top of the winner — so two
    * simultaneous appends (or a streaming-sink epoch racing a batch
    * append) both land; round 4's read-modify-write could silently drop
    * the loser's manifests from the index.
    *
    * Superseded versions are TOMBSTONED (truncated to 0 bytes), never
    * deleted outright: a deleted version FREES its number, and a
    * committer whose read-snapshot→create window straddled enough
    * concurrent commits could then re-claim a number BELOW the current
    * maximum — its "successful" create would be invisible to every
    * reader (a silent lost update; caught by the contention test before
    * tombstoning existed). With every claimed number pinned forever, a
    * successful create always extends the true tip. Ancient tombstones
    * (> [[TombstoneRetention]] versions behind) are finally deleted.
    *
    * Returns the superseded snapshot's manifest JSONs (what the winning
    * `transform` call saw), so callers can delete generations their
    * commit replaced.
    */
  /** Test seam: runs between the snapshot read and the version claim —
    * the window the tombstone-retention envelope protects. Production
    * value is a no-op.
    */
  private[engine] var beforeClaimHook: () => Unit = () => ()

  def commitIndex(conf: Configuration, tableDir: String,
                  transform: Seq[String] => Seq[String]): Seq[String] = {
    var attempts = 0
    while (attempts < 64) {
      val snap = readIndexSnapshot(conf, tableDir)
      val (ver, cur) = snap.getOrElse(
        (-1L, normalizeFallback(listedManifestJsons(conf, tableDir))))
      val next = ver + 1
      beforeClaimHook()
      if (ContainerIO.createExclusive(conf,
          s"$tableDir/${versionedIndexName(next)}", indexBody(transform(cur)))) {
        val f = ContainerIO.fs(tableDir, conf)
        // LOST-CLAIM guard: tombstone GC frees version numbers more than
        // TombstoneRetention behind the tip, so a committer whose
        // read-snapshot→create window straddled that many commits can
        // "successfully" create a version BELOW the live maximum — a
        // snapshot no reader will ever take. Detect it: legitimately,
        // versions above ours can only be committed by writers that read
        // OUR snapshot, so the tip can only be ~attempts ahead of us;
        // a tip a full retention window ahead proves our number was
        // recycled. Withdraw the claim and retry on the true tip instead
        // of silently losing the update.
        val listed = versionedIndexes(conf, tableDir) // includes our claim
        val maxAfter = listed.map(_._1).max
        if (maxAfter >= next + TombstoneRetention) {
          f.delete(new org.apache.hadoop.fs.Path(
            s"$tableDir/${versionedIndexName(next)}"), false)
        } else {
          val retention = snapshotRetention(conf)
          listed.foreach { case (v, n) =>
            val p = new org.apache.hadoop.fs.Path(s"$tableDir/$n")
            if (v < ver - TombstoneRetention) f.delete(p, false)
            else if (v < ver - retention &&
                v >= ver - retention - 8) {
              // tombstone: pin the claim, drop the payload. The EXISTENCE
              // of the file is what blocks number re-claim — truncation
              // only reclaims space, so the recent window suffices
              // (anything older was tombstoned by an earlier commit, and
              // a crash-skipped live straggler still pins its number).
              // Concurrent readers of a just-truncated version retry.
              // Versions inside [[SnapshotRetention]] keep their CONTENT:
              // they are the time-travel surface (`versionAsOf`) and
              // vacuum's retained reference sets (round 8).
              try f.create(p, true).close()
              catch { case _: java.io.IOException => () }
            }
          }
          if (ver == -1L && snap.isDefined) // migrated off the legacy file
            f.delete(new org.apache.hadoop.fs.Path(indexPath(tableDir)), false)
          return cur
        }
      }
      attempts += 1
    }
    throw new java.io.IOException(
      s"manifest index commit for $tableDir contended $attempts times")
  }

  def versionedIndexName(version: Long): String =
    s"_manifest-index.v$version.json"

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
    val nulls =
      Option(n.get("nullCounts")).filter(_.isObject).map(_.properties().asScala.map { e =>
        e.getKey -> e.getValue.asInt()
      }.toMap).getOrElse(Map.empty[String, Int])
    ChunkStats(jLong(n, "offset"), jLong(n, "length"), jLong(n, "rows").toInt,
      parseLongRanges(n.get("longRanges")), dicts, sranges, crcs, nulls)
  }

  /** Parse one manifest JSON; `fallbackName` covers legacy manifests
    * written before the `name` field existed (derived from the filename).
    * Any malformation — parser errors AND structurally-wrong-but-valid
    * JSON (an NPE from a mutated field) — surfaces as
    * IllegalArgumentException: this runs inside Spark planning/analysis,
    * where a raw exception becomes an opaque internal error (fuzz
    * contract).
    */
  def parse(json: String, fallbackName: String): ParsedManifest =
    try parseUnchecked(json, fallbackName)
    catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(s"corrupt manifest JSON", e)
    }

  private def parseUnchecked(json: String, fallbackName: String): ParsedManifest = {
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
    val schemaCols = Option(root.get("schema")).filter(_.isArray).map {
      _.elements().asScala.map { c =>
        val n = c.get("name")
        val k = c.get("kind")
        require(n != null && k != null && k.canConvertToInt,
          s"corrupt manifest schema entry: $c")
        (n.asText(), k.asInt())
      }.toSeq
    }.getOrElse(Nil)
    val ancestors = Option(root.get("ancestors")).filter(_.isArray).map {
      _.elements().asScala.map(_.asText()).toSeq
    }.getOrElse(Nil)
    val elided = Option(root.get("chunksElided")).exists(_.asBoolean(false))
    val envelope = Option(root.get("envelope")).filter(_.isObject).map { e =>
      val sr = Option(e.get("strRanges")).filter(_.isObject)
        .map(_.properties().asScala.map { p =>
          p.getKey -> (p.getValue.get(0).asText(), p.getValue.get(1).asText())
        }.toMap).getOrElse(Map.empty[String, (String, String)])
      val sd = Option(e.get("strDicts")).filter(_.isObject)
        .map(_.properties().asScala.map { p =>
          p.getKey -> p.getValue.elements().asScala.map(_.asText()).toSeq
        }.toMap).getOrElse(Map.empty[String, Seq[String]])
      val nc = Option(e.get("nullCounts")).filter(_.isObject)
        .map(_.properties().asScala.map { p =>
          p.getKey -> p.getValue.asLong()
        }.toMap).getOrElse(Map.empty[String, Long])
      ManifestEnvelope(sr, sd, nc)
    }
    val partitioning = Option(root.get("partitioning")).filter(_.isArray).map {
      _.elements().asScala.map(_.asText()).toSeq
    }.getOrElse(Nil)
    val bucketIds = Option(root.get("bucketIds")).filter(_.isObject)
      .map(_.properties().asScala.map { p =>
        p.getKey -> p.getValue.elements().asScala.map(_.asInt()).toSet
      }.toMap).getOrElse(Map.empty[String, Set[Int]])
    ParsedManifest(name, jLong(root, "part").toInt, jLong(root, "rows"),
      jLong(root, "chunks").toInt, jLong(root, "rawBytes"),
      jLong(root, "encodedBytes"),
      Option(root.get("digest")).map(_.asText()).getOrElse(""),
      ranges, chunkIndex, schemaCols,
      Option(root.get("digestCol")).map(_.asText()).getOrElse("content"),
      ancestors,
      Option(root.get("commitId")).map(_.asText()).getOrElse(""),
      jLong(root, "commitParts").toInt,
      chunksElided = elided,
      storedEnvelope = envelope,
      partitioning = partitioning,
      bucketIds = bucketIds,
      schemaMarker = Option(root.get("schemaMarker")).exists(_.asBoolean(false)))
  }

  /** Parse a manifest JSON whose block-file name falls back to the
    * numeric `part` field when the `name` field is absent (legacy
    * pre-round-4 manifests, whose block files were named by part id).
    */
  def parseWithFallback(json: String): ParsedManifest = {
    val m = parse(json, "")
    if (m.name.nonEmpty) m else m.copy(name = m.part.toString)
  }

  /** Raw manifest JSONs from a `manifests/` listing (tables without an
    * index: legacy and mid-encode-resume reads).
    */
  private[engine] def listedManifestJsons(conf: Configuration,
                                          tableDir: String): Seq[String] =
    listManifestNames(conf, tableDir).sorted.map { n =>
      new String(ContainerIO.readAll(conf, s"$tableDir/manifests/$n"),
        java.nio.charset.StandardCharsets.UTF_8)
    }

  /** Every COMMITTED partition of the table: one index read when an
    * index snapshot exists (highest version wins), else a `manifests/`
    * listing + per-file reads (legacy / mid-encode tables).
    */
  def readCommitted(conf: Configuration, tableDir: String): Seq[ParsedManifest] =
    readCommittedJsons(conf, tableDir).map(parseWithFallback)

  // -------------------------------------------------------- time travel

  /** The manifests of one SPECIFIC retained index version (snapshot time
    * travel, round 8). A version whose content was truncated (past
    * [[SnapshotRetention]]) or never claimed fails with the controlled
    * IllegalArgumentException — this runs inside Spark planning.
    */
  def readCommittedAt(conf: Configuration, tableDir: String,
                      version: Long): Seq[ParsedManifest] = {
    val name = versionedIndexName(version)
    val available = versionedIndexes(conf, tableDir)
    if (!available.exists(_._1 == version))
      throw new IllegalArgumentException(
        s"graft table $tableDir has no snapshot version $version; " +
          s"available: ${available.map(_._1).mkString(", ")}")
    val bytes =
      try ContainerIO.readAll(conf, s"$tableDir/$name")
      catch {
        case _: java.io.FileNotFoundException => Array.empty[Byte]
      }
    if (bytes.isEmpty) throw new IllegalArgumentException(
      s"graft snapshot version $version of $tableDir is no longer " +
        s"retained (the table keeps the last ${snapshotRetention(conf)} " +
        "superseded versions; expired earlier if " +
        "graft.system.expire_snapshots ran)")
    try parseIndexJsons(bytes).map(parseWithFallback)
    catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        throw new IllegalArgumentException(
          s"corrupt manifest index $tableDir/$name", e)
    }
  }

  /** Highest snapshot version committed at or before `tsMillis` (the
    * `timestampAsOf` surface), by index-file modification time — the
    * commit instant up to filesystem clock skew.
    */
  def versionAt(conf: Configuration, tableDir: String, tsMillis: Long): Long = {
    val fs = ContainerIO.fs(tableDir, conf)
    val candidates = versionedIndexes(conf, tableDir).flatMap { case (v, n) =>
      try {
        val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$tableDir/$n"))
        // tombstoned (0-byte) versions have no snapshot to read
        if (st.getLen > 0 && st.getModificationTime <= tsMillis) Some(v)
        else None
      } catch { case _: java.io.FileNotFoundException => None }
    }
    candidates.maxOption.getOrElse(throw new IllegalArgumentException(
      s"graft table $tableDir has no retained snapshot at or before " +
        s"timestamp $tsMillis"))
  }

  /** Names referenced by ANY retained index version (latest included):
    * vacuum's reference set, so a block only a retained time-travel
    * snapshot still needs survives the sweep.
    */
  def retainedSnapshotNames(conf: Configuration, tableDir: String): Set[String] =
    versionedIndexes(conf, tableDir).iterator.flatMap { case (_, n) =>
      try {
        val bytes = ContainerIO.readAll(conf, s"$tableDir/$n")
        if (bytes.isEmpty) Nil
        else parseIndexJsons(bytes).map(parseWithFallback(_).name)
      } catch {
        case _: java.io.FileNotFoundException => Nil
        case _: com.fasterxml.jackson.core.JacksonException => Nil
      }
    }.toSet

  /** Raw committed manifest JSONs (job-commit index merging). */
  def readCommittedJsons(conf: Configuration, tableDir: String): Seq[String] =
    readIndexSnapshot(conf, tableDir) match {
      case Some((_, jsons)) => jsons
      case None => normalizeFallback(listedManifestJsons(conf, tableDir))
    }

  def crc32c(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, off, len)
    c.getValue
  }
  def crc32c(bytes: Array[Byte]): Long = crc32c(bytes, 0, bytes.length)
}
