package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state shape fixed windows can't
  * express (a session's length is data-dependent). Batch form splits each
  * user's history with `flatMapGroups`; streaming form keeps ONE open
  * session per user in `GroupState` and closes it either when a later
  * event arrives past the gap or when the event-time timeout fires at
  * `session_end + gap` (so idle users still emit).
  */
object Sessionize {

  /** Batch row/result shapes: TIMESTAMP_NTZ (LocalDateTime) end to end so
    * results compare 1:1 with the DuckDB oracle's naive timestamps.
    */
  final case class EventN(user_id: Long, ts: java.time.LocalDateTime,
      event_id: Long, value: Double)
  final case class SessionN(user_id: Long, session_start: java.time.LocalDateTime,
      session_end: java.time.LocalDateTime, n_events: Long, value_cents: Long)

  /** Streaming shapes: instant timestamps (watermarks need an instant). */
  final case class EventI(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, value: Double)
  final case class SessionI(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, value_cents: Long)

  /** Open-session aggregate carried in GroupState (micros since epoch). */
  final case class OpenSession(startUs: Long, endUs: Long, n: Long, cents: Long)

  /** Integer cents with HALF-AWAY-FROM-ZERO rounding, matching SQL/DuckDB
    * `round(value * 100)` for negative values too (`math.round` is half-UP:
    * round(-2.5) == -2, but the oracle says -3).
    */
  private[streaming] def cents(v: Double): Long = {
    val x = v * 100.0
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
  }

  /** Split (tsMicros, value) events — MUST be sorted — into
    * gap-delimited (startUs, endUs, n, cents) sessions.
    */
  private[streaming] def split(evs: Iterator[(Long, Double)],
                               gapUs: Long): Seq[OpenSession] = {
    val out = Seq.newBuilder[OpenSession]
    var cur: OpenSession = null
    for ((ts, v) <- evs) {
      val c = cents(v)
      if (cur == null) cur = OpenSession(ts, ts, 1, c)
      else if (ts - cur.endUs > gapUs) { out += cur; cur = OpenSession(ts, ts, 1, c) }
      else cur = OpenSession(cur.startUs, math.max(cur.endUs, ts), cur.n + 1, cur.cents + c)
    }
    if (cur != null) out += cur
    out.result()
  }

  private def usOf(t: java.time.LocalDateTime): Long =
    t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
  private def ntzOf(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
      (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)

  /** Batch sessionization over the events table; all sessions of all
    * users emitted. Input columns: user_id, ts (NTZ), event_id, value.
    *
    * Scale shape: secondary sort, NOT per-group buffering. Events are
    * hash-partitioned by user and sorted within each partition by
    * (user_id, ts, event_id) — Spark's external sorter spills, so a
    * bot-grade hot user with an unbounded history costs disk, not
    * executor heap (the round-2 form collected each user's history into
    * an array inside `flatMapGroups`, an OOM at 100x on one skewed key).
    * The session split then streams through the sorted run with O(1)
    * state: one open session and one pending emit.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionN] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .as[EventN]
      .mapPartitions { it =>
        new Iterator[SessionN] {
          private var cur: OpenSession = null
          private var curUid = 0L
          private var out: SessionN = null
          private def close(): SessionN = {
            val s = SessionN(curUid, ntzOf(cur.startUs), ntzOf(cur.endUs),
              cur.n, cur.cents)
            cur = null
            s
          }
          private def compute(): Unit = {
            while (out == null && it.hasNext) {
              val e = it.next()
              val ts = usOf(e.ts)
              val c = cents(e.value)
              if (cur == null) {
                curUid = e.user_id
                cur = OpenSession(ts, ts, 1, c)
              } else if (e.user_id != curUid || ts - cur.endUs > gapUs) {
                out = close() // at most one close per event: O(1) state
                curUid = e.user_id
                cur = OpenSession(ts, ts, 1, c)
              } else {
                cur = OpenSession(cur.startUs, math.max(cur.endUs, ts),
                  cur.n + 1, cur.cents + c)
              }
            }
            if (out == null && cur != null && !it.hasNext) out = close()
          }
          def hasNext: Boolean = { compute(); out != null }
          def next(): SessionN = {
            compute()
            if (out == null) throw new NoSuchElementException
            val r = out
            out = null
            r
          }
        }
      }
  }

  /** Streaming sessionization: GroupState holds the single open session
    * per user; an event past the gap closes-and-emits it, and an
    * event-time timeout at `end + gap` (driven by the watermark) emits
    * sessions of users who simply went quiet. Late events beyond
    * `lateness` are dropped by the watermark, which bounds state.
    *
    * Out-of-order approximation (deliberate, state-bounded): an
    * in-watermark event OLDER than the open session's end is absorbed
    * into the open session — it extends `n`/`cents` but never moves
    * `session_start` earlier and never retro-creates an earlier session,
    * whereas the batch form (a full sort) would. Events at most `gap`
    * out of order sessionize identically; reordering beyond the gap
    * within the lateness horizon differs from batch. Buffering the open
    * session's events and re-splitting on every late arrival would match
    * batch exactly at the cost of unbounded per-user state — the wrong
    * trade at 100 TB. Choose `lateness <= gap` to keep the two forms
    * aligned.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       lateness: String = "10 minutes"): Dataset[SessionI] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
      .withWatermark("ts", lateness)
      .as[EventI]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, it: Iterator[EventI], state: GroupState[OpenSession]) => {
          def toSession(s: OpenSession) = SessionI(uid,
            new java.sql.Timestamp(s.startUs / 1000L),
            new java.sql.Timestamp(s.endUs / 1000L), s.n, s.cents)
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(toSession(done))
          } else {
            val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            val evs = sorted.iterator.map(e => (e.ts.getTime * 1000L, e.value))
            val merged = state.getOption.map(open =>
              // resume the open session: seed split() with a zero-value
              // marker at the open session's END so the first new event's
              // gap is judged against it, then fold the open aggregate
              // back onto the first segment
              split(Iterator((open.endUs, 0.0)) ++ evs, gapUs) match {
                case head +: rest =>
                  OpenSession(open.startUs, math.max(open.endUs, head.endUs),
                    open.n + head.n - 1, open.cents + head.cents) +: rest
                case empty => empty
              }
            ).getOrElse(split(evs, gapUs))
            if (merged.isEmpty) Iterator.empty
            else {
              val open = merged.last
              state.update(open)
              state.setTimeoutTimestamp(open.endUs / 1000L + gapMinutes * 60000L)
              merged.init.iterator.map(toSession)
            }
          }
        })
  }
}
