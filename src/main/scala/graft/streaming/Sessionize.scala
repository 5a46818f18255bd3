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

  /** Split (tsMicros, value) events — MUST be sorted — into
    * gap-delimited (startUs, endUs, n, cents) sessions.
    */
  private[streaming] def split(evs: Iterator[(Long, Double)],
                               gapUs: Long): Seq[OpenSession] = {
    val out = Seq.newBuilder[OpenSession]
    var cur: OpenSession = null
    for ((ts, v) <- evs) {
      val c = math.round(v * 100)
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

  /** Batch sessionization over the events table; one group per user, all
    * sessions emitted. Input columns: user_id, ts (NTZ), event_id, value.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionN] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[EventN]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[EventN]) =>
        val sorted = it.toArray.sortBy(e => (usOf(e.ts), e.event_id))
        split(sorted.iterator.map(e => (usOf(e.ts), e.value)), gapUs)
          .map(s => SessionN(uid, ntzOf(s.startUs), ntzOf(s.endUs), s.n, s.cents))
          .iterator
      }
  }

  /** Streaming sessionization: GroupState holds the single open session
    * per user; an event past the gap closes-and-emits it, and an
    * event-time timeout at `end + gap` (driven by the watermark) emits
    * sessions of users who simply went quiet. Late events beyond
    * `lateness` are dropped by the watermark, which bounds state.
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
