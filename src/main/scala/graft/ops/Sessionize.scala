package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed gap-session: a maximal run of a user's events with no
  * inter-event silence longer than the gap. */
case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                   n_events: Long, sum_value: Double)

/** Open-session state held per user between micro-batches — four fixed-width
  * fields (~32 bytes); the state store never holds event payloads. */
case class OpenSession(start: Long, last: Long, n: Long, sum: Double)

/** Gap-based sessionization, batch and streaming, over an events frame with
  * (user_id, ts, value).
  *
  * The BATCH form is the lag/cumsum idiom: a window `lag` marks rows that
  * open a new session (previous event more than `gap` earlier), a running
  * sum of those markers numbers the sessions, and a group-by collapses each
  * (user, session) run. Both window passes share one (user_id, ts)
  * shuffle+sort, and sessionization parallelizes across users — the same
  * plan shape at 150 users or 150 million, with per-user event runs (not
  * the corpus) as the sort unit. Skewed power users are bounded by the
  * retention horizon, not corpus size.
  *
  * The STREAMING form is the `flatMapGroupsWithState` escape hatch — session
  * windows can't be expressed as watermarked tumbling windows because a
  * session's end time depends on the data. Per user the state store holds
  * one [[OpenSession]]; a session is emitted when a later event arrives more
  * than `gap` after it (in-batch close) or when the event-time watermark
  * passes its timeout (idle close) — so emission is exactly-once in append
  * mode and state size is O(active users), watermark-bounded.
  */
object Sessionize {

  /** Batch sessionization: one row per closed-or-open session. Timestamps
    * compare in exact epoch MICROS (Spark timestamps are micros; a cast to
    * long would truncate to seconds and merge sub-second gaps differently
    * from the oracle). */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = gapMinutes * 60L * 1000000L
    val prev = lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(prev.isNull || unix_micros(col("ts")) - prev > gapUs, 1L)
      .otherwise(0L)
    events.select(col("user_id"), col("ts"), col("value"))
      .withColumn("new_sess", isNew)
      .withColumn("sess_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .drop("sess_id")
  }

  /** Streaming sessionization (append mode): emits each CLOSED session
    * exactly once. `events` must carry (user_id, ts, value); the watermark
    * governs both late-data tolerance and idle-session timeout. */
  def stream(events: DataFrame, gapMinutes: Int,
             watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          def close(s: OpenSession) =
            Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
          if (state.hasTimedOut) {
            // idle close: the watermark passed last-event + gap with no new
            // events — the session can never be extended again.
            val out = close(state.get)
            state.remove()
            Iterator(out)
          } else {
            // batches deliver a group's rows unordered; sessionization is
            // order-sensitive, so sort the (tiny) per-user batch slice.
            val sorted = rows.map { case (_, t, v) => (t.getTime, v) }
              .toArray.sortBy(_._1)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (t, v) =>
              cur = cur match {
                case Some(s) if t - s.last <= gapMs =>
                  Some(OpenSession(s.start, math.max(s.last, t), s.n + 1, s.sum + v))
                case Some(s) => // in-batch close: gap exceeded by this event
                  closed ::= close(s)
                  Some(OpenSession(t, t, 1L, v))
                case None =>
                  Some(OpenSession(t, t, 1L, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must be ahead of the current watermark; an
              // already-expired deadline fires on the next trigger.
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
