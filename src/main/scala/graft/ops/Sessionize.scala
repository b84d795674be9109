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

  /** Epoch MICROS of a Timestamp — the streaming state works in the same
    * micros domain as [[batch]]'s `unix_micros` (a millis `getTime`
    * comparison would merge sub-second gaps the batch form splits). */
  private def usOf(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming sessionization (append mode): emits each CLOSED session
    * exactly once. `events` must carry (user_id, ts, value); the watermark
    * governs both late-data tolerance and idle-session timeout.
    *
    * LATE (out-of-order, above-watermark) events merge into the user's open
    * session, extending `session_start` backward if needed — the open
    * session is the only state held, so an event that "should" have formed
    * its own earlier session (possible only when it arrives more than `gap`
    * before the open session's span) is absorbed rather than emitted
    * retroactively. Configure `watermark <= gap` and this case cannot
    * occur: every admitted event is within `gap` of the open session's
    * last event, which is exactly [[batch]]'s merge rule. */
  def stream(events: DataFrame, gapMinutes: Int,
             watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
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
            Session(uid, tsOf(s.start), tsOf(s.last), s.n, s.sum)
          if (state.hasTimedOut) {
            // idle close: the watermark passed last-event + gap with no new
            // events — the session can never be extended again.
            val out = close(state.get)
            state.remove()
            Iterator(out)
          } else {
            // batches deliver a group's rows unordered; sessionization is
            // order-sensitive, so sort the (tiny) per-user batch slice.
            val sorted = rows.map { case (_, t, v) => (usOf(t), v) }
              .toArray.sortBy(_._1)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (t, v) =>
              cur = cur match {
                case Some(s) if t - s.last <= gapUs => // in-gap OR late event
                  Some(OpenSession(math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.sum + v))
                case Some(s) => // in-batch close: gap exceeded by this event
                  closed ::= close(s)
                  Some(OpenSession(t, t, 1L, v))
                case None =>
                  Some(OpenSession(t, t, 1L, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // ms-domain deadline (the state API is ms): round UP so the
              // timeout never fires a fraction of a ms before last + gap,
              // and keep it ahead of the current watermark — an expired
              // deadline fires on the next trigger.
              val deadlineMs = (s.last + gapUs + 999L) / 1000L
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
