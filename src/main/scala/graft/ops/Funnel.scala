package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One completed conversion funnel: the user's earliest
  * view → click → purchase chain with every step inside `window` of the
  * first view. Times in exact epoch micros (the comparison domain of the
  * batch twin and the oracle). */
case class FunnelCompletion(user_id: Long, t1_us: Long, t2_us: Long,
                            t3_us: Long)

/** Per-user funnel state between micro-batches — three fixed-width stage
  * times (sentinel −1 = not reached) plus the emitted flag; the state
  * store never holds event payloads, so state is O(active users). */
case class FunnelState(t1: Long, t2: Long, t3: Long, emitted: Boolean)

/** Conversion-funnel completions, batch and streaming, over an events
  * frame with (user_id, ts, event_type).
  *
  * EARLIEST-COMPLETION semantics shared by both forms (and by the
  * registered q_funnel step counts): t1 = first view, t2 = first click
  * after t1, t3 = first purchase after t2, all within `windowUs` of t1.
  *
  * The BATCH form is three type-filtered min-aggregations chained on
  * |users|-sized frames — no windows, no per-user arrays (a hot user
  * costs min-merges, not a sort).
  *
  * The STREAMING form is a per-user monotone state machine in
  * `flatMapGroupsWithState` (append mode): each stage time is set once,
  * in event-time order, and the completion row is emitted exactly once
  * when the third stage lands. Equality with the batch operator holds
  * under event-time-ordered delivery across micro-batches — disorder
  * WITHIN a batch is absorbed by the per-batch sort (the
  * [[Sessionize.stream]] posture); a cross-batch regression (an event
  * older than one already folded) follows the monotone no-rewrite rule:
  * stages never un-set, which is the stated lateness approximation (an
  * exact rewind would require buffering every event below the current
  * t2 — unbounded state for a monitoring operator).
  *
  * STATE IS BOUNDED (r13 `weak`, fixed): the state store holds rows only
  * for users inside their live funnel window. Once the watermark passes
  * t1 + windowUs a funnel is FINAL — an incomplete one can never complete
  * (every later stage would violate `t − t1 ≤ windowUs`) and a completed
  * one has already emitted — so each state row carries an
  * `EventTimeTimeout` at t1 + windowUs and is REMOVED when it fires (the
  * [[Sessionize.stream]] expiry pattern). Viewless prefixes (clicks or
  * purchases before any view) store nothing at all. Stated
  * re-appearing-user approximation: a user whose completion tombstone has
  * expired and who then views again starts a FRESH funnel and may emit a
  * second completion — the price of O(active-window users) state instead
  * of O(users ever seen); the batch twin over the full history remains
  * the exact form. */
object Funnel {

  /** Batch completions: one row per user whose funnel completed. */
  def completionsBatch(events: DataFrame, windowUs: Long): DataFrame = {
    val ev = events.select(col("user_id").cast("long").as("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1_us"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("us") > col("t1_us") && col("us") - col("t1_us") <= windowUs)
      .groupBy("user_id")
      .agg(min(col("us")).as("t2_us"), min(col("t1_us")).as("t1_us"))
    ev.where(col("event_type") === "purchase")
      .join(c, "user_id")
      .where(col("us") > col("t2_us") && col("us") - col("t1_us") <= windowUs)
      .groupBy("user_id")
      .agg(min(col("t1_us")).as("t1_us"), min(col("t2_us")).as("t2_us"),
        min(col("us")).as("t3_us"))
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"))
  }

  private def usOf(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  /** Streaming completions (append mode): each completed funnel exactly
    * once. `events` must carry (user_id, ts, event_type); `watermark`
    * bounds lateness AND drives state expiry (see class doc). */
  def completionsStream(events: DataFrame, windowUs: Long,
                        watermark: String = "2 hours"): Dataset[FunnelCompletion] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("ts"), col("event_type"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelCompletion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // watermark passed t1 + windowUs: the funnel is final either
            // way (completed → already emitted; incomplete → can never
            // complete). Drop the row — state stays O(live windows).
            state.remove()
            Iterator.empty
          } else {
            // batches deliver a group's rows unordered; the stage machine
            // is order-sensitive, so sort the (tiny) per-user batch slice
            val sorted = rows.map { case (_, t, ty) => (usOf(t), ty) }
              .toArray.sortBy(_._1)
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L,
              emitted = false))
            sorted.foreach { case (t, ty) =>
              ty match {
                case "view" if st.t1 < 0 =>
                  st = st.copy(t1 = t)
                case "click" if st.t1 >= 0 && st.t2 < 0 && t > st.t1 &&
                  t - st.t1 <= windowUs =>
                  st = st.copy(t2 = t)
                case "purchase" if st.t2 >= 0 && st.t3 < 0 && t > st.t2 &&
                  t - st.t1 <= windowUs =>
                  st = st.copy(t3 = t)
                case _ =>
              }
            }
            val out =
              if (st.t3 >= 0 && !st.emitted) {
                st = st.copy(emitted = true)
                Iterator(FunnelCompletion(uid, st.t1, st.t2, st.t3))
              } else Iterator.empty
            if (st.t1 >= 0) {
              state.update(st)
              // ms-domain deadline (the state API is ms): round UP so the
              // timeout never fires before t1 + windowUs, and keep it
              // ahead of the current watermark so an already-expired
              // deadline fires on the next trigger (Sessionize pattern).
              val deadlineMs = (st.t1 + windowUs + 999L) / 1000L
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
            }
            // viewless prefixes (st == all sentinels) store nothing: a
            // click/purchase with no view carries no funnel information.
            out
          }
      }
  }
}
