package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

/** Funnel completions: the streaming state machine must agree with the
  * batch 3-aggregation chain after every event-time-ordered micro-batch
  * prefix, and the registered q_funnel step-3 count must equal the
  * completion count (one semantics, three surfaces). */
class FunnelSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val W = 86400000000L // 24 h, the registered query's window
  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def batch(rows: Seq[(Long, Timestamp, String)]): Set[(Long, Long, Long, Long)] =
    Funnel.completionsBatch(rows.toDF("user_id", "ts", "event_type"), W)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("batch completions: earliest chain, window cap, order sensitivity") {
    val rows = Seq(
      // user 1 completes: view 10:00, clicks 10:30/11:00, purchase 12:00
      (1L, ts("2026-01-01T10:00:00Z"), "view"),
      (1L, ts("2026-01-01T10:30:00Z"), "click"),
      (1L, ts("2026-01-01T11:00:00Z"), "click"),
      (1L, ts("2026-01-01T12:00:00Z"), "purchase"),
      // user 2: purchase BEFORE its click — no completion
      (2L, ts("2026-01-01T10:00:00Z"), "view"),
      (2L, ts("2026-01-01T11:00:00Z"), "purchase"),
      (2L, ts("2026-01-01T12:00:00Z"), "click"),
      // user 3: purchase outside the 24 h window of the first view
      (3L, ts("2026-01-01T10:00:00Z"), "view"),
      (3L, ts("2026-01-01T10:10:00Z"), "click"),
      (3L, ts("2026-01-02T11:00:00Z"), "purchase"),
      // user 4: click before any view never counts
      (4L, ts("2026-01-01T09:00:00Z"), "click"),
      (4L, ts("2026-01-01T10:00:00Z"), "view"))
    def us(s: String): Long = ts(s).getTime * 1000L
    assert(batch(rows) === Set((1L, us("2026-01-01T10:00:00Z"),
      us("2026-01-01T10:30:00Z"), us("2026-01-01T12:00:00Z"))))
  }

  test("stream equals batch after every event-time-ordered prefix; emits exactly once") {
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Funnel.completionsStream(
        in.toDF().toDF("user_id", "ts", "event_type"), W)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    def emitted(): Set[(Long, Long, Long, Long)] =
      spark.table("funnel_stream")
        .as[(Long, Long, Long, Long)].collect().toSet
    // two users interleaved; user 5 completes in batch 1, user 6 needs
    // batch 2; batch-1 rows deliberately shuffled (in-batch disorder is
    // absorbed by the per-batch sort)
    val b1 = Seq(
      (5L, ts("2026-01-01T12:00:00Z"), "purchase"),
      (5L, ts("2026-01-01T10:00:00Z"), "view"),
      (6L, ts("2026-01-01T10:05:00Z"), "view"),
      (5L, ts("2026-01-01T10:30:00Z"), "click"),
      (6L, ts("2026-01-01T10:20:00Z"), "click"))
    val b2 = Seq(
      (6L, ts("2026-01-01T13:00:00Z"), "purchase"),
      (5L, ts("2026-01-01T14:00:00Z"), "purchase")) // later purchase: no re-emit
    try {
      in.addData(b1: _*); q.processAllAvailable()
      assert(emitted() === batch(b1), "prefix 1")
      in.addData(b2: _*); q.processAllAvailable()
      assert(emitted() === batch(b1 ++ b2), "prefix 2")
      assert(emitted().size === 2, "exactly one completion row per user")
    } finally q.stop()
  }

  test("state store shrinks once the watermark passes a funnel's window (r13 weak)") {
    val in = MemoryStream[(Long, Timestamp, String)]
    // 1 h window + 10 min watermark so the fixture can outrun both quickly
    val winUs = 3600000000L
    val q = Funnel.completionsStream(
        in.toDF().toDF("user_id", "ts", "event_type"), winUs, "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_state_expiry").start()
    def stateRows(): Long = q.lastProgress.stateOperators(0).numRowsTotal
    def emitted(): Set[Long] = spark.table("funnel_state_expiry")
      .select("user_id").as[Long].collect().toSet
    try {
      // b1: user 10 opens a funnel (incomplete), user 11 completes one,
      // user 12 sends a viewless click (must store NOTHING)
      in.addData(
        (10L, ts("2026-01-01T10:00:00Z"), "view"),
        (11L, ts("2026-01-01T10:00:00Z"), "view"),
        (11L, ts("2026-01-01T10:10:00Z"), "click"),
        (11L, ts("2026-01-01T10:20:00Z"), "purchase"),
        (12L, ts("2026-01-01T10:00:00Z"), "click"))
      q.processAllAvailable()
      assert(emitted() === Set(11L))
      assert(stateRows() === 2, "only users with an open window hold state")
      // b2: a fresh user far in the future pushes the watermark past
      // t1 + window for users 10 and 11 (10:00 + 1 h = 11:00; watermark
      // becomes 14:00 − 10 min = 13:50) — their rows must expire.
      in.addData((13L, ts("2026-01-01T14:00:00Z"), "view"))
      q.processAllAvailable()
      // the timeout fires on the first batch that RUNS under the advanced
      // watermark; nudge one more batch in case the engine didn't schedule
      // a no-data cleanup batch on its own
      in.addData((13L, ts("2026-01-01T14:01:00Z"), "click"))
      q.processAllAvailable()
      assert(stateRows() === 1, "expired funnels must leave the state store")
      assert(emitted() === Set(11L), "expiry must not emit or re-emit")
    } finally q.stop()
  }

  test("registered q_funnel step-3 count equals the completion count on the fixture") {
    val sf = "/root/testdata/sf0.001"
    val step3 = graft.queries.CoreQueries.funnel(spark, sf).collect()
      .find(_.getAs[String]("step") == "view>click>purchase").get
      .getAs[Long]("users")
    val completions = Funnel.completionsBatch(
      graft.engine.Tables.events(spark, sf), W).count()
    assert(step3 === completions)
  }
}
