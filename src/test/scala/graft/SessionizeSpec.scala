package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sessionize

/** Gap-based sessionization: batch lag/cumsum vs streaming
  * flatMapGroupsWithState must agree, and streaming must close sessions both
  * in-batch (gap exceeded by a later event) and by event-time timeout. */
class SessionizeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("batch: gap splits sessions exactly; bounds and sums per session") {
    val events = Seq(
      (1L, ts("2026-01-01T10:00:00Z"), 1.0),
      (1L, ts("2026-01-01T10:10:00Z"), 2.0), // same session (10 min < 30)
      (1L, ts("2026-01-01T11:30:00Z"), 4.0), // 80 min silence → new session
      (2L, ts("2026-01-01T10:05:00Z"), 8.0)
    ).toDF("user_id", "ts", "value")
    val got = Sessionize.batch(events, gapMinutes = 30)
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, ts("2026-01-01T10:00:00Z"), ts("2026-01-01T10:10:00Z"), 2L, 3.0),
      (1L, ts("2026-01-01T11:30:00Z"), ts("2026-01-01T11:30:00Z"), 1L, 4.0),
      (2L, ts("2026-01-01T10:05:00Z"), ts("2026-01-01T10:05:00Z"), 1L, 8.0)))
  }

  test("batch: a gap of exactly the threshold does NOT split") {
    val events = Seq(
      (1L, ts("2026-01-01T10:00:00Z"), 1.0),
      (1L, ts("2026-01-01T10:30:00Z"), 1.0) // exactly 30 min: strict > splits
    ).toDF("user_id", "ts", "value")
    assert(Sessionize.batch(events, gapMinutes = 30).count() === 1)
  }

  test("streaming: late above-watermark event merges, extending start backward") {
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = Sessionize.stream(in.toDF().toDF("user_id", "ts", "value"),
        gapMinutes = 30, watermark = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("sess_late").start()
    in.addData((1L, ts("2026-01-01T10:00:00Z"), 1.0),
               (1L, ts("2026-01-01T10:10:00Z"), 2.0))
    q.processAllAvailable()
    // late but within the 2 h watermark: must merge and extend the start
    in.addData((1L, ts("2026-01-01T09:50:00Z"), 4.0))
    q.processAllAvailable()
    // far-future event closes the session in-batch
    in.addData((1L, ts("2026-01-01T15:00:00Z"), 0.0))
    q.processAllAvailable()
    val got = spark.table("sess_late")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(got.contains(
      (1L, ts("2026-01-01T09:50:00Z"), ts("2026-01-01T10:10:00Z"), 3L, 7.0)),
      s"late event must extend the open session backward, got $got")
    q.stop()
  }

  test("streaming: in-batch close, idle timeout close, exactly-once append") {
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = Sessionize.stream(in.toDF().toDF("user_id", "ts", "value"),
        gapMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    def emitted(): Set[(Long, Timestamp, Timestamp, Long, Double)] =
      spark.table("sess").as[(Long, Timestamp, Timestamp, Long, Double)]
        .collect().toSet

    // Batch 1: user 1 opens a session (2 events), user 2 opens one.
    in.addData((1L, ts("2026-01-01T10:00:00Z"), 1.0),
               (1L, ts("2026-01-01T10:10:00Z"), 2.0),
               (2L, ts("2026-01-01T10:05:00Z"), 8.0))
    q.processAllAvailable()
    assert(emitted().isEmpty, "open sessions must not be emitted")

    // Batch 2: user 1's event 80 min later closes session 1 IN-BATCH and
    // advances the watermark to 11:20 (11:30 − 10 min).
    in.addData((1L, ts("2026-01-01T11:30:00Z"), 4.0))
    q.processAllAvailable()
    // user 1's first session closed IN-BATCH; user 2's idle session may
    // already have closed by timeout in the follow-up trigger (watermark
    // 11:20 > its 10:35 deadline) — assert the in-batch close and that
    // nothing else leaked.
    val afterB2 = emitted()
    assert(afterB2.contains(
      (1L, ts("2026-01-01T10:00:00Z"), ts("2026-01-01T10:10:00Z"), 2L, 3.0)))
    assert(afterB2.subsetOf(Set(
      (1L, ts("2026-01-01T10:00:00Z"), ts("2026-01-01T10:10:00Z"), 2L, 3.0),
      (2L, ts("2026-01-01T10:05:00Z"), ts("2026-01-01T10:05:00Z"), 1L, 8.0))))

    // Batch 3: a later user-1 event pushes the watermark past user 2's
    // timeout (10:05 + 30 min = 10:35 < 11:20 already, fires this trigger)
    // and past user 1's open session too (11:30 + 30 = 12:00 < 12:50).
    in.addData((1L, ts("2026-01-01T13:00:00Z"), 0.5))
    q.processAllAvailable()
    q.processAllAvailable() // one extra trigger so new timeouts fire
    val after = emitted()
    assert(after.contains(
      (2L, ts("2026-01-01T10:05:00Z"), ts("2026-01-01T10:05:00Z"), 1L, 8.0)),
      s"idle user-2 session must close by timeout, got $after")
    assert(after.contains(
      (1L, ts("2026-01-01T11:30:00Z"), ts("2026-01-01T11:30:00Z"), 1L, 4.0)))
    q.stop()

    // Batch/stream parity: every emitted (closed) session appears in the
    // batch sessionization of the same rows.
    val allRows = Seq(
      (1L, ts("2026-01-01T10:00:00Z"), 1.0), (1L, ts("2026-01-01T10:10:00Z"), 2.0),
      (2L, ts("2026-01-01T10:05:00Z"), 8.0), (1L, ts("2026-01-01T11:30:00Z"), 4.0),
      (1L, ts("2026-01-01T13:00:00Z"), 0.5)
    ).toDF("user_id", "ts", "value")
    val batch = Sessionize.batch(allRows, gapMinutes = 30)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(after.subsetOf(batch))
  }
}
