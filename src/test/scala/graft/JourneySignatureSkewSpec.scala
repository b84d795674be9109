package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 `weak`: q_journey_signatures used to buffer a user's ENTIRE
  * event history in one `collect_list` aggregation buffer (which cannot
  * spill) to keep 8 elements — a hot bot/SDK user at 100 TB is an OOM on
  * exactly the key the operator profiles. The fix routes the first-8 cut
  * through [[graft.plans.GroupedTopK]] BEFORE any array forms. This spec
  * proves both halves on a deliberately skewed fixture: one user with
  * 100k events (10³× every other user) answers correctly, and the
  * executed plan carries the bounded-heap operator below the array
  * aggregate, so per-user aggregation state is O(8) regardless of
  * activity. */
class JourneySignatureSkewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hot user with 100k events: correct prefix, bounded-heap plan") {
    val dir = Files.createTempDirectory("journey_skew").toFile.getAbsolutePath
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    // hot user 1: 100_000 events, first 8 types cycle v,c,p,s...; the 8
    // earliest events (by ts, event_id) spell the expected signature
    val types = Array("view", "click", "purchase", "search")
    val hot = (0 until 100000).map { i =>
      (i.toLong, new Timestamp(base + i * 1000L), 1L, types(i % 4), 1.0, "{}")
    }
    // 100 normal users, 3 events each, ids offset past the hot user's
    val normal = (0 until 100).flatMap { u =>
      (0 until 3).map { i =>
        (200000L + u * 10 + i, new Timestamp(base + i * 1000L),
          10L + u, types((u + i) % 4), 1.0, "{}")
      }
    }
    (hot ++ normal)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8) // spread the hot user across input partitions
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val df = graft.queries.CoreQueries.journeySignatures(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"),
      "first-8 cut must run through the bounded-heap operator, not collect_list over raw events")
    // the array aggregate must consume the topK output (appear ABOVE it in
    // the plan tree), so no aggregation buffer ever holds > 8 elements
    assert(plan.indexOf("collect_list") < plan.indexOf("GroupedTopK"),
      "collect_list must aggregate the bounded topK output, not the scan")

    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // hot user: first 8 events in (ts, event_id) order are v,c,p,s,v,c,p,s
    assert(rows.get("vcpsvcps").contains(1L))
    // normal users: 3-initial signatures, 4 rotations × 25 users each
    assert(rows.get("vcp").contains(25L))
    assert(rows.get("cps").contains(25L))
    assert(rows.get("psv").contains(25L))
    assert(rows.get("svc").contains(25L))
  }
}
