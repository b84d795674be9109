package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Keyless range join: bucket-then-refine must find exactly the pairs the
  * naive |Δ| <= tol condition defines — inclusive bounds, bucket-boundary
  * crossings, no duplicates — and must plan an equi-join, never a
  * nested-loop. */
class RangeJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("finds exactly the within-tolerance pairs incl. bucket crossings") {
    // tol = 60 s ⇒ buckets are minutes. Pairs deliberately straddle bucket
    // boundaries in both directions and sit exactly ON the bound.
    val l = Seq((1L, ts("2026-01-01T10:00:59Z")), (2L, ts("2026-01-01T10:05:00Z")),
                (3L, ts("2026-01-01T12:00:00Z")))
      .toDF("lid", "ts")
    val r = Seq((10L, ts("2026-01-01T10:01:30Z")), // 31 s after l1, next bucket
                (11L, ts("2026-01-01T10:04:01Z")), // 59 s before l2, prev bucket
                (12L, ts("2026-01-01T10:06:00Z")), // exactly +60 s from l2: inclusive
                (13L, ts("2026-01-01T10:06:01Z")), // 61 s: out
                (14L, ts("2026-01-01T18:00:00Z"))) // far away
      .toDF("rid", "ts")
    val got = RangeJoin.withinTolerance(l, r, toleranceSec = 60,
        payload = Seq("rid"), prefix = "m_")
      .select(col("lid"), col("m_rid")).as[(Long, Long)].collect().toSorted
    assert(got === Seq((1L, 10L), (2L, 11L), (2L, 12L)))
  }

  test("agrees with the naive theta join on random-ish data (no dup, no loss)") {
    val l = spark.range(200).select(col("id").as("lid"),
      timestamp_micros(col("id") * 7919L * 1000L).as("ts"))
    val r = spark.range(200).select(col("id").as("rid"),
      timestamp_micros(col("id") * 7717L * 1000L + 3500L * 1000L).as("ts"))
    val fast = RangeJoin.withinTolerance(l, r, toleranceSec = 10,
        payload = Seq("rid"), prefix = "m_")
      .select(col("lid"), col("m_rid")).as[(Long, Long)].collect().toSet
    val naive = l.join(r.select(col("rid"), col("ts").as("rts")),
        abs(unix_micros(col("ts")) - unix_micros(col("rts"))) <= 10000000L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(fast === naive)
    assert(fast.nonEmpty, "degenerate fixture: no pairs to compare")
  }

  test("plan: equi-join on bucket — no nested loop, no cartesian") {
    val plan = CoreQueries_rangeJoinPlan
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not nest-loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  private def CoreQueries_rangeJoinPlan: String =
    graft.queries.CoreQueries.rangeJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  private implicit class SortedOps(a: Array[(Long, Long)]) {
    def toSorted: Seq[(Long, Long)] = a.toSeq.sorted
  }
}
