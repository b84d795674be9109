package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsofJoin

/** As-of join semantics: inclusive at-or-before match, LEFT null on no
  * match, null keys never match, deterministic tie resolution — and the
  * plan must be join-free (one shuffle + window, never a range join). */
class AsofJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private lazy val left = Seq(
    (1L, ts("2026-01-01T10:00:00Z"), 100.0), // matches right@09:50
    (1L, ts("2026-01-01T11:00:00Z"), 200.0), // matches right@11:00 (inclusive)
    (2L, ts("2026-01-01T09:00:00Z"), 300.0)  // no earlier right row → null
  ).toDF("user_id", "ts", "value")

  private lazy val right = Seq(
    (1L, ts("2026-01-01T09:50:00Z"), 1.0),
    (1L, ts("2026-01-01T11:00:00Z"), 2.0),
    (2L, ts("2026-01-01T12:00:00Z"), 3.0)    // after left@09:00 — no match
  ).toDF("user_id", "ts", "value")

  test("inclusive at-or-before match; LEFT null when nothing precedes") {
    val got = AsofJoin.asofJoin(left, right, "user_id")
      .orderBy("user_id", "ts")
      .select(col("user_id"), col("value"), col("asof_value"))
      .as[(Long, Double, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 100.0, Some(1.0)), (1L, 200.0, Some(2.0)),
      (2L, 300.0, None)))
  }

  test("null keys never match in either direction") {
    val l = left.unionByName(Seq((null.asInstanceOf[java.lang.Long],
      ts("2026-01-01T23:00:00Z"), 9.0)).toDF("user_id", "ts", "value")
      .select(col("user_id").cast("long"), col("ts"), col("value")))
    val r = right.unionByName(Seq((null.asInstanceOf[java.lang.Long],
      ts("2026-01-01T00:00:00Z"), 7.0)).toDF("user_id", "ts", "value")
      .select(col("user_id").cast("long"), col("ts"), col("value")))
    val nullRow = AsofJoin.asofJoin(l, r, "user_id")
      .where(col("user_id").isNull)
      .select(col("asof_value")).as[Option[Double]].collect().toSeq
    assert(nullRow === Seq(None),
      "a NULL-key left row must survive with a NULL match")
  }

  test("right rows with NULL timestamps never match") {
    val r = right.unionByName(Seq((2L, null.asInstanceOf[Timestamp], 99.0))
      .toDF("user_id", "ts", "value"))
    // user 2's left row at 09:00 has no legitimate earlier right row; the
    // null-ts row must not be picked up as a phantom "earliest" match
    val got = AsofJoin.asofJoin(left, r, "user_id")
      .where(col("user_id") === 2L)
      .select(col("asof_value")).as[Option[Double]].collect().toSeq
    assert(got === Seq(None))
  }

  test("duplicate right rows at one (key, ts) resolve to the max payload") {
    val dupR = right.unionByName(
      Seq((1L, ts("2026-01-01T09:50:00Z"), 5.0)).toDF("user_id", "ts", "value"))
    val got = AsofJoin.asofJoin(left, dupR, "user_id")
      .where(col("value") === 100.0)
      .select(col("asof_value")).as[Double].collect().toSeq
    assert(got === Seq(5.0))
  }

  test("multi-column payload carries with prefix; left columns untouched") {
    val got = AsofJoin.asofJoin(left, right, "user_id",
        payload = Seq("ts", "value"), prefix = "view_")
    assert(got.columns.toSeq === Seq("user_id", "ts", "value", "view_ts", "view_value"))
  }

  test("agrees with the naive greatest-at-or-before formulation on dense data") {
    // 300 left / 300 right rows over interleaved deterministic timelines —
    // many candidates per left row, so a last-picks-wrong bug can't hide.
    val l = spark.range(300).select(col("id").as("lid"), (col("id") % 7).as("user_id"),
      timestamp_micros(col("id") * 13001L * 1000L).as("ts"))
    val r = spark.range(300).select(col("id").as("rid"), (col("id") % 7).as("user_id"),
      timestamp_micros(col("id") * 11003L * 1000L + 500L * 1000L).as("ts"))
    val fast = graft.ops.AsofJoin.asofJoin(l, r, "user_id", payload = Seq("rid"))
      .select(col("lid"), col("asof_rid")).as[(Long, Option[Long])].collect().toMap
    // naive: max right ts at-or-before, then its rid (rid strictly increases
    // with ts here, so argmax-by-ts == max rid among eligible)
    val naive = l.join(r.select(col("user_id"), col("rid"),
          col("ts").as("rts")), Seq("user_id"), "left")
      .where(col("rts") <= col("ts"))
      .groupBy(col("lid")).agg(max(col("rid")).as("best"))
      .as[(Long, Long)].collect().toMap
    l.select(col("lid")).as[Long].collect().foreach { lid =>
      assert(fast(lid) === naive.get(lid), s"lid $lid")
    }
    assert(naive.nonEmpty && naive.size < 300,
      "fixture must exercise both matched and unmatched left rows")
  }

  test("plan: one window over a co-shuffle — no join node, no cartesian") {
    val plan = AsofJoin.asofJoin(left, right, "user_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"), "running-last window expected")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size <= 2,
      "both sides shuffle once by key, nothing else")
  }
}
