package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-proximity) join: pair left and right rows whose
  * timestamps lie within a tolerance of each other — with NO equi key.
  *
  * Written naively (`|l.ts − r.ts| <= tol` as the join condition) Spark can
  * only plan BroadcastNestedLoopJoin / cartesian — O(|L|·|R|) compares, a
  * scale-killer. The production composition BUCKETIZES time:
  *  1. both sides get an integer bucket `floor(ts / tol)`;
  *  2. a row within tolerance of a left row can only live in the left row's
  *     own bucket or the two adjacent ones, so the left side explodes to 3
  *     (bucket) probe rows — a constant ×3, independent of data size;
  *  3. the candidate join is a plain EQUI-join on bucket (hash-partitioned
  *     shuffle, AQE-skew-splittable) and the exact `|Δ| <= tol` filter runs
  *     on candidates only.
  * Each true pair is emitted exactly once (the right row has ONE bucket;
  * the left row probes that bucket exactly once). Candidate count is
  * |pairs within 3·tol|, so cost tracks the answer size, not |L|·|R|.
  *
  * This is the time-dimension instance of the same bucket-then-refine
  * pattern the engine uses for LSH near-dup and ANN candidate generation
  * ([[Dedup]], [[Similarity]]). An equi-key + range condition does NOT need
  * this operator — Spark plans that as a sort-merge join with the range as
  * a join-condition filter already.
  */
object RangeJoin {

  /** Pairs (left, right) with `|leftTs − rightTs| <= toleranceSec`, left
    * columns kept, right payload prefixed. */
  def withinTolerance(left: DataFrame, right: DataFrame,
                      toleranceSec: Long,
                      leftTs: String = "ts", rightTs: String = "ts",
                      payload: Seq[String] = Seq("value"),
                      prefix: String = "near_"): DataFrame = {
    require(toleranceSec > 0, s"toleranceSec must be positive, got $toleranceSec")
    val tolUs = toleranceSec * 1000000L
    val lb = "__graft_lb"
    val rb = "__graft_rb"
    val l = left.withColumn(lb,
      explode(array((-1 to 1).map(d =>
        floor(unix_micros(col(leftTs)) / tolUs) + d): _*)))
    val r = right.select(
      (Seq(floor(unix_micros(col(rightTs)) / tolUs).as(rb),
        col(rightTs).as(s"$prefix$rightTs")) ++
        payload.filterNot(_ == rightTs).map(c => col(c).as(s"$prefix$c"))): _*)
    l.join(r, col(lb) === col(rb))
      .where(abs(unix_micros(col(leftTs)) - unix_micros(col(s"$prefix$rightTs"))) <= tolUs)
      .drop(lb, rb)
  }
}
