package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loud-contract guards for operators whose scale behavior has a documented
  * bound (the [[graft.ops.Indexes]] `maxCellSize` precedent: a contract that
  * can be violated by data must FAIL with a named error, not degrade
  * silently).
  */
object Guards {
  /** Exact per-group median buffers the group's full value multiset in one
    * aggregation buffer, so its memory contract is "max rows per group fits
    * an executor" — fine for dimension-keyed groups (suppliers, cities),
    * wrong for high-cardinality facts. Default bound: 100M values ≈ 800 MB
    * of doubles in one buffer, the order where a 4-8 GB executor starts
    * spilling or dying. */
  val MaxMedianGroupRows: Long = 100000000L

  /** `median(value)` with the group-size contract enforced in-plan: the same
    * aggregation also counts the group, and a group past `maxGroupRows`
    * raises a named error instead of letting the buffer grow toward an
    * unattributable executor OOM. Both aggregates ride the same shuffle —
    * the guard adds a counter per group, not a pass over the data. (The
    * check fires at result-evaluation time, after the buffer was built: it
    * is a loud contract marker for queries pointed at the wrong key shape,
    * not an OOM preventer — at 100× past the bound the aggregation itself
    * dies first, with this guard's threshold documenting why.) */
  def boundedMedian(value: Column, maxGroupRows: Long = MaxMedianGroupRows): Column =
    when(count(value) > maxGroupRows,
      raise_error(concat(
        lit(s"exact median group exceeds $maxGroupRows rows ("), count(value),
        lit(") - exact per-group median buffers the whole group; use " +
          "percentile_approx or re-key (graft.engine.Guards scaladoc)"))))
      .otherwise(median(value))
}
