package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group median in the SPILL-SAFE shape — the scale path the
  * [[Guards.boundedMedian]] contract points at.
  *
  * Spark's `median`/`percentile` aggregate buffers the group's full value
  * multiset in ONE in-memory aggregation buffer (TypedImperativeAggregate —
  * it never spills), which is why boundedMedian carries a loud group-size
  * contract: fine for dimension-keyed groups, wrong for fact-keyed ones.
  * This operator computes the identical exact median through the window
  * machinery instead: shuffle by key, external SORT by value, then
  * `row_number` rank selection — WindowExec stages partition rows in a
  * spillable buffer (ExternalAppendOnlyUnsafeRowArray), so a group bigger
  * than executor memory sorts and spills to disk instead of OOMing the
  * aggregation. The memory contract drops from "max group fits one buffer"
  * to "max group fits executor DISK" — the same contract every sort-merge
  * join already carries, i.e. none in practice at 100 TB.
  *
  * Semantics match the interpolating exact median: nulls excluded; odd n
  * selects the single middle rank; even n averages the two central ranks
  * ((a+b)/2 — ties are safe because rank selection picks VALUES from the
  * sorted multiset, so equal values in any tie order select the same
  * values). Both selected ranks derive from the same integer arithmetic
  * the DuckDB oracle replays, so the result is hash-verifiable without
  * trusting either engine's built-in median interpolation to agree in the
  * last ULP.
  *
  * Cost shape: one shuffle on `keys` (reused by both window specs — the
  * ordered row_number and the frame-less count ride the same exchange),
  * one external sort, a filter that keeps ≤ 2 rows per group, and a
  * 2-row-per-group final aggregate. No driver state, no group buffer.
  */
object Medians {

  /** (keys..., median_<value>) — one row per group, exact interpolated
    * median of `value`. */
  def exactMedianByKey(df: DataFrame, keys: Seq[String], value: String,
                       out: String = "med"): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*)
    val ranked = byKey.orderBy(col(value))
    df.where(col(value).isNotNull)
      .select(keys.map(col) :+ col(value): _*)
      .withColumn("_rn", row_number().over(ranked))
      .withColumn("_n", count(lit(1)).over(byKey))
      // central ranks: odd n → (n+1) div 2 twice (one row); even n → n div 2,
      // n div 2 + 1. Integer `div`, not `/` (Spark `/` is true division).
      .where(expr("_rn = (_n + 1) div 2 OR _rn = _n div 2 + 1"))
      .groupBy(keys.map(col): _*)
      .agg(avg(col(value)).as(out))
  }
}
