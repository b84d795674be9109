package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping (pandas `pivot_table` / `melt`), planned for one
  * shuffle.
  *
  * Spark's built-in `RelationalGroupedDataset.pivot` — even with an explicit
  * value domain — lowers to a two-stage `pivotfirst` aggregate: a first
  * hash-aggregate keyed on (groupKey, pivotCol) with its own exchange, then a
  * second exchange re-keying on groupKey alone. [[pivot]] instead lowers the
  * pivot to conditional aggregation (`agg(expr) FILTER (pivotCol = v)` per
  * domain value): ONE partial-aggregating exchange on groupKey, identical
  * results. The domain must be explicit either way to keep the output schema
  * data-independent — a schema that grows when a new category appears in the
  * data is an operability bug at 100 TB, and discovering the domain costs a
  * distinct scan of the fact table.
  */
object Reshape {

  /** Pivot `df` to one row per `groupKey`, one column per `(domain value,
    * aggregate)` pair. `aggs` maps an output-column suffix to the aggregate
    * to compute over the rows matching each domain value; output columns are
    * named `<lowercased value>_<suffix>`. */
  def pivot(df: DataFrame, groupKey: String, pivotCol: String,
            domain: Seq[String], aggs: Seq[(String, Column => Column)],
            valueCol: String): DataFrame = {
    val cells = for {
      v <- domain
      (suffix, agg) <- aggs
    } yield agg(when(col(pivotCol) === lit(v), col(valueCol)))
      .as(s"${v.toLowerCase}_$suffix")
    df.groupBy(col(groupKey)).agg(cells.head, cells.tail: _*)
  }

  /** Long-form melt (pandas `melt`, SQL UNPIVOT) — Spark's native `unpivot`
    * (a narrow Expand: one output row per value column per input row, no
    * shuffle, pruned scan) plus a NULL-cell filter: the Dataset API keeps
    * NULL cells, SQL UNPIVOT defaults to EXCLUDE NULLS — this follows SQL. */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valueName)
      .where(col(valueName).isNotNull)
}
