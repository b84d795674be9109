package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single most recent right
  * row with the same key and `rightTs <= leftTs` — the attribution /
  * point-in-time-lookup operator relational engines ship natively (DuckDB
  * `ASOF JOIN`, kdb `aj`) and Spark does not.
  *
  * Spark-first composition — union + running `last`, NOT a range-join or a
  * per-row subquery:
  *  1. tag right rows 0 / left rows 1, align them into ONE frame (right
  *     payload as a struct column, null on left rows);
  *  2. window per key ordered by (ts, tag): a running
  *     `last(payload, ignoreNulls)` gives every left row the latest right
  *     payload at-or-before it (tag 0 < 1 ⇒ a right row at the SAME
  *     timestamp is visible, matching ASOF's inclusive bound);
  *  3. keep the left rows, unpack the struct.
  *
  * Scale shape: one co-shuffle of both inputs by key + one sort — the same
  * cost as a sort-merge join, with no join node, no range-explosion, and no
  * driver-side anything. A theta/range join (`l.ts >= r.ts` + row_number)
  * re-pairs every left row with EVERY earlier right row per key —
  * quadratic per key — which is why the union+window form is the production
  * shape at 100 TB. Per-key skew is bounded by the retention horizon, and
  * AQE's skew handling does not split window partitions, so a genuinely hot
  * key needs the same salting as any skewed window (see [[Skew]]).
  *
  * Semantics notes:
  *  - left rows with no earlier right row get a NULL payload (LEFT asof);
  *  - NULL keys and NULL right timestamps never match (such right rows are
  *    filtered; left NULL-key rows keep a NULL payload) — standard
  *    join-condition semantics;
  *  - duplicate right rows at one (key, ts) resolve to the MAX payload
  *    struct (explicit tiebreak in the window order), so the result is
  *    deterministic where engines with unspecified ASOF tie behavior are
  *    not.
  */
object AsofJoin {

  /** @param payload  right-side columns to carry onto matched left rows
    * @param prefix   prepended to payload names in the output (collision
    *                 guard: left keeps its own `ts`/`value` columns) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String = "ts", rightTs: String = "ts",
               payload: Seq[String] = Seq("value"),
               prefix: String = "asof_"): DataFrame = {
    val tag = "__graft_tag"
    val ts = "__graft_ts"
    val p = "__graft_p"
    // NULL keys AND NULL timestamps never match (ASOF's `l.ts >= r.ts` is
    // false for NULL; an unfiltered null-ts row would sort to the partition
    // start and pollute every left row's running last)
    val r = right.where(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as(ts),
        struct(payload.map(col): _*).as(p), lit(0).as(tag))
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(p, lit(null).cast(r.schema(p).dataType))
      .withColumn(tag, lit(1))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(tag).asc, col(p).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(p, last(col(p), ignoreNulls = true).over(w))
      .where(col(tag) === 1)
      .drop(tag, ts)
      .select(left.columns.map(col) ++
        payload.map(c => col(s"$p.$c").as(s"$prefix$c")): _*)
  }
}
