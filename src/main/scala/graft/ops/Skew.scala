package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys.
  *
  * Spark's AQE rebalances skewed SHUFFLE JOIN partitions automatically
  * (`spark.sql.adaptive.skewJoin.enabled`), but two shapes still need manual
  * salting at 100 TB:
  *  - a skewed GROUP-BY (one hot group key lands on one reducer — AQE cannot
  *    split a single aggregation key);
  *  - a broadcast-ineligible skewed join where the build side must be
  *    replicated per salt (e.g. under storage-partitioned or bucketed joins
  *    where AQE's split would break co-location).
  *
  * Both transforms are pure plan rewrites: results are provably identical to
  * the unsalted plan (the salt column is an internal uniformizer that every
  * output aggregates or drops).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Uniform deterministic-per-run salt in [0, salt). Derived from
    * `monotonically_increasing_id` (partition id ⊕ row index), so it is
    * uniform within every scan partition — which is exactly what spreads a
    * hot key across reducers. No data column is consumed.
    *
    * RETRY CAVEAT (SPARK-23207 class): `monotonically_increasing_id` is
    * position-based, so if an upstream SHUFFLE stage is partially recomputed
    * after a fetch failure, rows can re-arrive in a different order and get
    * different salts — rows may be double-counted or lost in the partial
    * aggregate. Directly over a deterministic scan (the common case for a
    * first-stage salted agg) positions are stable and this cannot happen;
    * when salting above a shuffle on a real cluster, prefer
    * [[saltFromCols]], whose salt is a pure function of row content. */
  private def saltExpr(salt: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong))

  /** Retry-safe salt: a pure function of data columns, so a recomputed row
    * always lands on the same reducer. Include enough payload columns to
    * spread the hot key (hashing only the group key would put every hot row
    * in one salt bucket and defeat the salting). */
  def saltFromCols(salt: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salt.toLong))

  /** Two-phase salted aggregation for skewed group keys: phase 1 shuffles on
    * (key, salt) — the hot key's rows split across `salt` reducers — and
    * phase 2 merges the `salt` partials per key (tiny: |keys|·salt rows).
    * Expressed for algebraic aggregates; count and sum are provided, and the
    * same shape extends to min/max/avg (sum/count pair).
    *
    * NOTE Spark's partial aggregation (map-side combine) already handles
    * most group-by skew; salting matters when per-key state is too large to
    * combine map-side (exact distincts, collect-style accumulators). */
  /** A caller-supplied salt column is re-modded into [0, salt): without
    * this, `saltFromCols(32, ...)` passed alongside `salt = 16` would emit
    * salt values ≥ 16 — harmless for the salted AGG (extra partials merge in
    * phase 2) but silently row-dropping for the salted JOIN (no replica
    * matches) — so both entry points normalize the modulus identically. */
  private def normSalt(salt: Int, saltSource: Option[Column]): Column =
    saltSource.map(s => pmod(s, lit(salt.toLong))).getOrElse(saltExpr(salt))

  def saltedCounts(df: DataFrame, key: String, salt: Int = 16,
                   saltSource: Option[Column] = None): DataFrame =
    df.select(col(key), normSalt(salt, saltSource).as(SaltCol))
      .groupBy(col(key), col(SaltCol))
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(col(key))
      .agg(sum(col("partial_cnt")).as("cnt"))

  /** Salted inner equi-join: the probe side gets a uniform salt, the build
    * side is replicated once per salt value, and the join key becomes
    * (key, salt). A key with 10⁹ rows becomes `salt` tasks of 10⁹/salt rows
    * instead of one straggler. Build-side cost: |build| × salt rows — use
    * for small-but-not-broadcastable build sides. Result is identical to
    * `probe.join(build, key)` (every probe row meets exactly one replica). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salt: Int = 16, saltSource: Option[Column] = None): DataFrame = {
    val saltedProbe = probe.withColumn(SaltCol, normSalt(salt, saltSource))
    val replicatedBuild = build.withColumn(
      SaltCol, explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, SaltCol)).drop(SaltCol)
  }
}
