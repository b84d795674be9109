package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality measurement: recall@k, MRR@k, nDCG@k of a SYSTEM
  * ranking against an exact TRUTH ranking, per query.
  *
  * This closes the serving loop: the engine ships lexical (BM25), vector
  * (LSH/IVF/PQ/graph) and hybrid serving paths, and until now their quality
  * was asserted only in specs (GraphAnnRecallSpec, SimilaritySpec). This
  * operator makes "how good is the ANN ranking" a first-class, oracle-gated
  * query over (ranking, ranking) inputs, so a curation pipeline can gate an
  * index rollout on measured recall the same way it gates dedup on measured
  * dup fraction.
  *
  * Determinism contract (why this is hash-oracle-able): no transcendental
  * function ever runs inside either engine. The nDCG discount table
  * 1/log2(r+1) is computed ONCE in Scala ([[discountsFp]]), quantized to
  * 1e-9 fixed point, and the SAME integer literals are embedded in the
  * Spark plan (a k-arm CASE, codegen-friendly) and in the DuckDB oracle
  * ([[discountsSqlValues]]). DCG and ideal-DCG are therefore integer sums —
  * fold-order-free, so Spark's partial aggregation cannot perturb them —
  * and each final metric is one IEEE division of exact integers (both
  * operands < 2^53, so the doubles are exact and the division is correctly
  * rounded identically everywhere), rounded to 6 dp.
  *
  * Scale: the INPUTS are rankings — |queries|·k rows, never corpora. The
  * op itself is two tiny hash aggregations and one broadcast-size join;
  * the heavy lifting (producing the rankings) stays in the serving
  * operators being measured. At 100 TB the eval runs over a sampled query
  * panel and costs what the panel's serving costs — the metric layer adds
  * O(|panel|·k) work regardless of corpus size.
  */
object RetrievalEval {

  /** (rank, discount) at 1e-9 fixed point: disc(r) = 1/log2(r+1), so
    * disc(1) = 1e9 exactly. Computed host-side only — both engines consume
    * the resulting integers as literals. */
  def discountsFp(k: Int): Seq[(Int, Long)] =
    (1 to k).map(r => r -> math.round(1e9 * math.log(2.0) / math.log(r + 1.0)))

  /** Ideal-DCG prefix sums: idcg(n) = Σ_{r ≤ n} disc(r), n = 1..k — the
    * DCG of a ranking whose first n slots are all relevant (binary gains,
    * n = |truth∩top-k| ≤ k truth docs). */
  def idcgPrefixFp(k: Int): Seq[(Int, Long)] = {
    val d = discountsFp(k).map(_._2)
    (1 to k).map(n => n -> d.take(n).sum)
  }

  /** `(VALUES (1, 1000000000::BIGINT), ...) disc(r, fp)` — the identical
    * discount constants for a DuckDB oracle. */
  def discountsSqlValues(k: Int): String =
    discountsFp(k).map { case (r, fp) => s"($r, ${fp}::BIGINT)" }
      .mkString("(VALUES ", ", ", ") disc(r, fp)")

  /** `(VALUES (1, ...), ...) idcg(n, fp)` — ideal-DCG prefix sums for a
    * DuckDB oracle. */
  def idcgSqlValues(k: Int): String =
    idcgPrefixFp(k).map { case (n, fp) => s"($n, ${fp}::BIGINT)" }
      .mkString("(VALUES ", ", ", ") idcg(n, fp)")

  /** k-arm literal CASE lookup — keeps the discount table inside
    * whole-stage codegen (no join against a 10-row frame, no map
    * allocation per row). Misses fall to 0, but [[metrics]] filters to
    * rank ≤ k first so every hit row takes a real arm. */
  private def caseLookup(c: Column, table: Seq[(Int, Long)]): Column =
    table.foldLeft(lit(0L)) { case (acc, (r, fp)) =>
      when(c === r, lit(fp)).otherwise(acc)
    }

  /** Per-query metrics of `system` against `truth` — both are
    * `(query_id, doc_id, rank)` frames with 1-based ranks; rows with
    * rank > k are dropped on BOTH sides (the metrics are @k by
    * definition, so longer rankings are evaluated on their prefix).
    * Every query present in `truth` gets an output row; a query the
    * system missed entirely scores recall = mrr = ndcg = 0.
    *
    * Output: (query_id, n_truth, n_hit, recall, mrr, ndcg) ordered by
    * query_id. recall = |hits|/|truth|; mrr = 1/rank of the first system
    * hit; ndcg = binary-gain DCG over system hit positions / ideal DCG of
    * |truth| relevant docs.
    *
    * Contract: inputs are RANKINGS — at most one row per (query_id,
    * doc_id). A caller feeding duplicate doc rows would double-count hits;
    * the operator does not dedup on their behalf (a silent distinct would
    * mask the upstream bug the way the repo's loud-guard convention
    * forbids). */
  def metrics(system: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val sysK = system.where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val truK = truth.where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"))
    val nTruth = truK.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
    val hitAgg = sysK.join(truK, Seq("query_id", "doc_id"))
      .groupBy("query_id").agg(
        count(lit(1)).as("n_hit"),
        sum(caseLookup(col("rank"), discountsFp(k))).as("dcg_fp"),
        min(col("rank")).as("min_rank"))
    nTruth.join(hitAgg, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_truth").cast("double"), 6).as("recall"),
        round(coalesce(lit(1.0) / col("min_rank").cast("double"),
          lit(0.0)), 6).as("mrr"),
        round(coalesce(col("dcg_fp"), lit(0L)).cast("double") /
          caseLookup(col("n_truth"), idcgPrefixFp(k)).cast("double"), 6)
          .as("ndcg"))
      .orderBy(col("query_id"))
  }
}
