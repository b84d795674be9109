package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Indexes, Similarity}
import graft.queries.PipelineQueries

/** Measures the semantic-dedup sub-blocking RECALL trade (VERDICT r9 #3):
  * the scaladoc names the hyperplane survival formula `(1 − θ/π)^b`; this
  * spec turns it into numbers on the REAL fixture at the registered
  * q_semantic_dedup_blocked configuration (coarse k=16 quantizer,
  * maxCellSize=8 — every cell oversized, so sub-blocking fires for real).
  *
  * MEASURED (sf0.001, deterministic — fixed fixture, seed, and planes):
  * all 66 brute-force true pairs sit at cos 0.40–0.48, the decision-boundary
  * worst case (the near-uniform fixture is the documented adversarial shape
  * for sign-LSH, same as the ANN banding note in Similarity.scala). Round 11
  * added 2 margin bits to the b derivation (hyperplane-imbalance headroom,
  * sized from a measured 10×-corpus block overflow — see semanticDedupPairs),
  * so the derived b here rose 3 → 5 and the formula's predicted mean
  * survival dropped ≈ 0.26 → ≈ 0.13; the primary check is formula-vs-
  * measurement consistency (±0.25), with a 0.05 floor against a silently
  * broken derivation. The synthetic high-cosine check demonstrates the
  * regime the operator actually targets (SemDeDup prunes near-duplicates,
  * cos ≥ 0.9, where per-bit survival is ≈ 0.9).
  *
  * Two recall numbers, separating the two documented sacrifice mechanisms:
  *  - same-cell recall: of the true cosine pairs that share a coarse cell
  *    (the pairs cell-blocking would have found), the fraction surviving
  *    hyperplane sub-blocking — THE number the sub-block trade costs;
  *  - end-to-end recall vs brute force: additionally pays the cross-cell
  *    sacrifice inherent to SemDeDup cell blocking (present even unblocked).
  */
class SemanticDedupRecallSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"
  private val threshold = 0.4

  private def pairKeys(df: DataFrame): Set[(Long, Long)] =
    df.select(col("vec_a").cast("long"), col("vec_b").cast("long"))
      .collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1)))

  test("sub-blocking recall at (k=16, maxCellSize=8) clears the floor") {
    val emb = graft.engine.Tables.embeddings(spark, d)
    val cent = spark.read.parquet(PipelineQueries.ivfCentroidsPath)
    val idx = Indexes.ensureIvfIndex(spark, emb, cent, d, nCells = 16)

    // Brute-force truth: every cosine pair above threshold (500 vectors →
    // 124,750 candidate pairs; zero-norm vectors excluded on both sides,
    // same nrm > 0 guard as the operator).
    val e = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm")).where(col("nrm") > 0d)
    val brute = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("nrm").as("na"))
      .crossJoin(e.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb")))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(graft.functions.DotProduct.dot(col("ea"), col("eb")) /
          (col("na") * col("nb")), 6).as("cos"))
      .where(col("cos") > threshold)
    val bruteSet = pairKeys(brute)
    assert(bruteSet.nonEmpty, "no brute-force pairs above threshold — fixture drift?")

    // Cell-blocked (no sub-blocking pressure): maxCellSize high enough that
    // every cell is in-bound — the pairs SemDeDup cell blocking finds.
    val cellSet = pairKeys(Indexes.semanticDedupPairs(emb, idx, threshold,
      maxCellSize = 1L << 16))
    // Sub-blocked at the registered configuration: every k=16 cell exceeds
    // maxCellSize=8, so all members go through hyperplane sign-bit blocking.
    val blockedSet = pairKeys(Indexes.semanticDedupPairs(emb, idx, threshold,
      maxCellSize = 8L))

    assert(blockedSet.subsetOf(cellSet),
      "sub-blocking must only REMOVE candidate pairs, never invent them")
    assert(cellSet.subsetOf(bruteSet),
      "cell-blocked pairs must be true cosine pairs (exact re-rank)")

    val sameCellRecall = blockedSet.size.toDouble / cellSet.size
    val e2eRecall = blockedSet.size.toDouble / bruteSet.size
    val cellOnlyRecall = cellSet.size.toDouble / bruteSet.size

    // Formula prediction for THESE pairs: mean (1 − θ/π)^b over the
    // same-cell true pair set, at the operator's derived b (smallest i with
    // 8 << i ≥ 4 × biggest cell — recomputed here the same way).
    val cellCounts = spark.read.parquet(idx).groupBy(col("cell")).count()
      .agg(max(col("count"))).head().getLong(0)
    // same derivation as the operator: 2 margin bits (4× over-provision)
    // against hyperplane imbalance — see semanticDedupPairs
    val b = (0 to 32).find(i => (8L << i) >= (cellCounts << 2)).getOrElse(32)
    val cosOf = brute.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      r.getDouble(2)).toMap
    val predicted = cellSet.toSeq.map { p =>
      math.pow(1.0 - math.acos(math.min(cosOf(p), 1.0)) / math.Pi, b.toDouble)
    }.sum / cellSet.size

    info(f"brute pairs=${bruteSet.size}, same-cell pairs=${cellSet.size} " +
      f"(cell-blocking recall $cellOnlyRecall%.3f), sub-blocked survivors=" +
      f"${blockedSet.size} (same-cell recall $sameCellRecall%.3f, " +
      f"end-to-end $e2eRecall%.3f); derived b=$b, formula predicts " +
      f"$predicted%.3f")

    // The formula the scaladoc advertises must match the measurement: with
    // only ~13 boundary-cosine pairs the binomial sd is ~0.12, so the band
    // is ±0.25 absolute — wide, but enough to catch a broken derivation
    // (e.g. wrong b, wrong planes), which shows up as recall ≈ 0 or ≈ 1.
    assert(math.abs(sameCellRecall - predicted) <= 0.25,
      f"measured same-cell recall $sameCellRecall%.3f is inconsistent with " +
        f"the formula's $predicted%.3f at b=$b")
    // The honest fixture floor (deterministic: fixed seed, fixed fixture):
    // the fixture's pairs all sit at the cos 0.40-0.48 decision boundary,
    // the worst case for sign-LSH, and the round-11 margin bits (b 3 → 5
    // here) lowered the formula's prediction to ~0.13 — the 0.05 floor
    // guards against a silently broken derivation (recall ≈ 0) while the
    // ±0.25 formula-consistency band above stays the primary check.
    assert(sameCellRecall >= 0.05,
      f"sub-blocking recall $sameCellRecall%.3f fell below the 0.05 floor " +
        f"(${blockedSet.size} of ${cellSet.size} same-cell pairs survived)")
  }

  test("high-cosine near-dup pairs survive sub-blocking at the >= 0.7 regime") {
    // The fixture has NO pairs above cos 0.48, so the regime SemDeDup
    // actually targets (near-duplicates, cos >= 0.9) is demonstrated on
    // deterministic synthetic clones: 100 fixture vectors, each paired with
    // a slightly-perturbed copy (cos > 0.95), bucketed by the SAME planes
    // machinery at b = 3. Formula: per-bit survival 1 − θ/π ≈ 0.93 →
    // ~0.81 for 3 bits; floor 0.7 leaves room for plane geometry.
    val emb = graft.engine.Tables.embeddings(spark, d).limit(100)
    val b = 3
    val perturbed = emb.select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => x + (hash(col("vec_id"), i) % 100).cast("double") / lit(2000.0)
      ).as("embedding"))
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"),
          Similarity.lshBucket(col("embedding"), b, 64, 4242L).as("sub"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orig = buckets(emb)
    val pert = buckets(perturbed)
    val survived = orig.keys.count(k => orig(k) == pert(k))
    info(s"synthetic near-dup pairs surviving b=$b sub-blocking: " +
      s"$survived/${orig.size}")
    assert(survived >= 70,
      s"only $survived/100 high-cosine pairs survived — sub-blocking would " +
        "lose real near-duplicates at mass")
  }
}
