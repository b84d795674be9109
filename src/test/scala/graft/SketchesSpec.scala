package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Count-Min and HyperLogLog as deterministic DataFrame aggregates. */
class SketchesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 100×"a", 10×"b", 1×"c", plus 50 distinct one-off items.
  private lazy val items = (Seq.fill(100)("a") ++ Seq.fill(10)("b") ++ Seq("c")
    ++ (0 until 50).map(i => s"item$i")).toDF("item")

  test("CMS: exact at ample width, never underestimates when squeezed") {
    val wide = Sketches.cmsEstimate(
      Sketches.cmsBuild(items, "item", depth = 4, width = 1024),
      Seq("a", "b", "c", "nope"), depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    assert(wide === Map("a" -> 100L, "b" -> 10L, "c" -> 1L, "nope" -> 0L))
    // width 4 forces collisions: estimates may rise, never fall
    val tight = Sketches.cmsEstimate(
      Sketches.cmsBuild(items, "item", depth = 4, width = 4),
      Seq("a", "b", "c"), depth = 4, width = 4)
      .as[(String, Long)].collect().toMap
    assert(tight("a") >= 100L && tight("b") >= 10L && tight("c") >= 1L)
  }

  test("CMS: driver-side probe keys equal the executor-side cell chain") {
    val sketch = Sketches.cmsBuild(Seq("zeta").toDF("item"), "item",
      depth = 4, width = 256).as[(Int, Long, Long)].collect()
      .map { case (r, c, n) => (r, c) -> n }.toMap
    val local = Sketches.cmsCellsLocal("zeta", depth = 4, width = 256)
    local.foreach { case (i, c) =>
      assert(sketch((i, c)) === 1L, s"row $i col $c must hold the single item")
    }
  }

  test("HLL: estimate within the documented error envelope; empties counted") {
    val n = 2000
    val distinct = spark.range(n).select(concat(lit("doc-"), col("id")).as("item"))
    val row = Sketches.hllEstimate(distinct, "item", bBits = 6)
      .as[(Long, Long, Double)].collect().head
    val (m, _, est) = row
    assert(m === 64L)
    // raw HLL stderr is 1.04/√m ≈ 13%; allow 3σ
    assert(math.abs(est - n) / n < 0.4, s"est $est too far from $n")
    // duplicates must not move the estimate (cardinality, not count)
    val withDups = distinct.union(distinct).union(distinct)
    val est2 = Sketches.hllEstimate(withDups, "item", bBits = 6)
      .as[(Long, Long, Double)].collect().head._3
    assert(est2 === est)
  }

  test("HLL: register merge (union + max) equals single-pass registers") {
    val a = spark.range(1000).select(concat(lit("x"), col("id")).as("item"))
    val b = spark.range(500, 1500).select(concat(lit("x"), col("id")).as("item"))
    val whole = Sketches.hllRegisters(a.union(b), "item", 6)
      .as[(Long, Int)].collect().toMap
    val merged = Sketches.hllMergeRegisters(Seq(
        Sketches.hllRegisters(a, "item", 6), Sketches.hllRegisters(b, "item", 6)))
      .as[(Long, Int)].collect().toMap
    assert(merged === whole)
    // and the estimate off the merged registers equals the one-pass estimate
    val estWhole = Sketches.hllEstimate(a.union(b), "item", 6)
      .as[(Long, Long, Double)].collect().head
    val estMerged = Sketches.hllEstimateFromRegisters(Sketches.hllMergeRegisters(Seq(
        Sketches.hllRegisters(a, "item", 6), Sketches.hllRegisters(b, "item", 6))), 6)
      .as[(Long, Long, Double)].collect().head
    assert(estMerged === estWhole)
  }

  test("bottom-k sample: deterministic, mergeable, quantile estimate tracks exact") {
    val rows = spark.range(5000).select(col("id"), (col("id") % 1000).cast("double").as("v"))
    val s1 = Sketches.bottomKSample(rows, "id", 200).as[(Long, Double, String)].collect().toSet
    val s2 = Sketches.bottomKSample(rows, "id", 200).as[(Long, Double, String)].collect().toSet
    assert(s1 === s2 && s1.size === 200)
    // merge: re-cutting the union of two shard samples = sample of the union
    val a = rows.where(col("id") < 2500)
    val b = rows.where(col("id") >= 2500)
    val merged = Sketches.bottomKSample(
        Sketches.bottomKSample(a, "id", 200).unionByName(Sketches.bottomKSample(b, "id", 200))
          .drop("rnk"), "id", 200)
      .as[(Long, Double, String)].collect().toSet
    assert(merged === s1)
    // quantile estimate from the sample lands near the exact value
    // (v is uniform on [0, 1000) — exact p50 = 499.5)
    val est = Sketches.bottomKSample(rows, "id", 200)
      .agg(percentile(col("v"), lit(0.5)).as("p")).as[Double].collect().head
    assert(math.abs(est - 499.5) < 150, s"sample p50 $est too far from 499.5")
    // the global cut is TakeOrderedAndProject — never a full sort
    val plan = Sketches.bottomKSample(rows, "id", 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject(limit=200"), plan.take(500))
  }

  test("per-group bottom-k sample: k rows per group, payload kept, no window sort") {
    val rows = spark.range(3000).select(col("id"),
      (col("id") % 3).cast("string").as("g"), (col("id") * 2).cast("double").as("v"))
    val sampled = Sketches.bottomKSamplePerGroup(rows, "g", "id", 50)
    val counts = sampled.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts === Map("0" -> 50L, "1" -> 50L, "2" -> 50L))
    // payload column rides along and is consistent with the id
    assert(sampled.where(col("v") =!= col("id") * 2).count() === 0)
    // deterministic across invocations
    val again = Sketches.bottomKSamplePerGroup(rows, "g", "id", 50)
      .select("id").as[Long].collect().toSet
    assert(again === sampled.select("id").as[Long].collect().toSet)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK") && !plan.contains("Window"))
  }

  test("HLL: inclusion-exclusion intersection estimate tracks true overlap") {
    val a = spark.range(1000).select(concat(lit("x"), col("id")).as("item"))
    val b = spark.range(500, 1500).select(concat(lit("x"), col("id")).as("item"))
    val ra = Sketches.hllRegisters(a, "item", 6)
    val rb = Sketches.hllRegisters(b, "item", 6)
    val row = Sketches.hllIntersectEstimate(ra, rb, 6)
      .as[(Double, Double, Double, Double)].collect().head
    val (ea, eb, eu, ei) = row
    // the algebra must hold exactly (same doubles on both sides)
    assert(ei === math.rint((ea + eb - eu) * 100) / 100)
    // true |A∩B| = 500; three compounding ±13% estimates — allow wide slack
    assert(ei > 0 && ei < 1500, s"intersect estimate $ei wildly off 500")
    // self-intersection: est(A∩A) = est(A) because merge(A,A) = A
    val self = Sketches.hllIntersectEstimate(ra, ra, 6)
      .as[(Double, Double, Double, Double)].collect().head
    assert(self._4 === self._1 && self._3 === self._1)
  }

  test("CMS: shard merge (union + sum) equals the single-pass sketch, 3 shards") {
    val shards = Seq(0, 1, 2).map(p =>
      spark.range(900).where(pmod(col("id"), lit(3)) === p)
        .select(concat(lit("w"), pmod(col("id"), lit(37))).as("item")))
    val whole = Sketches.cmsBuild(shards.reduce(_ union _), "item")
      .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    val merged = Sketches.cmsMerge(shards.map(Sketches.cmsBuild(_, "item")))
      .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    assert(merged === whole)
    assert(whole.nonEmpty)
  }
}
