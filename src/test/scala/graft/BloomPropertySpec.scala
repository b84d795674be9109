package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bloom

/** Property tests for the Bloom sketch: zero false negatives must hold for
  * ARBITRARY key sets and (m, k) shapes, not just the unit fixtures —
  * that property is what makes the exact-confirm composition exact.
  * Generators use fixed seeds (no scalatest-scalacheck bridge in the
  * offline cache), so failures are reproducible. */
class BloomPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val keysGen: Gen[List[Long]] =
    Gen.choose(1, 400).flatMap(n => Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue)))

  test("no false negatives on arbitrary key sets across (m, k) shapes") {
    for (seed <- 1L to 6L) {
      val keys = sample(keysGen, seed)
      val mBits = sample(Gen.oneOf(64, 1 << 10, 1 << 16), seed + 100)
      val k = sample(Gen.choose(1, 8), seed + 200)
      val df = keys.toDF("s")
      val bits = Bloom.buildBitset(df, "s", mBits, k)
      val misses = df.where(!Bloom.mightContain(col("s"), bits, k)).count()
      assert(misses === 0L,
        s"seed=$seed mBits=$mBits k=$k: $misses inserted keys rejected")
    }
  }

  test("build is order- and partitioning-insensitive") {
    val keys = sample(keysGen, 42L)
    val a = Bloom.buildBitset(keys.toDF("s"), "s", 1 << 12, 5)
    val b = Bloom.buildBitset(keys.reverse.toDF("s").repartition(7), "s", 1 << 12, 5)
    assert(a.toSeq === b.toSeq,
      "bitset must be a pure function of the key SET")
  }

  test("parameter guards reject degenerate shapes") {
    intercept[IllegalArgumentException](Bloom.bitPositions(col("s"), 0, 5))
    intercept[IllegalArgumentException](Bloom.bitPositions(col("s"), 1 << 10, 0))
    intercept[IllegalArgumentException](Bloom.buildBitset(
      Seq(1L).toDF("s"), "s", 100, 5)) // not a multiple of 64
  }
}
