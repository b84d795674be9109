package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Property tests for the 64-bit banded Hamming blocking: pigeonhole
  * completeness (banded == brute force whenever maxHamming < bands)
  * must hold for ARBITRARY signature sets and band shapes, not just the
  * 26-image fixture — it is the claim that makes the banding pure
  * blocking rather than a recall trade. Generators are seed-fixed (no
  * scalatest-scalacheck bridge in the offline cache), and signatures
  * are biased toward SHARED PREFIXES so near pairs actually occur. */
class HammingBandingPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Cluster-shaped corpus: a few base hashes, each with several
    * low-bit-flip variants (near pairs) plus uniform noise rows. */
  private val sigsGen: Gen[List[Long]] = for {
    bases <- Gen.listOfN(6, Gen.choose(Long.MinValue, Long.MaxValue))
    variants <- Gen.listOfN(30, for {
      b <- Gen.oneOf(bases)
      nFlips <- Gen.choose(0, 9)
      bits <- Gen.listOfN(nFlips, Gen.choose(0, 63))
    } yield bits.foldLeft(b)((h, i) => h ^ (1L << i)))
    noise <- Gen.listOfN(20, Gen.choose(Long.MinValue, Long.MaxValue))
  } yield bases ++ variants ++ noise

  private def brute(sigs: Seq[(String, Long)], maxH: Int) =
    (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2).toLong
      if d <= maxH
    } yield {
      val (a, b) =
        if (sigs(i)._1 < sigs(j)._1) (sigs(i)._1, sigs(j)._1)
        else (sigs(j)._1, sigs(i)._1)
      (a, b, d)
    }).toSet

  test("banded == brute force for every maxHamming < bands (self-join)") {
    for (seed <- 1L to 5L) {
      val hs = sample(sigsGen, seed).distinct
      val sigs = hs.zipWithIndex.map { case (h, i) => (f"s$i%04d", h) }
      val df = sigs.map { case (n, h) => (n, f"$h%016x") }
        .toDF("name", "ahash_hex")
      val bands = sample(Gen.oneOf(2, 4, 8, 16), seed + 50)
      val maxH = sample(Gen.choose(0, bands - 1), seed + 90)
      val got = Dedup.hammingNearDups64(df, "name", "ahash_hex", maxH, bands)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got === brute(sigs, maxH),
        s"seed=$seed bands=$bands maxH=$maxH")
    }
  }

  test("incremental banded == brute force restricted to batch×corpus") {
    for (seed <- 11L to 14L) {
      val hs = sample(sigsGen, seed).distinct
      val sigs = hs.zipWithIndex.map { case (h, i) => (f"s$i%04d", h) }
      val (batch, corpus) = sigs.partition(_._1.stripPrefix("s").toInt % 5 == 0)
      def frame(xs: Seq[(String, Long)]) =
        xs.map { case (n, h) => (n, f"$h%016x") }.toDF("name", "ahash_hex")
      val maxH = sample(Gen.choose(0, 7), seed + 90)
      val got = Dedup.hammingNearDups64Incr(
          frame(batch), frame(corpus), "name", "ahash_hex", maxH)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = (for {
        (bn, bh) <- batch; (cn, ch) <- corpus
        d = java.lang.Long.bitCount(bh ^ ch).toLong
        if d <= maxH
      } yield (bn, cn, d)).toSet
      assert(got === want, s"seed=$seed maxH=$maxH")
    }
  }
}
