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

  test("multi-channel banded == min-over-channels brute force; mixed sentinels pair on the shared channel") {
    // property sweep: two channels derived from the generator's hashes
    for (seed <- 21L to 24L) {
      val hs = sample(sigsGen, seed).distinct
      val sigs = hs.zipWithIndex.map { case (h, i) =>
        (f"s$i%04d", h, java.lang.Long.rotateLeft(h, 17) ^ 0x5aL)
      }
      val df = sigs.map { case (n, h1, h2) => (n, f"$h1%016x", f"$h2%016x") }
        .toDF("name", "x1", "x2")
      val maxH = sample(Gen.choose(0, 7), seed + 90)
      val got = Dedup.hammingNearDups64Multi(df, "name", Seq("x1", "x2"), maxH)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = (for {
        i <- sigs.indices; j <- (i + 1) until sigs.length
        d = math.min(
          java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2),
          java.lang.Long.bitCount(sigs(i)._3 ^ sigs(j)._3)).toLong
        if d <= maxH
      } yield (sigs(i)._1, sigs(j)._1, d)).toSet
      assert(got === want, s"seed=$seed maxH=$maxH")
    }

    // the mixed-sentinel contract (self-review r20 second pass): a row
    // comparable on ONE channel still pairs on that channel; rows with
    // no shared comparable channel never pair
    val h = 0x0123456789abcdefL
    val k = 0x00ff00ff00ff00ffL
    val df = Seq(
      ("a", f"$h%016x", ""),          // channel-1 only
      ("b", f"$h%016x", f"$k%016x"), // both channels
      ("c", "", f"$k%016x")           // channel-2 only
    ).toDF("name", "x1", "x2")
    val got = Dedup.hammingNearDups64Multi(df, "name", Seq("x1", "x2"), 6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("a", "b", 0L), ("b", "c", 0L)),
      s"mixed-sentinel pairs must report on the shared channel only: $got")
  }

  test("multi-channel incremental == directional brute force; mixed sentinel pairs directionally") {
    for (seed <- 31L to 33L) {
      val hs = sample(sigsGen, seed).distinct
      val sigs = hs.zipWithIndex.map { case (h, i) =>
        (f"s$i%04d", h, java.lang.Long.rotateLeft(h, 23) ^ 0x33L)
      }
      val (batch, corpus) = sigs.partition(_._1.stripPrefix("s").toInt % 4 == 0)
      def frame(xs: Seq[(String, Long, Long)]) =
        xs.map { case (n, h1, h2) => (n, f"$h1%016x", f"$h2%016x") }
          .toDF("name", "x1", "x2")
      val maxH = sample(Gen.choose(0, 7), seed + 90)
      val got = Dedup.hammingNearDups64MultiIncr(
          frame(batch), frame(corpus), "name", Seq("x1", "x2"), maxH)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = (for {
        (bn, b1, b2) <- batch; (cn, c1, c2) <- corpus
        d = math.min(java.lang.Long.bitCount(b1 ^ c1),
          java.lang.Long.bitCount(b2 ^ c2)).toLong
        if d <= maxH
      } yield (bn, cn, d)).toSet
      assert(got === want, s"seed=$seed maxH=$maxH")
    }

    // mixed sentinel, directionally: the batch row is channel-2-only,
    // the corpus rows channel-1-only and both-channels
    val h = 0x0f0f0f0f0f0f0f0fL
    val k = 0xfedcba9876543210L
    val batch = Seq(("n", "", f"$k%016x")).toDF("name", "x1", "x2")
    val corpus = Seq(
      ("c1", f"$h%016x", ""),          // no shared channel with the batch
      ("c2", f"$h%016x", f"$k%016x")  // pairs via channel 2
    ).toDF("name", "x1", "x2")
    val got = Dedup.hammingNearDups64MultiIncr(
        batch, corpus, "name", Seq("x1", "x2"), 6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("n", "c2", 0L)),
      s"directional mixed-sentinel must pair only on the shared channel: $got")
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
