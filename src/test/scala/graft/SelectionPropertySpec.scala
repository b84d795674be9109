package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Selection

/** Property tests for the data-selection family: the invariants must hold
  * for ARBITRARY small corpora and candidate geometries, not just the
  * planted fixtures. Fixed-seed convention per CorpusPropertySpec. */
class SelectionPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
  private val doc: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private def corpus(seed: Long): Seq[(Long, String, String)] = {
    val n = sample(Gen.choose(4, 14), seed)
    (0L until n.toLong).map { i =>
      val src = if (i % 3 == 0) "tgt" else s"raw${i % 2}"
      (i, src, sample(doc, seed * 7919 + i))
    }
  }
  private val isTarget = col("source") === "tgt"

  test("stateless scorer == exploded scorer on arbitrary corpora") {
    for (seed <- 1L to 6L) {
      val docs = corpus(seed).toDF("doc_id", "source", "text")
      val model = Selection.dsirModel(docs, isTarget)
      val exploded = Selection.importanceWeightsQuantized(docs, isTarget)
        .select(col("doc_id"), col("s")).as[(Long, Long)].collect().toMap
      val stateless = Selection.dsirScoredStateless(docs.where(!isTarget), model)
        .select(col("doc_id"), col("s")).as[(Long, Long)].collect().toMap
      assert(stateless === exploded, s"seed=$seed")
    }
  }

  test("gumbel selection == top-k of the recomputed keys; prefix-monotone in k") {
    for (seed <- 1L to 4L) {
      val docs = corpus(seed).toDF("doc_id", "source", "text")
      val keys = Selection.importanceWeightsQuantized(docs, isTarget)
        .select(col("doc_id"),
          Selection.gumbelKeyQuantized(col("doc_id"), col("s")).as("kq"))
        .as[(Long, Long)].collect().toSeq
      val expectedOrder = keys.sortBy { case (id, kq) => (-kq, id) }.map(_._1)
      for (k <- Seq(1, 3, expectedOrder.length + 5)) {
        val sel = Selection.dsirSelect(docs, isTarget, k)
          .select(col("doc_id")).as[Long].collect().toSeq
        assert(sel === expectedOrder.take(k), s"seed=$seed k=$k")
      }
    }
  }

  private def randEmb(seed: Long, n: Int, dim: Int = 6): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { i =>
      val v = Array.tabulate(dim) { k =>
        // mix64-derived floats in [-1, 1), never all-zero (last dim offset)
        val h = graft.ops.TextOps.mix64(seed * 100003 + i * 17 + k)
        ((h % 1000).toFloat / 1000f) + (if (k == dim - 1) 1.5f else 0f)
      }
      (i, v)
    }

  test("mmr: λ=1 is exactly relevance order; picks are distinct candidates") {
    for (seed <- 1L to 4L) {
      val emb = randEmb(seed, 12).toDF("vec_id", "embedding")
      val pure = Selection.mmrRerank(emb, queryId = 0L, nCandidates = 8,
        k = 5, lambdaTenths = 10)
        .select(col("vec_id"), col("rel")).as[(Long, Double)].collect().toSeq
      assert(pure.map(_._2).reverse === pure.map(_._2).reverse.sorted,
        s"seed=$seed: λ=1 must be rel-descending")
      for (lam <- Seq(0, 3, 7)) {
        val sel = Selection.mmrRerank(emb, 0L, nCandidates = 8, k = 5,
          lambdaTenths = lam).select(col("vec_id")).as[Long].collect().toSeq
        assert(sel.distinct.length === sel.length, s"seed=$seed λ=$lam")
        assert(sel.length === 5)
        // every pick is a true top-8 candidate
        val cand = Selection.mmrRerank(emb, 0L, nCandidates = 8, k = 8,
          lambdaTenths = 10).select(col("vec_id")).as[Long].collect().toSet
        assert(sel.forall(cand), s"seed=$seed λ=$lam")
      }
    }
  }

  test("k-center: spread is non-increasing in rank (greedy max-min monotone)") {
    for (seed <- 1L to 4L) {
      val emb = randEmb(seed, 16).toDF("vec_id", "embedding")
      val cents = Seq((0, Array(1.0, 0.0, 0.0, 0.0, 0.0, 1.0)),
        (1, Array(-1.0, 0.0, 0.0, 0.0, 0.0, 1.0))).toDF("cell", "centroid")
      val got = Selection.kCenterPerCell(emb, cents, reps = 4)
        .select(col("cell"), col("rank"), col("spread"))
        .as[(Long, Long, Option[Double])].collect().toSeq
      got.groupBy(_._1).foreach { case (cell, rows) =>
        val spreads = rows.sortBy(_._2).flatMap(_._3)
        assert(spreads === spreads.sorted(Ordering[Double].reverse),
          s"seed=$seed cell=$cell: $spreads")
      }
      // ids unique within a cell
      val perCell = Selection.kCenterPerCell(emb, cents, reps = 4)
        .select(col("cell"), col("vec_id")).as[(Long, Long)].collect().toSeq
      assert(perCell.distinct.length === perCell.length)
    }
  }

  test("temperature mix: shares sum to 1; boost strictly anti-monotone in p for α<1") {
    for (seed <- 1L to 4L) {
      val docs = corpus(seed).toDF("doc_id", "source", "text")
      val rows = Selection.temperatureMix(docs, alpha = 0.4)
        .select(col("p"), col("q"), col("boost"))
        .as[(Double, Double, Double)].collect().toSeq
      assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, s"seed=$seed")
      val byP = rows.sortBy(_._1)
      byP.sliding(2).foreach {
        case Seq((p1, _, b1), (p2, _, b2)) if p2 > p1 + 1e-9 =>
          assert(b2 <= b1 + 1e-6, s"seed=$seed: boost must fall as p rises")
        case _ =>
      }
    }
  }
}
