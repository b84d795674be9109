package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PageRank

class PageRankSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRankFp(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("distributed result equals the sequential integer recurrence exactly") {
    // small asymmetric digraph incl. a node with no in-edges (teleport-only)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val got = run(edges, iters = 5)
    val want = PageRank.referenceFp(edges, iters = 5)
    assert(got === want)
  }

  test("two-node cycle: equal ranks, matching the closed recurrence") {
    val got = run(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(got(1L) === got(2L))
    // r_{i+1} = tp + (85 * r_i) / 100, r_0 = scale/2 — replay by hand
    val base = 1000000000000L / 2
    val tp = (15L * base) / 100
    var r = base
    for (_ <- 1 to 5) r = tp + 85L * r / 100
    assert(got(1L) === r)
  }

  test("star graph: center outranks every leaf") {
    val leaves = (2L to 9L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L)))
    val got = run(edges, iters = 5)
    assert(leaves.forall(l => got(1L) > got(l)))
    assert(leaves.map(got).distinct.size === 1) // symmetric leaves tie
  }

  test("rank mass stays within integer-truncation loss of scale") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 1L))
    val got = run(edges, iters = 5)
    val total = got.values.sum
    assert(total <= 1000000000000L)
    assert(total > 990000000000L, s"mass $total lost more than 1%")
  }

  test("empty graph fails loudly") {
    val e = intercept[IllegalArgumentException] {
      PageRank.pageRankFp(Seq.empty[(Long, Long)].toDF("src", "dst"), 5)
    }
    assert(e.getMessage.contains("empty graph"))
  }

  test("co-purchase query: 20 rows, totally ordered, positive ranks") {
    val out = graft.queries.PipelineQueries.pagerank(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 20)
    val ranks = out.map(_.getAs[Long]("rank_fp"))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    assert(ranks.forall(_ > 0))
  }
}
