package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphMetrics

class GraphMetricsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    GraphMetrics.triangleStats(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (n, d, t, l) => n -> (d, t, l) }.toMap

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphMetrics.labelPropagation(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("triangle: K4 — every node in 3 triangles, LCC = 1") {
    val nodes = 1L to 4L
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val got = triangles(edges)
    nodes.foreach { n => assert(got(n) === ((3L, 3L, 1000000L)), s"node $n") }
  }

  test("triangle: one triangle plus a pendant — counts and fixed-point LCC") {
    // triangle {1,2,3}, pendant 4 hanging off 3
    val got = triangles(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(got(1L) === ((2L, 1L, 1000000L)))
    assert(got(2L) === ((2L, 1L, 1000000L)))
    // deg 3, 1 triangle: 2*1e6/ (3*2) = 333333 (floor)
    assert(got(3L) === ((3L, 1L, 333333L)))
    assert(got(4L) === ((1L, 0L, 0L))) // deg < 2 → 0 by convention
  }

  test("triangle: square has no triangles; direction/duplicates/self-loops ignored") {
    val got = triangles(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L),
      (1L, 1L), (4L, 1L)))
    assert(got.values.forall { case (_, t, l) => t === 0L && l === 0L })
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_._1 === 2L))
  }

  test("triangle: distributed equals the sequential twin on a mixed random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    assert(triangles(edges) === GraphMetrics.referenceTriangleStats(edges))
  }

  test("triangle: skewed hub (star + clique) matches twin — the last-reducer shape") {
    // hub 0 connected to all of 1..30; clique on 1..6
    val star = (1L to 30L).map(l => (0L, l))
    val clique = for (a <- 1L to 6L; b <- 1L to 6L if a < b) yield (a, b)
    val edges = star ++ clique
    assert(triangles(edges) === GraphMetrics.referenceTriangleStats(edges))
  }

  test("lpa: two cliques joined by one bridge edge resolve to two communities") {
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = clique(1L to 4L) ++ clique(11L to 14L) :+ ((4L, 11L))
    val got = lpa(edges, iters = 4)
    // each clique converges to its min label (smallest-label tie-break)
    assert((1L to 4L).map(got).distinct.size === 1)
    assert((11L to 14L).map(got).distinct.size === 1)
    assert(got(1L) !== got(12L))
  }

  test("lpa: distributed equals the sequential twin per round count") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    for (it <- Seq(1, 2, 4)) {
      assert(lpa(edges, it) === GraphMetrics.referenceLabelPropagation(edges, it),
        s"iters=$it")
    }
  }

  private def kcore(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    GraphMetrics.kCore(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long)].collect().toMap

  test("kcore: triangle with pendant chains peels to the triangle at k=2") {
    // triangle {1,2,3}; chain 3-4-5 peels away over two rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val got = kcore(edges, k = 2, rounds = 4)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: K4 survives k=3; adding one spoke node does not") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val got = kcore(k4 :+ ((1L, 9L)), k = 3, rounds = 3)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kcore: everything below k vanishes to an empty result") {
    assert(kcore(Seq((1L, 2L), (2L, 3L)), k = 3, rounds = 2) === Map.empty)
  }

  test("kcore: distributed equals the sequential twin, incl. unconverged low round counts") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    for (r <- Seq(1, 2, 4)) {
      assert(kcore(edges, 3, r) === GraphMetrics.referenceKCore(edges, 3, r),
        s"rounds=$r")
    }
  }

  test("kcore: parameter bounds fail loudly") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](GraphMetrics.kCore(df, 1, 4))
    intercept[IllegalArgumentException](GraphMetrics.kCore(df, 3, 0))
    intercept[IllegalArgumentException](GraphMetrics.kCore(df, 3, 17))
  }

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], rounds: Int): Map[Long, Long] =
    GraphMetrics.bfsHops(edges.toDF("src", "dst"), seeds, rounds)
      .as[(Long, Long)].collect().toMap

  test("bfs: chain distances from one seed; truncation leaves the sentinel") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = bfs(chain, Seq(1L), rounds = 3)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> GraphMetrics.BfsInf, 6L -> GraphMetrics.BfsInf))
  }

  test("bfs: multi-source takes the nearest seed; disconnected part stays unreached") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val got = bfs(edges, Seq(1L, 10L), rounds = 4)
    assert(got(3L) === 2L)
    assert(got(11L) === 1L)
    assert(got(20L) === GraphMetrics.BfsInf)
    assert(got(21L) === GraphMetrics.BfsInf)
  }

  test("bfs: distributed equals the sequential twin; seed absent from graph is inert") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    for (r <- Seq(1, 2, 4)) {
      val seeds = Seq(0L, 7L, 999L) // 999 not in the graph
      assert(bfs(edges, seeds, r) ===
        GraphMetrics.referenceBfsHops(edges, seeds, r), s"rounds=$r")
    }
  }

  test("bfs: parameter bounds fail loudly") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](GraphMetrics.bfsHops(df, Seq(1L), 0))
    intercept[IllegalArgumentException](GraphMetrics.bfsHops(df, Seq.empty, 4))
    intercept[IllegalArgumentException](GraphMetrics.bfsHops(df, Seq(1L, 1L), 4))
  }

  private def wlpa(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    GraphMetrics.labelPropagationWeighted(edges.toDF("src", "dst", "w_fp"), iters)
      .as[(Long, Long)].collect().toMap

  test("wlpa: a heavy edge outvotes two light ones") {
    // node 3 hears label 1 with weight 10 and labels {2, 4} with 1 each;
    // unweighted it would adopt min(1,2,4)=1 anyway, so give the heavy
    // vote to the LARGER label to prove weight, not tie-break, decides
    val got = wlpa(Seq((3L, 5L, 10L), (3L, 1L, 1L), (3L, 2L, 1L)), iters = 1)
    assert(got(3L) === 5L)
  }

  test("wlpa: equal weights degenerate to exactly the unweighted variant") {
    val rnd = new scala.util.Random(41)
    val raw = Seq.fill(300)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    for (it <- Seq(1, 2, 4)) {
      assert(wlpa(raw.map { case (a, b) => (a, b, 7L) }, it) === lpa(raw, it),
        s"iters=$it")
    }
  }

  test("wlpa: distributed equals the sequential twin; non-positive weights drop") {
    val rnd = new scala.util.Random(43)
    val edges = Seq.fill(300)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong,
      rnd.nextInt(10).toLong - 2)) // some <= 0
      .filter { case (a, b, _) => a != b }
    for (it <- Seq(1, 2, 4)) {
      assert(wlpa(edges, it) ===
        GraphMetrics.referenceLabelPropagationWeighted(edges, it), s"iters=$it")
    }
  }

  private def summary(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long, Long, Long) =
    GraphMetrics.graphSummary(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head

  test("summary: K4 — transitivity 1, assortativity degenerate (regular graph) -> 0") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    // nodes, edges, max_deg, wedges, triangles, cc_fp, assort_fp
    assert(summary(k4) === ((4L, 6L, 3L, 12L, 4L, 1000000L, 0L)))
  }

  test("summary: star graph is perfectly disassortative (r = -1), cc 0") {
    val star = (1L to 3L).map(l => (0L, l))
    assert(summary(star) === ((4L, 3L, 3L, 3L, 0L, 0L, -1000000L)))
  }

  test("summary: triangle plus pendant — hand-computed row") {
    val got = summary(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    // degs: 1->2, 2->2, 3->3, 4->1; wedges = 1+1+3+0 = 5; T = 1
    // cc = 3/5 -> 600000
    // pairs (j,k): (2,2)x2, (2,3)x2, (3,2)x2, (2,1)... enumerate via twin sums:
    // m=8, s_j = 2+2+2+3+3+2+3+1 ... trust the closed check below instead
    assert(got._1 === 4L && got._2 === 4L && got._3 === 3L)
    assert(got._4 === 5L && got._5 === 1L && got._6 === 600000L)
    // independent host-side Newman computation
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val deg = Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L)
    val sym = und ++ und.map(e => (e._2, e._1))
    val m = BigInt(sym.size)
    val sj = sym.map(e => BigInt(deg(e._1))).sum
    val sjk = sym.map(e => BigInt(deg(e._1)) * BigInt(deg(e._2))).sum
    val sjj = sym.map(e => BigInt(deg(e._1)) * BigInt(deg(e._1))).sum
    val num = sjk * m - sj * sj
    val den = sjj * m - sj * sj
    val want = ((num + den) * 1000000 / den - 1000000).toLong
    assert(got._7 === want)
  }

  test("lpa: iteration bounds fail loudly") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](GraphMetrics.labelPropagation(df, 0))
    intercept[IllegalArgumentException](GraphMetrics.labelPropagation(df, 17))
  }
}
