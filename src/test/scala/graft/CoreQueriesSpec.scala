package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.CoreQueries

/** Structural invariants of the core queries at sf0.001 (value-level
  * correctness is covered by the DuckDB oracle at sf0.01 — SURVEY.md §5). */
class CoreQueriesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("flagship: 20 groups, presented in descending median order") {
    val rows = CoreQueries.flagshipTopGroupsMedian(spark, sf).collect()
    val nGroups = graft.engine.Tables.lineitem(spark, sf)
      .select("l_suppkey").distinct().count()
    assert(rows.length === math.min(20L, nGroups))
    val meds = rows.map(_.getAs[Double]("med"))
    assert(meds.sameElements(meds.sortBy(-_)))
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }

  test("quantile trim keeps ~90% of rows within bounds") {
    val row = CoreQueries.quantileTrim(spark, sf).collect().head
    val total = graft.engine.Tables.orders(spark, sf).count()
    val kept = row.getAs[Long]("n")
    assert(kept.toDouble / total > 0.85 && kept < total)
    assert(row.getAs[Double]("min_price") <= row.getAs[Double]("avg_price"))
    assert(row.getAs[Double]("avg_price") <= row.getAs[Double]("max_price"))
  }

  test("histogram: bins within [0,39], counts sum to table size") {
    val rows = CoreQueries.histogram(spark, sf).collect()
    assert(rows.forall { r => val b = r.getAs[Long]("bin"); b >= 0 && b <= 39 })
    assert(rows.map(_.getAs[Long]("cnt")).sum ===
      graft.engine.Tables.orders(spark, sf).count())
  }

  test("window rank: at most 3 nations per region, ranks start at 1") {
    val rows = CoreQueries.windowRank(spark, sf).collect()
    val perRegion = rows.groupBy(_.getAs[Int]("n_regionkey"))
    assert(perRegion.values.forall(_.length <= 3))
    assert(perRegion.values.forall(_.map(_.getAs[Int]("rnk")).min === 1))
  }

  test("pie proportions sum to ~1") {
    val pct = CoreQueries.pieProportions(spark, sf).collect()
      .map(_.getAs[Double]("pct")).sum
    assert(math.abs(pct - 1.0) < 1e-4)
  }

  test("boxplot stats: q1 <= med <= q3") {
    val rows = CoreQueries.boxplotStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("q1") <= r.getAs[Double]("med"))
      assert(r.getAs[Double]("med") <= r.getAs[Double]("q3"))
    }
  }

  test("entry smoke: flagship at sf0.001 returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
