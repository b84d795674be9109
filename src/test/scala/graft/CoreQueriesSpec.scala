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

  test("funnel: matches a host-side sequential replay of the 3-step semantics") {
    val got = CoreQueries.funnel(spark, sf).collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("users")).toMap
    // independent formulation: per-user time-sorted fold over collected
    // events (sf0.001 is 1k rows)
    val ev = graft.engine.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val W = 86400000000L
    var (n1, n2, n3) = (0L, 0L, 0L)
    ev.groupBy(_._1).foreach { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        n1 += 1
        val t1 = views.min
        val clicks = es.filter(e => e._2 == "click" && e._3 > t1 &&
          e._3 - t1 <= W).map(_._3)
        if (clicks.nonEmpty) {
          n2 += 1
          val t2 = clicks.min
          if (es.exists(e => e._2 == "purchase" && e._3 > t2 &&
            e._3 - t1 <= W)) n3 += 1
        }
      }
    }
    assert(got === Map("view" -> n1, "view>click" -> n2,
      "view>click>purchase" -> n3))
    assert(n1 >= n2 && n2 >= n3, "funnel must be monotone")
  }

  test("event transitions: matches a host-side replay; rows sum to their totals") {
    val got = CoreQueries.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("p_fp"))).toMap
    val ev = graft.engine.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val wantCnt = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(e => (e._3, e._2)).map(_._4).toSeq
      seq.zip(seq.drop(1))
    }.groupBy(x => x).map { case (k, xs) => k -> xs.size.toLong }
    assert(got.view.mapValues(_._1).toMap === wantCnt)
    val totals = wantCnt.groupBy(_._1._1).map { case (f, xs) => f -> xs.values.sum }
    got.foreach { case ((f, t), (cnt, pfp)) =>
      assert(pfp === cnt * 1000000L / totals(f), s"$f->$t")
    }
  }

  test("journey signatures: matches a host-side replay of the ordered prefixes") {
    val got = CoreQueries.journeySignatures(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("users")).toSeq
    val ev = graft.engine.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).values.map { es =>
      es.sortBy(e => (e._3, e._2)).take(8).map(_._4.substring(0, 1)).mkString
    }.groupBy(x => x).map { case (sig, xs) => sig -> xs.size.toLong }
      .toSeq.sortBy { case (sig, n) => (-n, sig) }.take(20)
    assert(got === want)
  }

  test("hourly anomalies: matches a host-side integer replay of the z^2 test") {
    val got = CoreQueries.hourlyAnomalies(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("z2_fp")))
    val hours = graft.engine.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.date_trunc("hour",
          org.apache.spark.sql.functions.col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("h"))
      .groupBy("h").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = hours.length.toLong
    val s1 = hours.map(_._2).sum
    val s2 = hours.map(h => h._2 * h._2).sum
    val den = n * s2 - s1 * s1
    val want = hours.flatMap { case (h, cnt) =>
      val d = cnt * n - s1
      if (den > 0 && d * d > 9 * den) Some((h, cnt, d * d * 1000000L / den))
      else None
    }.sortBy(r => (-r._3, r._1))
    assert(got.toSeq === want.toSeq)
  }

  test("retention cohorts: matches a host-side replay; day-0 row per cohort") {
    val got = CoreQueries.retentionCohorts(spark, sf).collect()
      .map(r => (r.getAs[String]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("users")).toMap
    val pairs = graft.engine.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).cast("string").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val cohort = pairs.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val want = pairs.groupBy { case (u, day) =>
      val cd = cohort(u)
      (cd, java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(cd, fmt), java.time.LocalDate.parse(day, fmt)))
    }.map { case (k, xs) => k -> xs.size.toLong }
    assert(got === want)
    // every cohort has its day-0 row and it is the cohort's max
    val byCohort = got.groupBy(_._1._1)
    byCohort.foreach { case (cd, rows) =>
      val d0 = rows.getOrElse((cd, 0L), 0L)
      assert(d0 > 0L, s"cohort $cd missing day-0")
      assert(rows.values.forall(_ <= d0), s"cohort $cd day-0 not maximal")
    }
  }
}
