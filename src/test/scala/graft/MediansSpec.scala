package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Medians

/** The spill-safe exact median ([[graft.engine.Medians.exactMedianByKey]])
  * must agree with Spark's buffered `median` aggregate everywhere the
  * buffered one is usable — same interpolating exact semantics, different
  * memory contract. */
class MediansSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("window-shape median == buffered median on the fixture (per key)") {
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val want = li.groupBy(col("l_returnflag"))
      .agg(median(col("l_extendedprice")).as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = Medians.exactMedianByKey(li, Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      // (a+b)/2 vs Spark's a+(b-a)*0.5 interpolation can differ in the last
      // ulp; the values here are parquet doubles, so a tiny relative band
      assert(math.abs(v - want(k)) <= math.abs(want(k)) * 1e-12 + 1e-12,
        s"key $k: window $v vs buffered ${want(k)}")
    }
  }

  test("odd and even group sizes, nulls excluded, interpolation exact") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", Some(2.0)),              // odd: 2.0
      ("b", Some(1.0)), ("b", Some(2.0)), ("b", Some(30.0)), ("b", Some(4.0)), // even: 3.0
      ("c", Some(5.0)), ("c", None)                                      // null dropped: 5.0
    ).toDF("k", "v")
    val got = Medians.exactMedianByKey(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 2.0, "b" -> 3.0, "c" -> 5.0))
  }

  test("selection shape == window shape == buffered median on the fixture") {
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val want = li.groupBy(col("l_returnflag"))
      .agg(median(col("l_extendedprice")).as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = Medians.exactMedianSelect(li, Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= math.abs(want(k)) * 1e-12 + 1e-12,
        s"key $k: selection $v vs buffered ${want(k)}")
    }
  }

  test("selection shape: duplicate spike, odd/even, null-only group excluded") {
    // a 10k-row spike of one value forces the all-equal-cell fast path;
    // the odd/even groups exercise both interpolation arms through the
    // iterative machinery; the null-only group must vanish (window parity)
    val spike = Seq.fill(10000)(("s", Some(7.5))) ++
      Seq(("s", Some(1.0)), ("s", Some(99.0))) ++                       // 10002 rows: median 7.5
      Seq(("o", Some(5.0)), ("o", Some(1.0)), ("o", Some(3.0))) ++      // odd: 3.0
      Seq(("e", Some(1.0)), ("e", Some(2.0)), ("e", Some(8.0)), ("e", Some(10.0))) ++ // even: 5.0
      Seq(("z", Option.empty[Double]))
    val df = spike.toDF("k", "v")
    val got = Medians.exactMedianSelect(df, Seq("k"), "v", collectLimit = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("s" -> 7.5, "o" -> 3.0, "e" -> 5.0))
  }

  test("selection quantiles == buffered percentile (quantile_cont rule)") {
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val ps = Seq(0.05, 0.5, 0.95)
    val want = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(ps.map(lit(_)): _*)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val got = Medians.exactQuantilesSelect(li, Seq("l_returnflag"),
        "l_extendedprice", ps)
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getDouble(1)).map(_.getDouble(2)).toSeq
      }
    assert(got.keySet === want.keySet)
    got.foreach { case (k, vs) =>
      vs.zip(want(k)).zip(ps).foreach { case ((v, w), p) =>
        assert(math.abs(v - w) <= math.abs(w) * 1e-12 + 1e-12,
          s"key $k p=$p: selection $v vs buffered $w")
      }
    }
  }

  test("global (ungrouped) selection quantiles — the F1 trim shape at scale") {
    val o = graft.engine.Tables.orders(spark, "/root/testdata/sf0.001")
    val want = o.agg(percentile(col("o_totalprice"),
        array(lit(0.05), lit(0.95))).as("b"))
      .head().getSeq[Double](0)
    val got = Medians.exactQuantilesSelect(o, Seq.empty, "o_totalprice",
        Seq(0.05, 0.95))
      .collect().sortBy(_.getDouble(0)).map(_.getDouble(1)).toSeq
    got.zip(want).foreach { case (v, w) =>
      assert(math.abs(v - w) <= math.abs(w) * 1e-12 + 1e-12, s"$v vs $w")
    }
  }

  test("selection contracts are LOUD: group-cardinality bound and NaN values") {
    // (1) more groups than maxGroups must trip the named contract BEFORE
    // any unbounded driver collect — a misuse with fact-keyed groups
    // previously OOM'd with a generic error (r11 VERDICT #5)
    val many = spark.range(0, 500)
      .selectExpr("id as k", "cast(id as double) as v")
    val eMany = intercept[IllegalArgumentException] {
      Medians.exactMedianSelect(many, Seq("k"), "v", maxGroups = 100)
    }
    assert(eMany.getMessage.contains("maxGroups"), eMany.getMessage)
    assert(eMany.getMessage.contains("exactMedianByKey"),
      "the contract must point at the many-groups escape hatch")
    // ...and exactly maxGroups groups still works
    val ok = Medians.exactMedianSelect(many.where(col("k") < 100),
      Seq("k"), "v", maxGroups = 100)
    assert(ok.count() === 100L)
    // (2) NaN values must trip the named contract, not corrupt ranks —
    // spark.range keeps the NaN out of a ConvertToLocalRelation constant
    // fold, and the quantiles path shares the same guard
    val withNaN = spark.range(0, 50)
      .selectExpr("'g' as k",
        "case when id = 17 then cast('NaN' as double) else cast(id as double) end as v")
    val eNaN = intercept[IllegalArgumentException] {
      Medians.exactQuantilesSelect(withNaN, Seq("k"), "v", Seq(0.5))
    }
    assert(eNaN.getMessage.contains("NaN-free"), eNaN.getMessage)
  }

  test("rank selection: per-group rank-k value == window cume_dist boundary; ties and singletons") {
    // ties straddle the boundary and one group is a singleton — the two
    // cases the threshold-only calibration twin must get right
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 7.0), ("a", 4L, 5.0),
      ("a", 5L, 9.0), ("b", 6L, 1.0), ("c", 7L, 2.0), ("c", 8L, 4.0))
      .toDF("k", "id", "v")
    val got = Medians.exactRankSelect(df, Seq("k"), "v", n => n / 2 + 1,
        out = "thr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // a: n=5, rank 3 of [5,5,5,7,9] = 5.0 (ties share the value);
    // b: the singleton survives at its own value; c: n=2 → rank 2
    assert(got === Set(("a", 5L, 5.0), ("b", 1L, 1.0), ("c", 2L, 4.0)))
    // value-rank selection == the (v, id)-ordered cume_dist(> 0.5) cut's
    // boundary, and n − ⌊n/2⌋ == the cut's kept-count — per group
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v"), col("id"))
    val win = df.withColumn("cal", cume_dist().over(w))
      .where(col("cal") > 0.5)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_kept"), min(col("v")).as("thr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.map { case (k, n, thr) => (k, n - n / 2, thr) } === win)
  }

  test("plan shape: Window rank selection, no buffered median aggregate") {
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plan = Medians.exactMedianByKey(li, Seq("l_returnflag"), "l_extendedprice")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("Window"), "median must go through WindowExec")
    assert(!plan.contains("median("),
      "the buffered median aggregate leaked into the spill-safe path")
    // both window specs (ordered row_number, frame-less count) must ride ONE
    // exchange on the group key — the operator's single-shuffle contract
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected the windows + final agg to reuse one " +
      s"key exchange, found $exchanges hash exchanges:\n$plan")
  }
}
