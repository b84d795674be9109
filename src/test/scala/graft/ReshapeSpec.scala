package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Reshape

/** The conditional-aggregation pivot lowering must be RESULT-identical to
  * Spark's native pivot (whose two-exchange plan is why it isn't used —
  * see Reshape's scaladoc) and melt must be its exact inverse. */
class ReshapeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val sales = Seq(
    ("east", "A", 10.0), ("east", "A", 5.0), ("east", "B", 2.0),
    ("west", "B", 7.0), ("west", "C", 1.0), ("north", "A", 4.0)
  ).toDF("region", "product", "amount")

  test("pivot matches Spark's native pivot cell-for-cell, including empty cells") {
    val ours = Reshape.pivot(sales, "region", "product",
        domain = Seq("A", "B", "C"),
        aggs = Seq("sum" -> (c => sum(c))), valueCol = "amount")
      .orderBy("region")
      .as[(String, Option[Double], Option[Double], Option[Double])].collect()
    val native = sales.groupBy("region").pivot("product", Seq("A", "B", "C"))
      .agg(sum(col("amount"))).orderBy("region")
      .as[(String, Option[Double], Option[Double], Option[Double])].collect()
    assert(ours.toSeq === native.toSeq)
    // a (region, product) pair with no rows must be NULL, not 0
    assert(ours.find(_._1 == "north").get._3 === None)
  }

  test("pivot supports multiple aggregates per domain value") {
    val row = Reshape.pivot(sales, "region", "product", Seq("A"),
        aggs = Seq("sum" -> (c => sum(c)), "n" -> (c => count(c))),
        valueCol = "amount")
      .where(col("region") === "east")
      .select("a_sum", "a_n").as[(Double, Long)].head()
    assert(row === ((15.0, 2L)))
  }

  test("melt inverts pivot: wide charge columns become typed long rows") {
    val wide = Seq((1L, 10.0, 0.1), (2L, 20.0, 0.2)).toDF("k", "price", "disc")
    val long = Reshape.melt(wide, ids = Seq("k"), values = Seq("price", "disc"))
    assert(long.columns.toSeq === Seq("k", "variable", "value"))
    assert(long.count() === 4)
    assert(long.where(col("variable") === "price")
      .agg(sum("value")).as[Double].head() === 30.0)
  }

  test("melt drops NULL cells (SQL UNPIVOT semantics)") {
    val wide = Seq((1L, Some(10.0), None: Option[Double])).toDF("k", "a", "b")
    assert(Reshape.melt(wide, Seq("k"), Seq("a", "b")).count() === 1)
  }
}
