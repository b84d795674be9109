package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProduct

/** Native DotProduct expression: value parity with a reference fold, both
  * interpreted-eval and whole-stage-codegen paths, SQL-registry exposure via
  * GraftExtensions, and the documented edge semantics. */
class DotProductSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val f = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -1.5f), Array(2.0f, 2.0f))
  ).toDF("id", "a", "b")

  test("float×float dot: exact left-to-right widen-then-multiply") {
    val got = f.select(col("id"), DotProduct.dot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == (4.0 + 10.0 + 18.0))
    assert(got(2L) == (1.0 - 3.0))
  }

  test("float×double-literal dot equals the old zip_with+aggregate chain") {
    val plane = Seq(0.25, -0.75, 1.5)
    // Equal-length row only: zip_with null-pads a shorter array, which was
    // exactly why the HOF chain needed the dims to match and DotProduct
    // truncates instead.
    val eq = f.where(col("id") === 1L)
    val native = eq.select(DotProduct.dot(col("a"), typedlit(plane)).as("d"))
      .as[Double].collect().toSeq
    val hof = eq.select(
      aggregate(zip_with(col("a").cast("array<double>"), typedlit(plane),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("d"))
      .as[Double].collect().toSeq
    assert(native == hof)
  }

  test("length mismatch truncates; null array yields null; empty yields 0.0") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(10.0f))),
      (2L, None, Some(Array(1.0f))),
      (3L, Some(Array.empty[Float]), Some(Array(1.0f)))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), DotProduct.dot(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(10.0))
    assert(got(2L).isEmpty)
    assert(got(3L).contains(0.0))
  }

  test("registered in SQL as graft_dot via GraftExtensions") {
    f.createOrReplaceTempView("dot_in")
    val got = spark.sql(
      "SELECT id, graft_dot(a, b) AS d FROM dot_in ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 32.0), (2L, -2.0)))
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // A parquet scan (not a constant-folded local relation) so the plan has
    // a real codegen stage to fuse into.
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = emb.select(DotProduct.dot(col("embedding"), col("embedding")).as("d"))
    // `*(n)` marks a WholeStageCodegen stage in the string form.
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [graft_dot"))
    assert(df.agg(min(col("d"))).as[Double].head() >= 0.0) // executes the codegen path
    // And the eval path agrees with codegen: force interpreted projection.
    val expr = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(expr.eval(null) == 11.0)
  }
}
