package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProduct

/** Property tests for the native DotProduct expression — the generated
  * codegen loop must agree with a straightforward Scala reference fold on
  * arbitrary inputs (values, lengths, NaN/Inf, empty). Generators are
  * driven with fixed seeds (no scalatest-scalacheck bridge in the offline
  * cache), so failures are reproducible. */
class DotProductPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val finiteF: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f, 0.0f, Float.MinPositiveValue, -1.5f)
  private val vec: Gen[Array[Float]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, finiteF)).map(_.toArray)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def ref(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("codegen path equals the reference fold on 200 generated array pairs") {
    val pairs = (0 until 200).map(i => sample(Gen.zip(vec, vec), i.toLong))
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
    val got = df.select(col("i"), DotProduct.dot(col("a"), col("b")).as("d"))
      .as[(Int, Double)].collect().toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val want = ref(a, b)
      assert(got(i) == want, s"seed=$i a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("special values flow through IEEE semantics (NaN, Inf)") {
    val df = Seq(
      (1, Array(Float.NaN, 1.0f), Array(1.0f, 1.0f)),
      (2, Array(Float.PositiveInfinity), Array(2.0f)),
      (3, Array(Float.PositiveInfinity), Array(0.0f))
    ).toDF("i", "a", "b")
    val got = df.select(col("i"), DotProduct.dot(col("a"), col("b")).as("d"))
      .as[(Int, Double)].collect().toMap
    assert(got(1).isNaN)
    assert(got(2).isPosInfinity)
    assert(got(3).isNaN) // Inf * 0 = NaN
  }
}
