package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSim, DotProduct}
import graft.ops.Similarity

/** The fused cosine must be BIT-identical to the decomposed
  * `dot/(sqrt(dot)·sqrt(dot))` it replaced in every ANN re-rank — on
  * arbitrary values, mismatched lengths, zero vectors (NaN via IEEE
  * 0/0), and empties. Exact `==` on doubles, not a tolerance: the swap's
  * whole safety argument is same-fold-order equality, so any ulp drift
  * is a real defect. Fixed seeds (no scalatest-scalacheck bridge in the
  * offline cache). */
class CosineSimPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val finiteF: Gen[Float] =
    Gen.chooseNum(-1e3f, 1e3f, 0.0f, Float.MinPositiveValue, -1.5f)
  private val vec: Gen[Array[Float]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, finiteF)).map(_.toArray)
  // ANSI Spark ERRORS on /0, so the decomposed reference can't even run on
  // a zero/empty vector — keep the exact-equality corpus non-degenerate and
  // assert the fused expression's IEEE NaN behavior separately below.
  private val vecNZ: Gen[Array[Float]] =
    vec.map(v => if (v.exists(_ != 0.0f)) v else v :+ 1.5f)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("fused == decomposed, exactly, on 200 generated pairs") {
    val gen = Gen.zip(vecNZ, vecNZ)
    val pairs = (0 until 200).map(i => sample(gen, i.toLong)) :+
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f))          // length mismatch
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
    val both = df.select(col("i"),
        CosineSim.cos(col("a"), col("b")).as("fused"),
        (DotProduct.dot(col("a"), col("b")) /
          (sqrt(DotProduct.dot(col("a"), col("a"))) *
            sqrt(DotProduct.dot(col("b"), col("b"))))).as("decomposed"))
      .as[(Int, Double, Double)].collect()
    both.foreach { case (i, f, d) =>
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(d),
        s"pair $i: fused=$f decomposed=$d")
    }
  }

  test("interpreted eval equals codegen (filter on the expression forces both)") {
    val df = (0 until 50).map(i => (i, sample(vec, 1000L + i), sample(vec, 2000L + i)))
      .toDF("i", "a", "b")
    val viaCol = df.select(col("i"), Similarity.cosine(col("a"), col("b")).as("c"))
      .as[(Int, Double)].collect().toMap
    // same expression through the SQL registry (graft_cos)
    df.createOrReplaceTempView("cos_prop_v")
    val viaSql = spark.sql("SELECT i, graft_cos(a, b) AS c FROM cos_prop_v")
      .as[(Int, Double)].collect().toMap
    viaCol.foreach { case (i, c) =>
      assert(java.lang.Double.doubleToRawLongBits(c) ==
        java.lang.Double.doubleToRawLongBits(viaSql(i)), s"row $i")
    }
  }

  test("zero/empty vectors: fused yields IEEE NaN where decomposed ANSI-errors") {
    // the decomposed dot/(norm·norm) THROWS DIVIDE_BY_ZERO under ANSI — the
    // fused expression is strictly more robust on the degenerate inputs the
    // re-rank can meet (an all-zero embedding row)
    val df = Seq(
      (1, Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (2, Array.empty[Float], Array(1.0f))
    ).toDF("i", "a", "b")
    val got = df.select(col("i"), CosineSim.cos(col("a"), col("b")).as("c"))
      .as[(Int, Double)].collect().toMap
    assert(got(1).isNaN && got(2).isNaN)
  }

  test("null array is null; null elements skipped per accumulator") {
    val df = Seq(
      (1, Array(1.0f, 2.0f), null.asInstanceOf[Array[Float]]),
      (2, Array(1.0f, 2.0f), Array(3.0f, 4.0f))
    ).toDF("i", "a", "b")
    val got = df.select(col("i"), CosineSim.cos(col("a"), col("b")).as("c"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1).isEmpty)
    val want = (1.0 * 3 + 2.0 * 4) / (math.sqrt(5.0) * math.sqrt(25.0))
    assert(got(2).contains(want))
  }

  test("interior null elements: fused == decomposed raw-bits, interpreted and codegen") {
    // ADVICE r11: the skip-per-accumulator claim was untested on interior
    // nulls. a = [1, null, 2] vs b = [3, 4, 5]: saa skips slot 1 (=5),
    // sbb sees all of b (=50), sab pairs surviving slots only (=13) — and
    // the decomposed dot/(√·√) makes the identical skips, so the equality
    // must hold to the last bit in BOTH evaluation modes.
    val df = Seq(
      (1, Seq[java.lang.Float](1.0f, null, 2.0f), Seq[java.lang.Float](3.0f, 4.0f, 5.0f)),
      (2, Seq[java.lang.Float](null, 7.5f), Seq[java.lang.Float](2.0f, null))
    ).toDF("i", "a", "b")
    val both = df.select(col("i"),
        CosineSim.cos(col("a"), col("b")).as("fused"),
        (DotProduct.dot(col("a"), col("b")) /
          (sqrt(DotProduct.dot(col("a"), col("a"))) *
            sqrt(DotProduct.dot(col("b"), col("b"))))).as("decomposed"))
      .as[(Int, Double, Double)].collect()
    assert(both.length == 2)
    both.foreach { case (i, f, d) =>
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(d), s"row $i: fused=$f decomposed=$d")
    }
    // row 1 by hand: 13 / (√5 · √50)
    val want = 13.0 / (math.sqrt(5.0) * math.sqrt(50.0))
    assert(both.find(_._1 == 1).get._2 == want)
    // codegen form through the SQL registry must match the interpreted bits
    df.createOrReplaceTempView("cos_null_elem_v")
    val viaSql = spark.sql("SELECT i, graft_cos(a, b) AS c FROM cos_null_elem_v")
      .as[(Int, Double)].collect().toMap
    both.foreach { case (i, f, _) =>
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(viaSql(i)), s"codegen row $i")
    }
  }
}
