package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Guards

/** The exact-median group-size contract (VERDICT r8 §next 7): in-bound groups
  * compute the identical median; an out-of-bound group fails LOUDLY with the
  * named error, never silently. */
class GuardsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("boundedMedian equals plain median inside the bound") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 10.0), ("b", 4.0), ("b", 6.0))
      .toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(Guards.boundedMedian($"v").as("med"))
      .orderBy($"k").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 3.0), ("b", 5.0)))
  }

  test("a group past the bound raises the named error instead of degrading") {
    val df = Seq.tabulate(10)(i => ("big", i.toDouble)).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy($"k").agg(Guards.boundedMedian($"v", maxGroupRows = 5).as("med"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("exact median group exceeds 5 rows")),
      s"expected the named guard error, got: $e")
  }
}
