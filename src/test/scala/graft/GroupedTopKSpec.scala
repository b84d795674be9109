package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupedTopK

/** The custom grouped-top-k operator must match the window row_number
  * composition exactly, plan as partial+final heap execs around ONE hash
  * exchange (no sort of the input), and survive skew/degenerate shapes. */
class GroupedTopKSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 10k rows, 100 keys, values shuffled deterministically; key 7 is hot.
  private lazy val data = spark.range(10000)
    .select((when(col("id") % 3 === 0, lit(7)).otherwise(col("id") % 100)).as("k"),
      ((col("id") * 2654435761L) % 99991L).as("v"),
      col("id").as("tiebreak"))

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("v").desc, col("tiebreak").asc)
    data.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  test("equals window row_number top-k on skewed data, k = 1, 3, 17") {
    Seq(1, 3, 17).foreach { k =>
      val got = GroupedTopK.topK(data, Seq("k"),
          Seq("v" -> true, "tiebreak" -> false), k)
        .as[(Long, Long, Long)].collect().toSet
      val want = windowTopK(k).as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"k=$k")
    }
  }

  test("groups smaller than k emit all their rows; empty input emits none") {
    val tiny = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val got = GroupedTopK.topK(tiny, Seq("k"), Seq("v" -> true), 5)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (1L, 20L), (2L, 5L)))
    assert(GroupedTopK.topK(tiny.where(col("v") > 100), Seq("k"),
      Seq("v" -> true), 5).count() === 0)
  }

  test("ascending order and multi-column keys work") {
    val df = Seq((1L, "a", 3.0), (1L, "a", 1.0), (1L, "a", 2.0), (1L, "b", 9.0))
      .toDF("k1", "k2", "v")
    val got = GroupedTopK.topK(df, Seq("k1", "k2"), Seq("v" -> false), 2)
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "a", 1.0), (1L, "a", 2.0), (1L, "b", 9.0)))
  }

  test("plan: partial + final heap execs, one exchange between, no sort/window") {
    val plan = GroupedTopK.topK(data, Seq("k"), Seq("v" -> true), 3)
      .queryExecution.executedPlan.toString
    // nodeName drops the Exec suffix: one partial (", true") + one final
    assert("GroupedTopK \\[".r.findAllIn(plan).size === 2, plan)
    assert(plan.contains(", 3, true") && plan.contains(", 3, false"), plan)
    assert(plan.contains("Exchange hashpartitioning(k#"), plan)
    assert(!plan.contains("Window"), s"must not fall back to a window:\n$plan")
    assert(!plan.contains("Sort "), s"must never sort the input:\n$plan")
  }
}
