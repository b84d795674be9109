package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must fire on exactly the airtight shape — and only
  * there — and the rewritten plan must return byte-identical rows. */
class RankLimitRewriteSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // non-trivial corpus with a total order: (k, v, id) with ties on v
  // broken by id — spark.range keeps a Filter from constant-folding
  private def base = spark.range(0, 400)
    .select((col("id") % 7).as("k"), (col("id") % 13).as("v"), col("id"))

  private val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("row_number <= k with the rank dropped rewrites to GroupedTopK") {
    val q = base.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    val plan = planOf(q)
    assert(plan.contains("GroupedTopK"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    // byte-identical to the unrewritten form (keeping rn blocks the rule)
    val want = base.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size === 7 * 3)
  }

  test("extra filter conjuncts survive, applied above the cut") {
    val q = base.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3 && col("v") % 2 === 0).drop("rn")
    val plan = planOf(q)
    assert(plan.contains("GroupedTopK"), s"conjunct form did not rewrite:\n$plan")
    val want = base.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).where(col("v") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === want)
  }

  test("rn = 1 (argmax-per-group idiom) rewrites with k = 1") {
    val q = base.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    assert(planOf(q).contains("GroupedTopK"))
    assert(q.count() === 7L)
  }

  test("1 = rn (reversed-equality argmax spelling) also rewrites (ADVICE r11)") {
    // every inequality already matched its literal-on-the-left mirror; the
    // equality arm was the one asymmetric case, silently keeping the full
    // window sort for this spelling
    val q = base.withColumn("rn", row_number().over(w))
      .where(lit(1) === col("rn")).drop("rn")
    val plan = planOf(q)
    assert(plan.contains("GroupedTopK"), s"reversed equality did not fire:\n$plan")
    val want = base.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === want)
    assert(q.count() === 7L)
  }

  test("does NOT fire: rank(), rn kept in output, global window") {
    val ranked = base.withColumn("rn", rank().over(w))
      .where(col("rn") <= 3).drop("rn")
    assert(!planOf(ranked).contains("GroupedTopK"),
      "rank() can emit more than k rows per group — must not rewrite")
    val kept = base.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
    assert(!planOf(kept).contains("GroupedTopK"),
      "rn is in the output — GroupedTopK cannot produce it")
    val global = base
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v").desc, col("id").asc)))
      .where(col("rn") <= 3).drop("rn")
    assert(!planOf(global).contains("GroupedTopK"),
      "empty partition spec is TakeOrdered territory")
  }
}
