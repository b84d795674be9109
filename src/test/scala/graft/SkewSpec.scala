package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salting must change the SHUFFLE SHAPE, never the RESULT. */
class SkewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 10k rows, 90% on one hot key — the straggler shape.
  private lazy val skewed = spark.range(10000)
    .select(when(col("id") % 10 < 9, lit("hot")).otherwise(concat(lit("k"), col("id") % 7))
      .as("k"), col("id").as("v"))

  test("salted counts equal plain counts on a skewed key distribution") {
    val plain = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCounts(skewed, "k", salt = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == 9000L)
  }

  test("phase-1 exchange hashes on (key, salt), splitting the hot key") {
    val plan = Skew.saltedCounts(skewed, "k", salt = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k"))
    assert(plan.contains("__graft_salt"))
  }

  test("retry-safe data-column salt: identical results, spreads the hot key") {
    val src = Some(Skew.saltFromCols(8, col("v")))
    val plain = skewed.groupBy("k").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedCounts(skewed, "k", salt = 8, saltSource = src)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    // the hot key's rows really land in >1 salt bucket
    val buckets = skewed.where(col("k") === "hot")
      .select(Skew.saltFromCols(8, col("v"))).distinct().count()
    assert(buckets > 1)
  }

  test("salted join equals plain join, salt column dropped") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "label")
    val plain = skewed.join(dim, "k").groupBy("k", "label").count()
      .as[(String, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 8)
      .groupBy("k", "label").count()
      .as[(String, String, Long)].collect().toSet
    assert(salted == plain)
    assert(!Skew.saltedJoin(skewed, dim, "k").columns.contains("__graft_salt"))
  }

  test("divergent saltSource modulus is re-modded — no silent row drops") {
    // saltFromCols(32, ...) alongside salt = 16: without the internal
    // pmod, probe salts ≥ 16 would match no build replica and those rows
    // would vanish from the join.
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "label")
    val src = Some(Skew.saltFromCols(32, col("v")))
    val plain = skewed.join(dim, "k").groupBy("k", "label").count()
      .as[(String, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 16, saltSource = src)
      .groupBy("k", "label").count()
      .as[(String, String, Long)].collect().toSet
    assert(salted == plain)
    val counts = Skew.saltedCounts(skewed, "k", salt = 16, saltSource = src)
      .as[(String, Long)].collect().toMap
    assert(counts == skewed.groupBy("k").count().as[(String, Long)].collect().toMap)
  }
}
