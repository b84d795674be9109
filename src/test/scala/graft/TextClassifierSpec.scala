package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{TextClassifier, TextOps}

class TextClassifierSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def bucket(w: String, buckets: Int): Int =
    (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(w).take(12), 16)
      % buckets).toInt

  test("training counts and a hand-computed score") {
    val pos = Seq((1L, "good good fine"), (2L, "good stuff")).toDF("doc_id", "text")
    val neg = Seq((10L, "bad junk"), (11L, "bad bad junk stuff")).toDF("doc_id", "text")
    val B = 64
    val m = TextClassifier.trainNaiveBayes(pos, neg, buckets = B)
    assert(m.posTokens === 5L && m.negTokens === 6L)
    assert(m.posDocs === 2L && m.negDocs === 2L)
    assert(m.pos(bucket("good", B)) === 3L)
    assert(m.neg(bucket("bad", B)) === 3L)
    assert(m.pos(bucket("bad", B)) === 0L)
    // score "good bad" by hand: prior ln(2/2)=0, plus each token's
    // ln((p+1)/(pt+B)) - ln((n+1)/(nt+B))
    def term(w: String) =
      math.log((m.pos(bucket(w, B)) + 1.0) / (m.posTokens + B)) -
        math.log((m.neg(bucket(w, B)) + 1.0) / (m.negTokens + B))
    val got = TextClassifier.nbScores(
        Seq((5L, "good bad")).toDF("doc_id", "text"), m)
      .select(col("n_tokens"), col("nb_logodds")).as[(Long, Double)].head()
    assert(got._1 === 2L)
    assert(math.abs(got._2 -
      BigDecimal(term("good") + term("bad"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("an empty doc scores exactly the class prior, zero tokens") {
    val pos = Seq((1L, "a a a")).toDF("doc_id", "text")
    val neg = Seq((2L, "b")).toDF("doc_id", "text")
    val m = TextClassifier.trainNaiveBayes(pos, neg, buckets = 32)
    val r = TextClassifier.nbScores(
        Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text"), m)
      .select(col("n_tokens"), col("q2_odds"), col("nb_logodds"))
      .as[(Long, Long, Double)].collect().toSet
    val prior = BigDecimal(math.log(1.0 / 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === Set((0L, 0L, prior)))
  }

  test("the model fits its seeds: positive slice outscores negative at sf0.001") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = TextClassifier.trainNaiveBayes(
      docs.where(col("source") === "src1"),
      docs.where(col("source") === "src2"))
    val scored = TextClassifier.nbScores(docs, m)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val avg = scored.groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.avg(col("nb_logodds")).as("a"))
      .as[(String, Double)].collect().toMap
    assert(avg("src1") > avg("src2"),
      s"positive seed must outscore negative: ${avg("src1")} vs ${avg("src2")}")
  }

  test("plan: scoring is join-free and shuffle-free; tokenizes once") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = TextClassifier.trainNaiveBayes(
      docs.where(col("source") === "src1"),
      docs.where(col("source") === "src2"))
    val plan = TextClassifier.nbScores(docs, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert("split\\(".r.findAllIn(plan).size <= 1,
      s"scoring must tokenize once:\n$plan")
  }
}
