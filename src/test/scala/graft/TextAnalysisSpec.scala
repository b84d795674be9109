package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("langId: stopword votes with deterministic ties") {
    val got = Seq(
      "the cat and the dog of the house",
      "der hund und die katze und der vogel",
      "le chat et la maison et le chien",
      "el gato y los perros y el sol",
      "zzz qqq xxx").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("l")).as[String].collect()
    assert(got === Array("en", "de", "fr", "es", "other"))
  }

  test("token counting: whitespace and BPE-ish") {
    val row = Seq("Hello, world! x2").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("t"),
        TextAnalysis.bpeTokenCount(col("text")).as("b"))
      .as[(Int, Int)].collect().head
    assert(row._1 === 3)          // [hello,] [world!] [x2]
    assert(row._2 === 6)          // [hello][,][world][!][x][2]
  }

  test("quality score: in [0,1], longer clean text scores higher") {
    val q = Seq(
      ("good", "the cat and the dog of a house is in the garden " * 10),
      ("junk", "@@@ ### !!! %%% ^^^")).toDF("name", "text")
      .select(col("name"), TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q("good") > q("junk"))
  }

  test("tfidf top terms: rare terms outrank common ones, ties break on term") {
    // 4 docs; "the" appears in all (df=4), each doc has one unique term
    // (df=1). score = tf·N/df: doc 0's "alpha" scores 1·4/1 = 4, its
    // "the" (tf=2) scores 2·4/4 = 2 — the rare term must win rank 1.
    val docs = Seq(
      (0L, "the alpha the"),
      (1L, "the beta"),
      (2L, "the gamma"),
      (3L, "the delta")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .as[(Long, String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(r => (-r._5, r._2)).map(r => (r._2, r._5)).toSeq
      }
    assert(top(0L) === Seq(("alpha", 4.0), ("the", 2.0)))
    assert(top(1L) === Seq(("beta", 4.0), ("the", 1.0)))
    assert(top.keySet === Set(0L, 1L, 2L, 3L))
  }

  test("fingerprint: whitespace-insensitive, case-insensitive") {
    val fps = Seq("The  quick\tfox", "the quick fox", "the quick cat")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("f"))
      .as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }
}
