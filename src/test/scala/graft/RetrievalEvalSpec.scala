package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{RetrievalEval, Similarity}

class RetrievalEvalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def rk(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rank")

  private def row(df: org.apache.spark.sql.DataFrame, q: Long) =
    df.collect().find(_.getAs[Long]("query_id") == q).get

  test("discount table: disc(1) is exactly 1e9, strictly decreasing; idcg prefixes sum") {
    val d = RetrievalEval.discountsFp(10)
    assert(d.head === (1, 1000000000L))
    assert(d.map(_._2).sliding(2).forall { case Seq(a, b) => a > b })
    val i = RetrievalEval.idcgPrefixFp(10)
    assert(i.head._2 === 1000000000L)
    assert(i(4)._2 === d.take(5).map(_._2).sum)
  }

  test("perfect ranking scores 1/1/1") {
    val t = rk((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
    val m = row(RetrievalEval.metrics(t, t, k = 10), 0L)
    assert(m.getAs[Long]("n_truth") === 3L)
    assert(m.getAs[Long]("n_hit") === 3L)
    assert(m.getAs[Double]("recall") === 1.0)
    assert(m.getAs[Double]("mrr") === 1.0)
    assert(m.getAs[Double]("ndcg") === 1.0)
  }

  test("system with zero hits still yields a row of zeros") {
    val t = rk((0L, 10L, 1), (0L, 11L, 2))
    val s = rk((0L, 98L, 1), (0L, 99L, 2))
    val m = row(RetrievalEval.metrics(s, t, k = 10), 0L)
    assert(m.getAs[Long]("n_hit") === 0L)
    assert(m.getAs[Double]("recall") === 0.0)
    assert(m.getAs[Double]("mrr") === 0.0)
    assert(m.getAs[Double]("ndcg") === 0.0)
  }

  test("query entirely missing from system scores zeros; others unaffected") {
    val t = rk((0L, 10L, 1), (1L, 20L, 1))
    val s = rk((0L, 10L, 1)) // no rows at all for query 1
    val out = RetrievalEval.metrics(s, t, k = 10)
    assert(out.count() === 2)
    assert(row(out, 1L).getAs[Double]("recall") === 0.0)
    assert(row(out, 0L).getAs[Double]("recall") === 1.0)
  }

  test("hand-computed partial overlap: hits at system ranks 2 and 3 of truth size 3") {
    // truth = {10,11,12}; system top-3 = (99, 10, 11) -> hits at ranks 2,3
    val t = rk((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
    val s = rk((0L, 99L, 1), (0L, 10L, 2), (0L, 11L, 3))
    val m = row(RetrievalEval.metrics(s, t, k = 10), 0L)
    assert(m.getAs[Long]("n_hit") === 2L)
    assert(m.getAs[Double]("recall") === math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(m.getAs[Double]("mrr") === 0.5)
    val d = RetrievalEval.discountsFp(10).toMap
    val idcg = RetrievalEval.idcgPrefixFp(10).toMap
    val want = BigDecimal((d(2) + d(3)).toDouble / idcg(3).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getAs[Double]("ndcg") === want)
  }

  test("rank > k rows are ignored on both sides (metrics are @k prefixes)") {
    val t = rk((0L, 10L, 1), (0L, 11L, 12)) // second truth row beyond k=10
    val s = rk((0L, 10L, 11), (0L, 11L, 1)) // system hit beyond k; miss inside
    val m = row(RetrievalEval.metrics(s, t, k = 10), 0L)
    assert(m.getAs[Long]("n_truth") === 1L) // only rank-1 truth row counts
    assert(m.getAs[Long]("n_hit") === 0L)   // system's doc 10 sits at rank 11
  }

  test("eval of the LSH batch vs brute-force truth on the fixture: sane ranges, self-eval is perfect") {
    val d = sf
    val out = graft.queries.PipelineQueries.retrievalEval(spark, d).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val (rec, mrr, ndcg) = (r.getAs[Double]("recall"),
        r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))
      assert(rec >= 0.0 && rec <= 1.0)
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert(ndcg >= rec * 0.0) // vacuous floor; real floor asserted below
    }
    // the fixture's LSH config has measured recall well above chance
    val meanRecall = out.map(_.getAs[Double]("recall")).sum / out.length
    assert(meanRecall >= 0.5, s"mean LSH recall@10 $meanRecall below 0.5")
    // truth evaluated against itself is exactly perfect for every query
    val emb = graft.engine.Tables.embeddings(spark, d)
    val queries = emb.where(org.apache.spark.sql.functions.col("vec_id") < 5)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(org.apache.spark.sql.functions.col("cos").desc,
        org.apache.spark.sql.functions.col("vec_id").asc)
    val tru = Similarity.bruteForceTopKBatch(emb, queries, 10)
      .select(org.apache.spark.sql.functions.col("query_id"),
        org.apache.spark.sql.functions.col("vec_id").as("doc_id"),
        org.apache.spark.sql.functions.row_number().over(w).as("rank"))
    val self = RetrievalEval.metrics(tru, tru, k = 10).collect()
    assert(self.forall(r => r.getAs[Double]("ndcg") === 1.0 &&
      r.getAs[Double]("recall") === 1.0 && r.getAs[Double]("mrr") === 1.0))
  }
}
