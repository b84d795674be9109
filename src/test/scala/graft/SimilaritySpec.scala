package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("cosine: known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), "same"),
                 (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), "orth"),
                 (Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f), "anti"))
      .toDF("a", "b", "name")
    val got = df.select(col("name"), Similarity.cosine(col("a"), col("b")).as("c"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("same") - 1.0) < 1e-12)
    assert(math.abs(got("orth")) < 1e-12)
    assert(math.abs(got("anti") + 1.0) < 1e-12)
  }

  test("brute-force top-k: k rows, descending, self excluded") {
    val top = Similarity.bruteForceTopK(
      graft.engine.Tables.embeddings(spark, sf), 0L, 10).collect()
    assert(top.length === 10)
    assert(!top.exists(_.getAs[Long]("vec_id") == 0L))
    val cs = top.map(_.getAs[Double]("cos"))
    assert(cs.sameElements(cs.sortBy(-_)))
  }

  test("banded LSH top-k: high recall vs brute force (seed-deterministic)") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.size === 10)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall") // measured 0.9 at sf0.001/sf0.01
  }

  test("IVF top-k: probed-cell candidates, sane recall vs brute force") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.ivfTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.size === 10)
    assert(!approx.contains(0L))
    // nProbe/nCells = 1/4 of the corpus scanned; on a near-uniform corpus
    // expected recall ≈ coverage, so demand clearly-above-chance.
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("banded near-dups: non-empty strict subset machinery of all-pairs") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val all = Similarity.embeddingNearDupPairs(emb, 0.4, Long.MaxValue)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos")).toMap
    val banded = Similarity.bandedNearDupPairs(emb, 0.4).collect()
    assert(banded.nonEmpty)
    banded.foreach { r =>
      val k = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(k._1 < k._2)
      // every banded pair is a true pair with the identical exact cosine
      assert(all.get(k).contains(r.getAs[Double]("cos")), s"pair=$k")
    }
  }
}
