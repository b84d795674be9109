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

  test("cosRound: zero-norm rows rank LAST (null), not first (ADVICE r11)") {
    // a corrupt all-zero embedding yields IEEE NaN from the raw fused
    // cosine, and Spark sorts NaN above every double — the cosRound guard
    // maps it to null so the degenerate row falls BEHIND every real score
    // in both descending-sort idioms the re-ranks use
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.5f, 0.5f)),
                 (3L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Seq(1.0f, 1.0f))).toDF("qv")
    val scored = df.crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosRound(col("embedding"), col("qv"), 4).as("cos"))
    val ordered = scored.orderBy(col("cos").desc, col("vec_id").asc)
      .select("vec_id").as[Long].collect()
    assert(ordered.last == 3L, s"orderBy ranked ${ordered.toSeq}")
    assert(scored.where(col("vec_id") === 3L).collect().head.isNullAt(1))
    val viaHeap = graft.plans.GroupedTopK.topK(
        scored.withColumn("g", lit(1)), Seq("g"),
        Seq("cos" -> true, "vec_id" -> false), 3)
      .select("vec_id").as[Long].collect()
    assert(viaHeap.toSet == Set(1L, 2L, 3L) &&
      graft.plans.GroupedTopK.topK(scored.withColumn("g", lit(1)), Seq("g"),
        Seq("cos" -> true, "vec_id" -> false), 2)
        .select("vec_id").as[Long].collect().toSet == Set(1L, 2L),
      "bounded-heap cut must also leave the null-scored row behind")
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

  test("IVF top-k with TRAINED centroids: high recall vs brute force") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val cent = Similarity.kMeansCentroids(emb, k = 16, iters = 10, seed = 42L)
    val approx = Similarity.ivfTopK(emb, cent, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.size === 10)
    assert(!approx.contains(0L))
    // k-means cells follow the corpus's label clusters, so the query's true
    // neighbours concentrate in its probed cells — well above the ~nProbe/k
    // coverage an untrained quantizer gets on this corpus.
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("PQ ADC top-k with committed codebooks: recall vs brute force") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val cb = spark.read.parquet(graft.queries.PipelineQueries.pqCodebooksPath)
    assert(cb.count() === 128, "8 subspaces x 16 codes")
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.pqTopK(emb, cb, 0L, 10, rerank = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(approx.size === 10 && !approx.contains(0L))
    assert(approx.toSet.size === 10, "no duplicate candidates")
    val recall = (exact & approx.toSet).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    // deterministic: the ADC estimate chain + tiebreaks admit exactly one answer
    val again = Similarity.pqTopK(emb, cb, 0L, 10, rerank = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(again === approx)
    // the indexed path (stored codes + driver-computed dot table) must be
    // output-identical to the inline expression form
    val idx = graft.ops.Indexes.ensurePqIndex(spark, emb, cb, sf)
    val indexed = graft.ops.Indexes.pqTopKIndexed(emb, cb, idx, 0L, 10, rerank = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(indexed === approx)
  }

  test("k-means: recovers planted clusters; empty-cell and determinism") {
    // 4 well-separated direction clusters in 8-d, 40 vectors each.
    val rnd = new scala.util.Random(7)
    val axes = Seq(0, 2, 4, 6)
    val rows = for (c <- 0 until 4; i <- 0 until 40) yield {
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.05f)
      v(axes(c)) = 1.0f + rnd.nextGaussian().toFloat * 0.05f
      ((c * 40 + i).toLong, v.toSeq, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "truth")
    val cent = Similarity.kMeansCentroids(emb, k = 4, iters = 8, seed = 42L)
    assert(cent.count() === 4L)
    // every truth-cluster maps to exactly one learned cell (purity 1.0)
    val assigned = Similarity.ivfTopK(emb, cent, queryId = 0L, k = 10, nProbe = 1)
      .select("vec_id").as[Long].collect()
    assert(assigned.length === 10)
    assert(assigned.forall(_ < 40), s"probe-1 candidates crossed clusters: ${assigned.mkString(",")}")
    // deterministic retrain: same data + seed => identical model
    val cent2 = Similarity.kMeansCentroids(emb, k = 4, iters = 8, seed = 42L)
    val a = cent.orderBy("cell").as[(Int, Seq[Double])].collect()
    val b = cent2.orderBy("cell").as[(Int, Seq[Double])].collect()
    assert(a.map(_._1).sameElements(b.map(_._1)))
    a.zip(b).foreach { case ((_, x), (_, y)) =>
      x.zip(y).foreach { case (xi, yi) => assert(math.abs(xi - yi) < 1e-9) }
    }
  }

  test("committed IVF fixture: 16 centroids, probe pipeline returns k rows") {
    val cent = spark.read.parquet(graft.queries.PipelineQueries.ivfCentroidsPath)
    assert(cent.count() === 16L)
    assert(cent.schema("centroid").dataType.simpleString === "array<double>")
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val top = Similarity.ivfTopK(emb, cent, 0L, 10, nProbe = 4).collect()
    assert(top.length === 10)
    val cs = top.map(_.getAs[Double]("cos"))
    assert(cs.sameElements(cs.sortBy(-_)))
  }

  test("kmeans step: conserves members, agrees with the index build's assignment") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val cent = spark.read.parquet(graft.queries.PipelineQueries.ivfCentroidsPath)
    val step = Similarity.kmeansStep(emb, cent).collect()
    val byCell = step.map(r => (r.getInt(0), r.getLong(1))).distinct.toMap
    // every vector assigned to exactly one cell; 64 dims per cell
    assert(byCell.values.sum === emb.count())
    assert(step.length === byCell.size * 64)
    // the assignment must be the SAME argmax/tie-break writeIvfIndex uses
    val dir = java.nio.file.Files.createTempDirectory("km_spec").toString + "/idx"
    graft.ops.Indexes.writeIvfIndex(emb, cent, dir)
    val idxSizes = spark.read.parquet(dir)
      .groupBy(col("cell").cast("int").as("cell")).count()
      .as[(Int, Long)].collect().toMap
    assert(byCell === idxSizes)
    // refined means are finite and rounded (6 dp)
    assert(step.forall { r =>
      val v = r.getDouble(3)
      !v.isNaN && !v.isInfinite && math.abs(v * 1e6 - math.rint(v * 1e6)) < 1e-6
    })
  }

  test("kmeans train loop: hand-computed 2-round trajectory, fixed point") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val init = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cell", "centroid")
    val got = Similarity.kmeansTrain(emb, init, iters = 2, dim = 2)
      .orderBy("iter", "cell", "dim")
      .as[(Int, Int, Long, Int, Double)].collect()
    assert(got.length === 2 * 2 * 2)
    val iter1 = got.filter(_._1 == 1)
    // cosine assignment splits {0,1} vs {2,3}; float means round-6 cleanly
    assert(iter1.map(_._3).toSeq === Seq(2L, 2L, 2L, 2L))
    assert(iter1.map(_._5).toSeq === Seq(0.95, 0.05, 0.05, 0.95))
    // round 2 re-assigns identically off the new centroids → fixed point
    val iter2 = got.filter(_._1 == 2)
    assert(iter2.map(r => (r._2, r._3, r._4, r._5)).toSeq ===
      iter1.map(r => (r._2, r._3, r._4, r._5)).toSeq)
  }

  test("kmeans train loop: emptied cell carries its centroid, n_members 0") {
    // both vectors sit on cell 0's axis — cell 1 empties immediately
    val emb = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val init = Seq((0, Seq(1.0, 0.0)), (1, Seq(-1.0, 0.5)))
      .toDF("cell", "centroid")
    val got = Similarity.kmeansTrain(emb, init, iters = 1, dim = 2)
      .orderBy("cell", "dim")
      .as[(Int, Int, Long, Int, Double)].collect()
    assert(got.filter(_._2 == 0).map(_._3).toSeq === Seq(2L, 2L))
    assert(got.filter(_._2 == 1).map(r => (r._3, r._5)).toSeq ===
      Seq((0L, -1.0), (0L, 0.5)))
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

  test("scaledBandBits: floor at fixture scales, log-growth past them") {
    // every committed fixture SF derives the historical b = 6 (unchanged
    // results), and occupancy stays ~targetBucket as the corpus grows —
    // the round-11 probe fix for the quadratic candidate self-join
    assert(Similarity.scaledBandBits(500) === 6)
    assert(Similarity.scaledBandBits(2000) === 6)
    assert(Similarity.scaledBandBits(2048) === 6)
    assert(Similarity.scaledBandBits(2049) === 7)
    assert(Similarity.scaledBandBits(20000) === 10)
    assert(Similarity.scaledBandBits(2000000) === 16)
    // expected bucket occupancy n / 2^b never exceeds targetBucket
    Seq(100L, 5000L, 123456L, 10000000L).foreach { n =>
      val b = Similarity.scaledBandBits(n)
      assert(n.toDouble / (1L << b) <= 32.0, s"n=$n b=$b")
    }
  }
}
