package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{LmScore, Sketches, TextOps}

/** Bigram-LM perplexity scoring ([[graft.ops.LmScore]]): model exactness at
  * ample sketch width, scoring semantics at the edges, determinism, the
  * gate, and the join-free scan-stage plan contract. */
class LmScoreSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Reference corpus: "the cat sat" patterns repeated, so its bigrams are
  // frequent; vocabulary = {the, cat, sat, on, mat}.
  private lazy val ref = (Seq.fill(20)("the cat sat on the mat")
    ++ Seq.fill(5)("the cat sat")).toDF("text")
    .withColumn("doc_id", monotonically_increasing_id())

  private lazy val lm = LmScore.trainBigramLm(ref, depth = 4, width = 1024)

  test("model: exact counts at ample width, exact vocabulary") {
    assert(lm.vocab === 5L)
    // "the cat" occurs once per doc in all 25 docs; "on the" in 20.
    def est(flat: Array[Long], item: String): Long =
      Sketches.cmsCellsLocal(item, lm.depth, lm.width)
        .map { case (i, c) => flat(i * lm.width + c.toInt) }.min
    assert(est(lm.gram, "the cat") === 25L)
    assert(est(lm.gram, "on the") === 20L)
    assert(est(lm.gram, "mat the") === 0L)
    // prefix-word occurrences count POSITIONS (last word of a doc excluded):
    // "the" prefixes "the cat"×25 and "the mat"×20.
    assert(est(lm.prefix, "the") === 45L)
  }

  test("scores: frequent text scores low, unseen text scores high, edges are zero") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), // all bigrams frequent under the model
      (2L, "zebra quark fizz bang"),  // no bigram ever seen
      (3L, "single"),                 // too short to score
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val s = LmScore.lmScores(docs, lm).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(s.map(_._2).toSeq === Seq(5L, 3L, 0L, 0L))
    val byId = s.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 < byId(2L)._4, "in-distribution text must score lower NLL")
    assert(byId(1L)._3 < byId(2L)._3, "quantized score must agree on the ordering")
    assert(byId(3L)._4 === 0.0 && byId(4L)._4 === 0.0)
    // q2_nll is the integer quantization of the float term chain: for the
    // unseen doc every estimate is 0, so each of the 3 terms is exactly
    // length(bin(0+5)) - length(bin(0+1)) = 3 - 1 = 2.
    assert(byId(2L)._3 === 6L)
  }

  test("scores agree with a hand-computed NLL at ample width") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val row = LmScore.lmScores(docs, lm).head()
    // P(cat|the) = (25+1)/(45+5); P(sat|cat) = (25+1)/(25+5)
    val expected = -(math.log(26.0 / 50.0) + math.log(26.0 / 30.0)) / 2.0
    assert(math.abs(row.getDouble(3) - math.rint(expected * 1e6) / 1e6) < 1e-9)
  }

  test("trigram order: prefix counts align to n-gram starts, NLL hand-checks") {
    val lm3 = LmScore.trainNgramLm(ref, n = 3)
    assert(lm3.vocab === 5L)
    def est(flat: Array[Long], item: String): Long =
      Sketches.cmsCellsLocal(item, lm3.depth, lm3.width)
        .map { case (i, c) => flat(i * lm3.width + c.toInt) }.min
    // "the cat sat" opens all 25 docs; "sat on the" only the 20 6-word ones
    assert(est(lm3.gram, "the cat sat") === 25L)
    assert(est(lm3.gram, "sat on the") === 20L)
    // "the mat" closes the 6-word docs, so it starts NO trigram: prefix
    // occurrences must exclude trailing (n-1)-grams
    assert(est(lm3.prefix, "the cat") === 25L)
    assert(est(lm3.prefix, "the mat") === 0L)
    val row = LmScore.lmScores(
      Seq((1L, "the cat sat")).toDF("doc_id", "text"), lm3).head()
    // one scored position: P(sat | the cat) = (25+1)/(25+5)
    assert(row.getLong(1) === 1L)
    val expected = -math.log(26.0 / 30.0)
    assert(math.abs(row.getDouble(3) - math.rint(expected * 1e6) / 1e6) < 1e-9)
    // and a doc shorter than n scores zero positions
    assert(LmScore.lmScores(Seq((2L, "the cat")).toDF("doc_id", "text"), lm3)
      .head().getLong(1) === 0L)
  }

  test("training on an empty reference fails fast instead of scoring with ln 0") {
    val e = intercept[IllegalArgumentException] {
      LmScore.trainBigramLm(ref.where(lit(false)))
    }
    assert(e.getMessage.contains("empty"))
  }

  test("training is deterministic: two independent models are identical") {
    val again = LmScore.trainBigramLm(
      ref.where(lit(true)), depth = 4, width = 1024) // distinct plan -> no memo hit
    assert(again.gram.toSeq === lm.gram.toSeq)
    assert(again.prefix.toSeq === lm.prefix.toSeq)
    assert(again.vocab === lm.vocab)
  }

  test("gate keeps in-distribution and too-short docs, drops junk, preserves columns") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "a"),
      (2L, "zebra quark fizz bang", "b"),
      (3L, "single", "c")).toDF("doc_id", "text", "extra")
    // junk scores ln((0+V)/1) = ln 5 ~ 1.609 per position; in-distribution
    // text averages ~0.40 — the gate sits between
    val kept = LmScore.lmGate(docs, lm, maxNll = 1.0)
    assert(kept.columns.toSeq === Seq("doc_id", "text", "extra"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("plan: scoring a corpus scan is join-free and exchange-free") {
    val dir = java.nio.file.Files.createTempDirectory("lm_plan").toString
    (0 until 64).map(i => (i.toLong, s"the cat sat on doc $i"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val plan = LmScore.lmScores(spark.read.parquet(dir), lm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"scoring must stay codegen'd:\n$plan")
  }

  test("plan: scoring and gate run the native kernel exactly once per row") {
    val dir = java.nio.file.Files.createTempDirectory("lm_gate_plan").toString
    (0 until 64).map(i => (i.toLong, s"the cat sat on doc $i"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    def kernels(plan: String): Int =
      "graft_lm_doc_score".r.findAllIn(plan).length
    val scorePlan = LmScore.lmScores(spark.read.parquet(dir), lm)
      .queryExecution.optimizedPlan.toString
    val gatePlan = LmScore.lmGate(spark.read.parquet(dir), lm, maxNll = 1.0)
      .queryExecution.optimizedPlan.toString
    // r20: the whole tokenize->md5->CMS chain lives inside ONE compiled
    // kernel call; the gate's nondeterministic barrier still pins it to
    // its own projection (pushdown would clone it per struct field)
    assert(kernels(scorePlan) === 1, s"scoring must score once:\n$scorePlan")
    assert(kernels(gatePlan) === 1, s"gate must score once:\n$gatePlan")
    assert(!scorePlan.contains("split("), s"no interpreted tokenize:\n$scorePlan")
    assert(!gatePlan.contains("Join") && !gatePlan.contains("Exchange"),
      s"the gate stays a scan-stage filter:\n$gatePlan")
  }

  test("kernel == exploded Column derivation, value for value (bigram and 5-gram)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zebra quark fizz bang mat cat the on"),
      (3L, "single"),
      (4L, ""),
      (5L, null.asInstanceOf[String]),
      (6L, "  the   CAT sat  "), // trim/lower/collapse parity
      (7L, "the cat sat on the mat the cat sat on the mat")
    ).toDF("doc_id", "text")
    for (model <- Seq(lm, LmScore.trainNgramLm(ref, n = 5))) {
      val kernel = LmScore.lmScores(docs, model).orderBy("doc_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
      val exploded = LmScore.lmScoresKeepingExploded(docs, model, Nil)
        .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
      assert(kernel === exploded, s"n=${model.n}")
    }
  }

  test("reserved intermediate columns in the input fail fast instead of clobbering") {
    val docs = Seq((1L, "the cat", "x")).toDF("doc_id", "text", "__graft_eb")
    val e = intercept[IllegalArgumentException] {
      LmScore.lmScores(docs, lm)
    }
    assert(e.getMessage.contains("__graft_eb"))
  }

  test("literal-embedded CMS lookup equals the join-based estimate on arbitrary corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val corpusGen = Gen.choose(1, 300).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((0 until 40).map(i => s"tok$i"))))
    for (seed <- 1L to 4L) {
      val items = sample(corpusGen, seed)
      val (depth, width) = sample(Gen.oneOf((1, 64), (2, 16), (4, 256)), seed + 50)
      val probes = items.distinct.take(10) :+ "never-seen"
      val sketch = Sketches.cmsBuild(items.toDF("item"), "item", depth, width)
      val viaJoin = Sketches.cmsEstimate(sketch, probes, depth, width)
        .as[(String, Long)].collect().toMap
      val flat = Sketches.cmsFlat(sketch, depth, width)
      val viaLiteral = probes.toDF("item")
        .select(col("item"), Sketches.cmsLookupHashed(
          TextOps.shingleHash(col("item")), flat, depth, width).as("est"))
        .as[(String, Long)].collect().toMap
      assert(viaLiteral === viaJoin, s"seed $seed d=$depth w=$width")
    }
  }

  test("CMS lookup column equals the exact count for every reference bigram") {
    // ample width => the literal-embedded lookup reproduces exact counts for
    // ALL bigrams of the reference (not just spot probes)
    val bigs = ref.select(explode(TextOps.shingles(
        TextOps.words(col("text")), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("exact"))
    val checked = bigs.select(col("g"), col("exact"),
      Sketches.cmsLookupHashed(TextOps.shingleHash(col("g")),
        lm.gram, lm.depth, lm.width).as("est"))
    assert(checked.where(col("est") =!= col("exact")).count() === 0L)
  }
}
