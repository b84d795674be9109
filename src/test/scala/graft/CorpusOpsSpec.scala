package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Decontamination, TextAnalysis}

/** Corpus-curation operators added round 4: benchmark decontamination,
  * repetition filters, n-gram document frequency, domain-mixture sampling. */
class CorpusOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Eval doc 100 leaks verbatim into train doc 1; train doc 2 shares a
  // 3-gram window; train doc 3 is clean (disjoint vocabulary).
  private lazy val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "srcA"),
    (2L, "something quick brown fox entirely different here today", "srcA"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta", "srcB")
  ).toDF("doc_id", "text", "source")
  private lazy val evalSet = Seq(
    (100L, "the quick brown fox jumps over the lazy dog", "eval")
  ).toDF("doc_id", "text", "source")

  test("decontamination flags exactly the overlapping train docs") {
    val hits = Decontamination.contaminatedDocs(train, evalSet)
      .as[(Long, Long, Long)].collect().map { case (id, n, e) => id -> ((n, e)) }.toMap
    assert(hits.keySet === Set(1L, 2L))
    assert(hits(1L)._1 === 7L, "verbatim copy shares all 7 distinct 3-grams")
    assert(hits(2L)._1 === 1L, "one shared window: 'quick brown fox'")
    assert(hits.values.forall(_._2 === 1L), "single eval doc hit")
    val clean = Decontamination.removeContaminated(train, evalSet)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(3L))
  }

  test("contamination report: run merge, positions, sub-window cap") {
    // eval 100 = "a b c d e f g h"; train 10 contains the 5-token run
    // "a b c d e" (window positions 2,3,4) and a detached "e f g" (pos 10);
    // train 11 is a 2-token verbatim copy of eval 101 (sub-window fallback)
    val tr = Seq(
      (10L, "x y a b c d e q r s e f g", "srcA"),
      (11L, "c d", "srcA"),
      (12L, "alpha beta gamma delta epsilon", "srcB")
    ).toDF("doc_id", "text", "source")
    val ev = Seq(
      (100L, "a b c d e f g h", "eval"),
      (101L, "c d", "eval")
    ).toDF("doc_id", "text", "source")
    val rpt = Decontamination.contaminationReport(tr, ev, windowN = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(rpt.keySet === Set((10L, 100L), (11L, 101L)))
    // windows "a b c","b c d","c d e","e f g" → 4 distinct; leak starts at
    // train pos 2 / eval pos 0; runs {2,3,4} and {10} → longest 3+3-1=5
    assert(rpt((10L, 100L)) === ((4L, 2L, 0L, 5L)))
    // sub-window verbatim copy: 1 fallback window, capped at 2 real tokens
    assert(rpt((11L, 101L)) === ((1L, 0L, 0L, 2L)))
    // evidence and verdict agree: report pairs cover exactly the flagged docs
    val flagged = Decontamination.contaminatedDocsWindowed(tr, ev, windowN = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(rpt.keySet.map(_._1) === flagged)
  }

  test("bloom-prefiltered decontamination equals the exact pass") {
    // tiny fixture: exact frame equality, row for row
    val exact = Decontamination.contaminatedDocs(train, evalSet)
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Decontamination.contaminatedDocsBloom(train, evalSet)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom === exact,
      "confirm join must scrub every bloom false positive")
    // real corpus: the registered query's summary matches the exact summary
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val exactSum = Decontamination.contaminationSummary(
        docs.where(col("source") =!= "src1"), docs.where(col("source") === "src1"))
      .orderBy("source").collect().toSeq
    val bloomSum = graft.queries.PipelineQueries
      .bloomDecontaminate(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(bloomSum === exactSum)
  }

  test("bloom prefilter prunes the corpus-side join input") {
    // the whole point of the prefilter: fewer shingle rows reach the
    // confirm join than the corpus emits (clean docs drop at the Filter)
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val trainD = docs.where(col("source") =!= "src1")
    val evalD = docs.where(col("source") === "src1")
    val ev = graft.ops.Dedup.shingleSets(evalD)
      .select(explode(col("sh")).as("s"))
    val bits = graft.ops.Bloom.buildBitset(ev, "s", 1 << 19, 5)
    val corpus = graft.ops.Dedup.shingleSets(trainD)
      .select(explode(col("sh")).as("s"))
    val total = corpus.count()
    val surviving = corpus.where(graft.ops.Bloom.mightContain(col("s"), bits, 5)).count()
    assert(surviving < total,
      s"bloom should prune join probes: $surviving of $total survived")
  }

  test("bloom bitset memo keys on shingleN — no stale reuse across widths") {
    // regression (round-7 ADVICE): the memo family once omitted shingleN,
    // so a same-session call with a different width reused the stale
    // bitset and produced false negatives ahead of the confirm join. The
    // memo only engages for file-backed frames, so this must run on the
    // fixture corpus, not a local Seq.
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val trainD = docs.where(col("source") =!= "src0")
    val evalD = docs.where(col("source") === "src0")
    // warm the memo at the default width first
    Decontamination.contaminatedDocsBloom(trainD, evalD, shingleN = 3).count()
    val exact2 = Decontamination.contaminatedDocs(trainD, evalD, shingleN = 2)
      .as[(Long, Long, Long)].collect().toSet
    val bloom2 = Decontamination.contaminatedDocsBloom(trainD, evalD, shingleN = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom2 === exact2,
      "a 2-shingle call must not serve from the 3-shingle bitset")
  }

  test("contamination summary aggregates per source") {
    val sum = Decontamination.contaminationSummary(train, evalSet)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(sum === Seq(("srcA", 2L, 2L, 8L, 1L), ("srcB", 1L, 0L, 0L, 0L)))
  }

  test("repetition metrics: exact fractions on constructed docs") {
    val docs = Seq(
      (1L, "a b a b a b", "s"),          // 2-grams: ab ba ab ba ab → dup 1-2/5
      (2L, "u v w x y z", "s"),          // all distinct → dup 0, top 1/6
      (3L, "solo", "s")                  // <2 words: NO 2-grams → dup 0, not 1
    ).toDF("doc_id", "text", "source")
    val m = TextAnalysis.repetitionMetrics(docs)
      .select("doc_id", "dup_2gram_frac", "top_word_frac")
      .as[(Long, Double, Double)].collect().map { case (id, d, t) => id -> ((d, t)) }.toMap
    assert(math.abs(m(1L)._1 - (1.0 - 2.0 / 5.0)) < 1e-12)
    assert(math.abs(m(1L)._2 - 0.5) < 1e-12) // 'a' 3 of 6
    assert(m(2L)._1 === 0.0)
    assert(math.abs(m(2L)._2 - 1.0 / 6.0) < 1e-12)
    assert(m(3L)._1 === 0.0, "a doc with no 2-grams has no repetition")
    assert(m(3L)._2 === 1.0)
  }

  test("ngram doc frequency ranks by distinct-doc count with total order") {
    val docs = Seq(
      (1L, "x y x y", "s"), (2L, "x y z", "s"), (3L, "x y q", "s")
    ).toDF("doc_id", "text", "source")
    val top = TextAnalysis.ngramDocFreq(docs, n = 2, k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // "x y" in all 3 docs (4 occurrences: twice in doc 1)
    assert(top.head === ("x y", 4L, 3L))
    assert(top.map(_._1) === top.map(_._1).distinct)
  }

  test("domain mix: audit agrees with the sampled frame; bounds exact") {
    val docs = spark.range(1000)
      .select(col("id").as("doc_id"),
        concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
        lit("w w w").as("text"))
    val rates = Seq("src0" -> 100, "src1" -> 0, "src2" -> 25)
    val audit = Curation.domainMixAudit(docs, rates, default = 75)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(audit("src0")._1 === audit("src0")._2, "rate 100 keeps everything")
    assert(audit("src1")._2 === 0L, "rate 0 keeps nothing")
    val sampled = Curation.sampleByDomain(docs, rates, default = 75)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sampled.getOrElse("src1", 0L) === 0L)
    assert(audit.view.mapValues(_._2).toMap ===
      audit.keySet.map(s => s -> sampled.getOrElse(s, 0L)).toMap)
    // deterministic: same doc kept on every evaluation
    val again = Curation.sampleByDomain(docs, rates, default = 75)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again === sampled)
  }

  test("semantic decontamination: planted clone caught, clean vectors kept") {
    // eval 0 leaks VERBATIM into train 30 (cos = 1 -> identical band keys
    // in every table, so LSH recall is 1 for this pair by construction);
    // train 31 is a near-copy of eval 1; train 32 points the opposite way
    val base = java.nio.file.Files.createTempDirectory("semdecon").toString
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(k => (graft.ops.TextOps.mix64(seed * 8 + k) % 1000).toFloat)
    val rows =
      (0L until 10L).map(i => (i, vec(i.toInt))) ++            // eval panel
      (10L until 30L).map(i => (i, vec(i.toInt))) :+           // clean train
      (30L, vec(0)) :+                                         // verbatim leak of eval 0
      (31L, vec(1).zipWithIndex.map { case (v, k) => if (k == 0) v + 1f else v }) :+
      (32L, vec(2).map(v => -v))                               // anti-correlated
    rows.toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$base/emb")
    val emb = spark.read.parquet(s"$base/emb")
    val idx = graft.ops.Indexes.ensureLshIndex(spark, emb, s"$base/corpus",
      bBits = 3, lTables = 4, dim = 8, partitionByBucket = false)
    val got = graft.ops.Decontamination
      .semanticDecontaminate(emb, idx, col("vec_id") < 10, threshold = 0.999)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.contains(30L) && got(30L)._1 === 0L && got(30L)._2 === 1.0)
    assert(got.contains(31L) && got(31L)._1 === 1L) // near-copy still >= .999
    assert(!got.contains(32L) && !got.keys.exists(_ < 10L))
    // lowering the bar keeps the argmax contract: best eval match reported
    val loose = graft.ops.Decontamination
      .semanticDecontaminate(emb, idx, col("vec_id") < 10, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(loose.map(_._1).distinct.length === loose.length) // one row per vec
  }
}
