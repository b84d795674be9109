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

  private val langSeeds = Seq(
    (1L, "en", "the cat and the dog of the house and the mouse"),
    (2L, "en", "the road and the river of the north and the town"),
    (3L, "de", "der hund und die katze und das haus der strasse"),
    (4L, "de", "die kinder und der wald und das wasser die berge"),
    (5L, "fr", "le chien et la maison et le fleuve la montagne"),
    (6L, "fr", "la ville et le jardin et la riviere le chateau"),
    (7L, "es", "el perro y los gatos y la casa los rios"),
    (8L, "es", "los pueblos y el bosque y las montanas el camino")
  ).toDF("doc_id", "lang", "text")

  test("multiclass langid: seeds classified back, minority doc the marker heuristic mislabels") {
    val m = TextClassifier.trainLangId(langSeeds, "lang", buckets = 128)
    assert(m.labels === Seq("de", "en", "es", "fr"))
    val back = TextClassifier.langIdPredict(langSeeds, m)
      .select(col("doc_id"), col("lang"), col("predicted"))
      .as[(Long, String, String)].collect()
    assert(back.forall(r => r._2 == r._3),
      s"seeds must classify back to their own labels: ${back.mkString(", ")}")

    // the planted minority doc: German content words with NO article/
    // conjunction markers — the heuristic's votes are all zero, so it
    // answers 'other'; the trained char-trigram model still matches the
    // German seeds' trigram mass (hund/katze/haus/wald/wasser stems)
    val planted = Seq((99L, "katzen hunde wasserhaus waldkinder bergstrasse"))
      .toDF("doc_id", "text")
    val heuristic = planted
      .select(graft.ops.TextAnalysis.langId(col("text")).as("p"))
      .as[String].head()
    assert(heuristic === "other",
      s"the marker heuristic must mislabel the planted doc, got $heuristic")
    val trained = TextClassifier.langIdPredict(planted, m)
      .select(col("predicted")).as[String].head()
    assert(trained === "de",
      s"the trained model must recover the planted doc's language, got $trained")
  }

  test("multiclass langid: all-tied scores fall to the smallest label (oracle tie rule)") {
    // equal class doc counts -> equal priors; an empty doc contributes no
    // gram terms, so every class score is exactly its prior and the
    // argmax must take the ascending-label tie-break the oracle replays
    val m = TextClassifier.trainLangId(langSeeds, "lang", buckets = 128)
    val p = TextClassifier.langIdPredict(
        Seq((100L, "")).toDF("doc_id", "text"), m)
      .select(col("predicted")).as[String].head()
    assert(p === "de", s"tie must fall to the smallest label, got $p")
  }

  test("multiclass langid: prediction plan is join-free and shuffle-free") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = TextClassifier.trainLangId(
      docs.where(col("lang").isNotNull), "lang")
    val plan = TextClassifier.langIdPredict(docs, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"prediction must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"prediction must not shuffle:\n$plan")
  }

  test("multiclass langid: native kernel == Column derivation (fixture + seeds + nulls)") {
    // the oracle replays the Column chain; the served path is the
    // native expression — their identity is the whole safety argument
    def preds(df: org.apache.spark.sql.DataFrame,
              m: TextClassifier.NbLangModel,
              f: (org.apache.spark.sql.DataFrame, TextClassifier.NbLangModel,
                  String) => org.apache.spark.sql.DataFrame) =
      f(df, m, "text").select(col("doc_id"), col("predicted"))
        .as[(Long, String)].collect().toMap
    val mSeeds = TextClassifier.trainLangId(langSeeds, "lang", buckets = 128)
    val probe = langSeeds.select(col("doc_id"), col("text"))
      .unionByName(Seq((200L, ""), (201L, null.asInstanceOf[String]),
        (202L, "katzen hunde wasserhaus")).toDF("doc_id", "text"))
    assert(preds(probe, mSeeds, TextClassifier.langIdPredict) ===
      preds(probe, mSeeds, TextClassifier.langIdPredictColumns(_, _, _)))

    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    val m = TextClassifier.trainLangId(docs.where(col("lang").isNotNull), "lang")
    assert(preds(docs, m, TextClassifier.langIdPredict) ===
      preds(docs, m, TextClassifier.langIdPredictColumns(_, _, _)))
  }

  test("multiclass langid: degenerate and monolingual label sets (session-close review)") {
    // a label whose seed docs are all shorter than the gram width
    // contributes ZERO trigrams: its table must still exist (all-zero
    // counts -> ln(1/(0+256)) cells, the smoothing the oracle's tok CTE
    // must also keep), so a gram-bearing doc scores it hugely negative
    // and NEVER predicts it — while the class itself still trains
    val seeds = langSeeds.unionByName(
      Seq((50L, "xx", "ab"), (51L, "xx", "c")).toDF("doc_id", "lang", "text"))
    val m = TextClassifier.trainLangId(seeds, "lang", buckets = 128)
    assert(m.labels === Seq("de", "en", "es", "fr", "xx"))
    val back = TextClassifier.langIdPredict(
        langSeeds.select(col("doc_id"), col("text")), m)
      .select(col("predicted")).as[String].collect()
    assert(!back.contains("xx"),
      s"a zero-gram class must never win a gram-bearing doc: ${back.mkString(",")}")

    // a monolingual corpus is a normal curation input: the model must
    // degrade to the trivial argmax, not crash on a label-count bound
    val mono = TextClassifier.trainLangId(
      langSeeds.where(col("lang") === "en"), "lang", buckets = 128)
    val p = TextClassifier.langIdPredict(
        Seq((60L, "whatever text")).toDF("doc_id", "text"), mono)
      .select(col("predicted")).as[String].head()
    assert(p === "en")
  }

  test("langMixDrift: hand-built mixes — symmetric KL, zero drift, majority tie-break") {
    // sources A {en:3, de:1} and B {en:1, de:3} against corpus
    // {en:6, de:6} (q = 0.5 each): their KLs are equal by symmetry and
    // strictly positive; source C {en:2, de:2} matches the corpus mix
    // exactly -> every class term is round(p*ln(1)*1e6) = 0 and kl_mix
    // is exactly 0.0; C's majority ties on count and must fall to the
    // smallest label — 'de' < 'en' (the argmax rule)
    val pred = Seq(
      ("A", "en"), ("A", "en"), ("A", "en"), ("A", "de"),
      ("B", "en"), ("B", "de"), ("B", "de"), ("B", "de"),
      ("C", "en"), ("C", "en"), ("C", "de"), ("C", "de"))
      .toDF("source", "predicted")
    val out = TextClassifier.langMixDrift(pred)
      .as[(String, Long, String, Double)].collect().toSeq
    // the op's own arithmetic, replayed: per-class fixed-point terms
    // summed exactly, scaled back at 6 dp
    val expectedKlA = BigDecimal(
      (math.round(0.75 * math.log(0.75 / 0.5) * 1e6) +
        math.round(0.25 * math.log(0.25 / 0.5) * 1e6)).toDouble / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      ("A", 4L, "en", expectedKlA),
      ("B", 4L, "de", expectedKlA),
      ("C", 4L, "de", 0.0)))
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

  test("nbScores: native kernel == exploded Column derivation, value for value") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = TextClassifier.trainNaiveBayes(
      docs.where(col("source") === "src1"),
      docs.where(col("source") === "src2"))
    val edge = Seq(
      (900001L, ""), (900002L, null.asInstanceOf[String]),
      (900003L, "  MIXED   Case   tokens  "), (900004L, "one"))
      .toDF("doc_id", "text")
    for (frame <- Seq(docs.select(col("doc_id"), col("text")), edge)) {
      val kernel = TextClassifier.nbScores(frame, m).orderBy("doc_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
      val exploded = TextClassifier.nbScoresExploded(frame, m).orderBy("doc_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(kernel === exploded)
    }
  }
}
