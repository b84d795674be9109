package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeEncode
import graft.tools.TrainBpeVocab

/** Subword tokenization against the committed BPE vocabulary: the
  * trainer is deterministic, the greedy longest-match encode has the
  * textbook invariants (lossless concatenation, maximal pieces, total
  * coverage with no UNK), and the expression stays inside whole-stage
  * codegen. The cross-engine replay itself is gated by q_bpe_tokenize's
  * DuckDB oracle. */
class BpeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val model = graft.ops.Bpe.model(spark)
  private val vocab: Seq[String] = model.pieces.toSeq

  test("committed vocabulary: non-empty, pieces within [2, MaxPieceLen]") {
    assert(vocab.nonEmpty)
    assert(vocab.forall(p => p.length >= 2 && p.length <= BpeEncode.MaxPieceLen))
    assert(vocab.distinct === vocab, "merge order yields distinct pieces")
  }

  test("model handle: plan text carries the fingerprint, never the pieces") {
    // r14 VERDICT #1: the vocabulary must not ride the plan as a literal.
    // Pieces chosen to be impossible in plan-English, so a substring hit
    // can only mean the vocabulary leaked into the plan text.
    val ref = graft.functions.BpeVocabRef.inline("spec-handle",
      Seq("qqxx", "zzqy", "xxqqzz"))
    val df = spark.range(1).select(BpeEncode(lit("aaaa"), ref).as("p"))
    val plan = df.queryExecution.analyzed.toString +
      df.queryExecution.executedPlan.toString
    assert(plan.contains("bpe_model:spec-handle"),
      "the handle renders as its fingerprint")
    assert(Seq("qqxx", "zzqy", "xxqqzz").forall(p => !plan.contains(p)),
      s"no vocabulary piece may appear in plan text:\n$plan")
    // memoized: one broadcast per (model file, session)
    assert(graft.ops.Bpe.model(spark) eq model,
      "repeat loads share the session's broadcast handle")
    // equality/canonicalization reduce to the fingerprint id
    assert(graft.functions.BpeVocabRef.inline(model.id, Seq("xx")) === model)
  }

  test("trainer is deterministic and caps piece length") {
    val freqs = Seq(("banana", 10L), ("bandana", 6L), ("ananas", 4L),
      ("verylongtoken", 3L), ("verylongtoken", 3L))
    val a = TrainBpeVocab.train(freqs, 16)
    val b = TrainBpeVocab.train(freqs, 16)
    assert(a === b, "same corpus, same merges, byte for byte")
    assert(a.nonEmpty)
    assert(a.forall(_._1.length <= BpeEncode.MaxPieceLen))
    assert(a.map(_._2) === a.indices.map(_.toLong), "ranks are the merge order")
  }

  test("trainFast == train merge for merge (incremental counts are exact)") {
    // a corpus with ties, repeated pairs inside one word, over-length
    // candidates, and a realistic slice of the zipf fixture vocabulary
    val hand = Seq(("banana", 10L), ("bandana", 6L), ("ananas", 4L),
      ("verylongtoken", 3L), ("aaaa", 5L), ("abab", 5L), ("baba", 5L))
    assert(TrainBpeVocab.trainFast(hand, 32) === TrainBpeVocab.train(hand, 32))
    val zipf = (1 to 400).map(r =>
      (graft.tools.GenZipfCorpus.word(r), (1000.0 / math.pow(r, 1.1)).toLong + 1))
    assert(TrainBpeVocab.trainFast(zipf, 200) === TrainBpeVocab.train(zipf, 200))
  }

  test("encode: lossless, greedy-maximal, total coverage, codegen-resident") {
    val words = Seq("customer", "customers", "window", "xyzzy", "", "a",
      "joinjoin", "zzcustomer")
    val df = words.toDF("w")
      .select(col("w"), BpeEncode(col("w"), model).as("p"))
    val rows = df.as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      val p = rows(w)
      assert(p.mkString("") === w, s"concatenation must reproduce '$w'")
      assert(p.forall(t => t.length == 1 || vocab.contains(t)),
        s"every multi-char piece of '$w' must be in-vocabulary: $p")
      // greedy maximality: at each boundary, no LONGER vocabulary piece
      // was available
      var pos = 0
      p.foreach { t =>
        val remaining = w.length - pos
        ((t.length + 1) to math.min(BpeEncode.MaxPieceLen, remaining))
          .foreach { l =>
            assert(!vocab.contains(w.substring(pos, pos + l)),
              s"'$w'@$pos took '$t' but longer '${w.substring(pos, pos + l)}' is in-vocabulary")
          }
        pos += t.length
      }
    }
    assert(rows("") === Seq.empty, "empty word encodes to zero tokens")
    assert(rows("customer") === Seq("customer"), "an 8-char vocab word is one piece")
    // stays inside whole-stage codegen: the projection shows a *(n) span
    val ds = spark.range(4).select(BpeEncode(lit("customer"), model))
    assert(ds.queryExecution.executedPlan.toString.contains("*("),
      "BpeEncode must not break whole-stage codegen")
  }

  test("tokenCount equals the sum of per-word piece counts") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), graft.ops.TextOps.wordsSafe(col("text")).as("ws"))
    val viaAgg = docs.select(col("doc_id"),
        graft.ops.Bpe.tokenCount(col("ws"), model).as("n"))
      .as[(Long, Long)].collect().toMap
    val viaExplode = docs
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .select(col("doc_id"),
        size(BpeEncode(col("w"), model)).cast("long").as("n"))
      .groupBy("doc_id").agg(sum(col("n")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(viaAgg === viaExplode)
    assert(viaAgg.values.sum > 0)
  }
}
