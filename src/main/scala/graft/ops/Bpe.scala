package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Subword tokenization against the committed BPE vocabulary — the
  * serving layer over [[graft.functions.BpeEncode]]: loads the frozen
  * model once per session (the IVF/PQ committed-model precedent,
  * memoized through the bounded model cache) and exposes the Column
  * forms the token-budget queries consume. Token counts here are what a
  * training pipeline actually budgets by — subword pieces, not
  * whitespace words (r13 VERDICT #6). */
object Bpe {
  /** The committed model ([[graft.tools.TrainBpeVocab]]'s output). */
  val VocabPath = "/root/repo/fixtures/bpe_vocab.parquet"

  /** Vocabulary pieces in merge order; tiny (≤ hundreds), collected once
    * per (plan, file-fingerprint) through the bounded model cache. */
  def vocab(spark: SparkSession, path: String = VocabPath): Seq[String] = {
    val df = spark.read.parquet(path)
    Indexes.memoModel(df, "bpe") {
      df.orderBy(col("rank")).select(col("piece"))
        .collect().map(_.getString(0)).toSeq
    }
  }

  /** Greedy longest-match pieces of one word. */
  def encode(word: Column, vocab: Seq[String]): Column =
    graft.functions.BpeEncode(word, vocab)

  /** Total subword count of a words ARRAY (the [[TextOps.wordsSafe]]
    * shape) — an exact integer fold, order-free. */
  def tokenCount(words: Column, vocab: Seq[String]): Column =
    aggregate(
      transform(words, w => size(graft.functions.BpeEncode(w, vocab)).cast("long")),
      lit(0L), (acc, x) => acc + x)
}
