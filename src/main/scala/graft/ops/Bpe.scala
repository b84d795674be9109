package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BpeVocabRef

/** Subword tokenization against the committed BPE vocabulary — the
  * serving layer over [[graft.functions.BpeEncode]]: loads the frozen
  * model once per session (the IVF/PQ committed-model precedent,
  * memoized through the bounded model cache), broadcasts it once, and
  * exposes the Column forms the token-budget queries consume. Token
  * counts here are what a training pipeline actually budgets by —
  * subword pieces, not whitespace words (r13 VERDICT #6). */
object Bpe {
  /** The committed model ([[graft.tools.TrainBpeVocab]]'s output). */
  val VocabPath = "/root/repo/fixtures/bpe_vocab.parquet"

  /** The committed PRODUCTION-SCALE stress model (32k pieces —
    * [[graft.tools.GenStressVocab]]): proves the handle/broadcast
    * serving design at a real tokenizer's vocabulary size. */
  val StressVocabPath = "/root/repo/fixtures/bpe_vocab_32k.parquet"

  /** The committed model TRAINED FROM TEXT at vocabulary scale (8192
    * merges over the zipf fixture corpus's ~26k distinct words —
    * [[graft.tools.GenZipfCorpus]] + [[graft.tools.TrainBpeVocab]]
    * `--corpus`): unlike the stress fill, every piece here emerged from
    * corpus statistics, so piece-length mix and probe depth are those
    * of a real tokenizer. */
  val ZipfVocabPath = "/root/repo/fixtures/bpe_vocab_zipf8k.parquet"

  /** The committed vocabulary as a fingerprint-keyed broadcast handle
    * (r14 VERDICT #1 — the pieces never ride a plan literal). ONE
    * broadcast per (model file, session): the ref is memoized through
    * the bounded model cache keyed by the model's content fingerprint,
    * so every query in a session shares the handle and Catalyst sees
    * one canonical model id. */
  def model(spark: SparkSession, path: String = VocabPath): BpeVocabRef = {
    val df = graft.engine.Tables.parquetCached(spark, path)
    // the cached value wraps a BROADCAST, which dies with its
    // SparkContext — unlike every other memoized model (plain driver
    // values), so the memo key must carry the application id: a second
    // context in one JVM (spec suites, notebook restarts) would
    // otherwise be served a handle whose blocks no longer exist
    // (review catch). Stale entries from a stopped context age out of
    // the bounded LRU; their broadcasts died with that context.
    Indexes.memoModel(df, s"bpe_${spark.sparkContext.applicationId}") {
      val pieces = df.orderBy(col("rank")).select(col("piece"))
        .collect().map(_.getString(0))
      BpeVocabRef.broadcastRef(spark, Indexes.corpusFingerprint(df), pieces)
    }
  }

  /** Greedy longest-match pieces of one word. */
  def encode(word: Column, model: BpeVocabRef): Column =
    graft.functions.BpeEncode(word, model)

  /** Total subword count of a words ARRAY (the [[TextOps.wordsSafe]]
    * shape) — an exact integer fold, order-free. */
  def tokenCount(words: Column, model: BpeVocabRef): Column =
    aggregate(
      transform(words, w => size(graft.functions.BpeEncode(w, model)).cast("long")),
      lit(0L), (acc, x) => acc + x)
}
