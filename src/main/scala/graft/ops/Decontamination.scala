package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene step (an eval item leaking into the training corpus inflates
  * downstream scores).
  *
  * Scale shape (the eval side is small by construction — benchmarks are
  * thousands of documents, the corpus is billions):
  *  - both sides shingle through [[Dedup.shingleSets]], so the join keys are
  *    48-bit hashed shingle ids (8 bytes), never shingle strings;
  *  - the exploded eval shingle set is BROADCAST — the corpus-side pass is
  *    then a single scan + broadcast-hash semi-ish join with NO corpus
  *    shuffle until the per-doc aggregate (which shuffles only hit rows,
  *    a tiny fraction of the corpus);
  *  - the per-doc aggregate carries (doc_id, shingle_id, eval_id) longs
  *    only.
  */
object Decontamination {

  /** Per contaminated training doc: how many distinct shingles collide with
    * the eval set, and how many distinct eval docs are hit. Docs with zero
    * collisions are absent (the common case at corpus scale — keep the
    * output sparse). */
  def contaminatedDocs(train: DataFrame, evalDocs: DataFrame,
                       shingleN: Int = 3): DataFrame = {
    val tr = Dedup.shingleSets(train, shingleN)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val ev = Dedup.shingleSets(evalDocs, shingleN)
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("s"))
    tr.join(broadcast(ev), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_hit_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Per-source contamination audit over a training corpus: document count,
    * contaminated-document count, total colliding shingles, and the worst
    * single doc's eval-doc spread. The hit frame joins back to the corpus
    * BROADCAST (hits ≪ corpus at production scale; here it is bounded by
    * the train doc count), so the audit adds one corpus scan and two tiny
    * aggregates. */
  def contaminationSummary(train: DataFrame, evalDocs: DataFrame,
                           shingleN: Int = 3): DataFrame = {
    val hits = contaminatedDocs(train, evalDocs, shingleN)
    train.select(col("doc_id"), col("source"))
      .join(broadcast(hits), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hit_shingles").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
        coalesce(sum(col("n_hit_shingles")), lit(0L)).as("total_hit_shingles"),
        coalesce(max(col("n_eval_docs")), lit(0L)).as("max_eval_docs_hit"))
  }

  /** The decontaminated corpus: training docs with NO shingle collision
    * against the eval set — `train` minus [[contaminatedDocs]] via a
    * broadcast left-anti join (no corpus shuffle). */
  def removeContaminated(train: DataFrame, evalDocs: DataFrame,
                         shingleN: Int = 3): DataFrame =
    train.join(broadcast(contaminatedDocs(train, evalDocs, shingleN)
      .select(col("doc_id"))), Seq("doc_id"), "left_anti")
}
