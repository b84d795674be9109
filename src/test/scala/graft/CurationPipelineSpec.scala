package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Decontamination, Dedup, LineDedup}

/** END-TO-END curation pipeline: the library's operators chained the way a
  * production training-data pass chains them — exact dedup → near-dup
  * survivor election → boilerplate line removal → windowed
  * decontamination → LM quality gate → domain mixing → token budgets →
  * packing. This is the
  * "switch to this library and run your whole pipeline" proof: every
  * stage consumes the previous stage's frame, stage invariants hold, and
  * the WHOLE chain is deterministic (two independent runs produce
  * identical bytes — every operator is hash-derived, no RNG, no
  * timestamps). */
class CurationPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  /** doc_id → 2-word pseudo-lines (the fixture has no newlines; same
    * derivation as the registered q_line_dedup). */
  private def pseudoLined(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        graft.ops.TextOps.words(coalesce(col("text"), lit(""))).as("w"))
      .select(col("doc_id"), col("source"), concat_ws("\n", transform(
          sequence(lit(0), call_function("div", size(col("w")) - 1, lit(2))),
          p => concat_ws(" ", slice(col("w"), p * 2 + 1, lit(2))))).as("text"))

  private case class PipelineOut(counts: Seq[Long], train: DataFrame,
                                 evalD: DataFrame, packed: DataFrame)

  private def runPipeline(): PipelineOut = {
    val docs = graft.engine.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val n0 = docs.count()

    // 1. exact dedup (digest group-by; shuffle carries md5+id)
    val exact = Dedup.dropExactDuplicates(docs)
    val n1 = exact.count()

    // 2. near-dup clusters keep their LONGEST member
    val pairs = Dedup.nearDupPairs(exact.select(col("doc_id"), col("text")), 0.3)
      .select(col("doc_a"), col("doc_b"))
    val best = Dedup.survivorsBy(exact, pairs,
      length(coalesce(col("text"), lit(""))))
    val n2 = best.count()

    // 3. cross-document boilerplate line removal on the surviving corpus
    val lined = pseudoLined(best)
    val cleaned = LineDedup.cleanDocs(lined.select(col("doc_id"), col("text")),
        maxDocFreq = 25)
      .join(lined.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("clean_text").as("text"))
    val n3 = cleaned.count()

    // 4. windowed decontamination: drop docs sharing >= 5 consecutive
    //    tokens with the src0 eval split
    val train = cleaned.where(col("source") =!= "src0")
    val evalD = cleaned.where(col("source") === "src0")
    val decon = Decontamination.removeContaminated(train, evalD, shingleN = 5)
    val n4 = decon.count()

    // 5. LM quality gate against the trusted slice: score every surviving
    //    training doc under a bigram LM trained on the eval/reference
    //    split and cut the worst decile (threshold derived from the exact
    //    score distribution, so the stage provably discriminates)
    val lmModel = graft.ops.LmScore.trainBigramLm(evalD)
    val thr = graft.ops.LmScore.lmScores(decon, lmModel)
      .where(col("n_bigrams") > 0)
      .agg(expr("percentile(nll, 0.9)")).as[Double].head()
    val gated = graft.ops.LmScore.lmGate(decon, lmModel, thr)
    val n5 = gated.count()

    // 6. deterministic domain mix + per-source token budgets
    val mixed = Curation.sampleByDomain(gated, Seq("src1" -> 50), default = 100)
    val n6 = mixed.count()
    val budgeted = Curation.tokenBudgetMix(mixed, Seq.empty, defaultBudget = 2000L)
    val n7 = budgeted.count()

    // 7. pack the budget-selected docs into 512-token shard bins
    val finalDocs = mixed.join(budgeted.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val packed = Curation.packSpans(finalDocs, capacity = 512, shardDocs = 100L)
    PipelineOut(Seq(n0, n1, n2, n3, n4, n5, n6, n7), decon, evalD, packed)
  }

  test("the full chain composes: monotone counts, clean output, exact packing") {
    val out = runPipeline()
    val Seq(n0, n1, n2, n3, n4, n5, n6, n7) = out.counts
    assert(n0 > 0)
    assert(n1 <= n0, "exact dedup never grows the corpus")
    assert(n2 <= n1, "survivor election never grows the corpus")
    assert(n2 < n0, "fixture must exercise at least one dedup stage")
    assert(n3 === n2, "line cleaning rewrites text, never drops docs")
    assert(n4 < n3, "decontamination must remove the eval split + hits")
    assert(n5 < n4, "the LM gate must drop the above-threshold tail")
    assert(n6 <= n5 && n7 <= n6 && n7 > 0)
    // packing conserves every selected doc exactly once
    assert(out.packed.count() === n7)
    assert(out.packed.select(countDistinct(col("doc_id"))).as[Long].head() === n7)
    // no contaminated doc survives: re-checking the decontaminated train
    // side against the SAME eval frame finds nothing (the removal is exact)
    val residual = Decontamination.contaminatedDocs(
      out.train, out.evalD, shingleN = 5).count()
    assert(residual === 0L, "decontaminated output must re-check clean")
  }

  test("registered q_pipeline_e2e audit: 9 stages, monotone counts, live fps") {
    val rows = graft.queries.PipelineQueries.pipelineE2e(spark, d)
      .orderBy(col("stage_id")).collect()
    assert(rows.length === 9)
    assert(rows.map(_.getInt(0)).toSeq === (0 to 8))
    val n = rows.map(_.getLong(2))
    // stages 0-5 only ever drop documents; mix/budget (6-7) also only drop
    assert((1 to 7).forall(i => n(i) <= n(i - 1)), n.toSeq)
    assert(n(8) === n(7), "packing conserves every budget-selected doc")
    assert(n.forall(_ > 0), "a dead stage would make the oracle vacuous")
    // every non-empty stage carries a content fingerprint (bit_xor of 48-bit
    // hashes over >0 rows is 0 only on accidental cancellation — not with
    // this fixture)
    assert(rows.forall(r => r.getString(3) !== "0"), rows.map(_.getString(3)).toSeq)
  }

  test("the whole pipeline is deterministic: two runs, identical bytes") {
    val a = runPipeline()
    val b = runPipeline()
    assert(a.counts === b.counts)
    // order-insensitive content fingerprint: per-row md5, sorted, folded
    val fingerprint = (df: DataFrame) => df
      .select(md5(concat_ws(":", col("source"), col("shard_id"), col("doc_id"),
        col("tokens"), col("start_bin"), col("end_bin"))).as("h"))
      .agg(md5(concat_ws(",", sort_array(collect_list(col("h"))))).as("fp"))
      .as[String].head()
    assert(fingerprint(a.packed) === fingerprint(b.packed))
  }
}
