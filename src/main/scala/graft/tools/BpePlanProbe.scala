package graft.tools

import org.apache.spark.sql.functions._

/** One-shot measurement for the BPE serving-design claims (r14 VERDICT
  * #1): plan-text size must be independent of vocabulary size (the
  * handle renders as its fingerprint), planning time must not walk the
  * pieces, and the encode throughput at the 32k stress vocabulary must
  * be on record. Prints a compact report; the numbers land in
  * `results/BPE_SCALE_r15.md`. */
object BpePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-bpe-plan-probe")

    def probe(tag: String, path: String): Unit = {
      val m = graft.ops.Bpe.model(spark, path)
      val df = graft.queries.PipelineQueries
        .bpeTokenizeForProbe(spark, sfDir, m)
      val t0 = System.nanoTime()
      val planned = df.queryExecution.executedPlan
      val planMs = (System.nanoTime() - t0) / 1e6
      val planText = df.queryExecution.analyzed.toString + planned.toString
      // timed encode pass (steady state: 2nd of 2)
      df.count()
      val t1 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"[bpeprobe] $tag pieces=${m.size}%6d plan_chars=${planText.length}%7d " +
        f"plan_ms=$planMs%8.1f encode_s=$sec%7.3f rows=$rows id=${m.id}")
    }
    probe("served_89 ", graft.ops.Bpe.VocabPath)
    probe("stress_32k", graft.ops.Bpe.StressVocabPath)
    spark.stop()
  }
}
