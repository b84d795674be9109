package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: dump the formatted plans of INTERNAL subpipelines whose
  * registered queries collapse to a driver-side result (connected
  * components / greedy selection collect before the final frame), so the
  * plans/rNN before/after artifacts can still evidence the plan-shape
  * claims. Usage: runMain graft.tools.SubplanDump <outDir> <suffix> [sfDir] */
object SubplanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val d = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-subplandump")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), formatted)
      println(s"[subplan] wrote $name$suffix")
    }
    val emb = graft.engine.Tables.embeddings(spark, d)
    val semCent = spark.read.parquet(
      graft.queries.PipelineQueries.semanticCentroidsPath)
    val semIdx = graft.ops.Indexes.ensureIvfIndex(spark, emb, semCent, d,
      nCells = 256)
    dump("semantic_dedup_pairs",
      graft.ops.Indexes.semanticDedupPairs(emb, semIdx, threshold = 0.4))
    dump("semantic_dedup_pairs_blocked",
      graft.ops.Indexes.semanticDedupPairs(emb, semIdx, threshold = 0.4,
        maxCellSize = 8L))
    val ivfCent = spark.read.parquet(graft.queries.PipelineQueries.ivfCentroidsPath)
    dump("kcenter_cell_assignment",
      graft.ops.Selection.ivfCellAssignment(emb, ivfCent))
    spark.stop()
  }
}
