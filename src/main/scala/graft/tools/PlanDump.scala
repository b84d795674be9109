package graft.tools

/** Dev tool: print the executed plan of registered queries — the fast way
  * to audit pushdown/pruning/DPP on the real fixture data without writing
  * a throwaway spec. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.PlanDump q_a[,q_b...] [sfDir]
  *
  * SPARK_GRAFT_PLAN_OUT=<dir> additionally writes each query's
  * `explain("formatted")` output to `<dir>/<name><SPARK_GRAFT_PLAN_SUFFIX>.txt`
  * (suffix defaults to empty) — the round's before/after plan artifacts
  * under plans/rNN/ are produced this way.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_ann_lsh").split(",").toSeq
    val d = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    outDir.foreach(p => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(p)))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, d)
      println(s"===== $n =====")
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(formatted)
      outDir.foreach { p =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(p, s"$n$suffix.txt"), formatted)
      }
    }
    spark.stop()
  }
}
