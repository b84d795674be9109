package graft.tools

/** Dev tool: print the executed plan of registered queries — the fast way
  * to audit pushdown/pruning/DPP on the real fixture data without writing
  * a throwaway spec. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.PlanDump q_a[,q_b...] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_ann_lsh").split(",").toSeq
    val d = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, d)
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
