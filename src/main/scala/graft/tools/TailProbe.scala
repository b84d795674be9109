package graft.tools

/** Dev probe: split a query's bench-timed cost into (a) DataFrame
  * construction (operator body incl. eager driver actions), (b) analysis+
  * optimization+execution via count(). Usage:
  * runMain graft.tools.TailProbe q_a,q_b[,...] [sfDir] */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_value_counts").split(",").toSeq
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-tailprobe")
    spark.sparkContext.setLogLevel("ERROR")
    // warm every plan once (JIT + janino + index presence)
    names.foreach(n => graft.SparkEntry.queries(n)(spark, d).count())
    for (_ <- 1 to 3; n <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+plan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"[tail] $n%-32s build ${(t1 - t0) / 1e9}%6.3f  plan ${(t2 - t1) / 1e9}%6.3f  exec ${(t3 - t2) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
