package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: phase-level timing of the q_hits path (edge store read,
  * hitsFp at varying round counts, the presentation tail). Not part of
  * the driver contract. Usage: runMain graft.tools.HitsProbe [sfDir] */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-hitsprobe")
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag").count().count()
    // ensure the committed edge store exists (cold build untimed)
    graft.SparkEntry.queries("q_hits")(spark, d).count()
    for (i <- 1 to 3) {
      println(s"--- iteration $i ---")
      clear()
      t("full q_hits") { graft.SparkEntry.queries("q_hits")(spark, d).count() }
      clear()
      val edPath = t("find edge path") {
        // same derivation as the query: just re-invoke and read its input
        ""
      }
      // direct hitsFp timings on the committed store
      val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
      val root = s"${graft.ops.Indexes.indexRoot}/$tag"
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val purch = fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.toString).filter(_.contains("/purch_")).head
      val edges = spark.read.parquet(purch)
      clear()
      t("hitsFp iters=1") { graft.ops.PageRank.hitsFp(edges, 1).count() }
      clear()
      t("hitsFp iters=4") { graft.ops.PageRank.hitsFp(edges, 4).count() }
      clear()
      t("edges count only") { edges.count() }
    }
    spark.stop()
  }
}
