package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: phase timing of the q_pagerank path. Not part of the
  * driver contract. Usage: runMain graft.tools.RankProbe [sfDir] */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-rankprobe")
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
    graft.SparkEntry.queries("q_pagerank")(spark, d).count() // cold/store build
    val tag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = s"${graft.ops.Indexes.indexRoot}/$tag"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val copurch = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.toString).filter(_.contains("/copurch_")).head
    val edges = spark.read.parquet(copurch)
    for (i <- 1 to 3) {
      println(s"--- iteration $i ---")
      clear()
      t("full q_pagerank") { graft.SparkEntry.queries("q_pagerank")(spark, d).count() }
      clear()
      t("pageRankFp iters=1") { graft.ops.PageRank.pageRankFp(edges, 1).count() }
      clear()
      t("pageRankFp iters=5") { graft.ops.PageRank.pageRankFp(edges, 5).count() }
      clear()
      t("edges count only") { edges.count() }
    }
    spark.stop()
  }
}
