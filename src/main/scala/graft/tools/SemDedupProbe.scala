package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: phase timings of the semantic-dedup path.
  * Not part of the driver contract. Usage: runMain graft.tools.SemDedupProbe [sfDir] */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-semdedupprobe")
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm
    graft.SparkEntry.queries("q_semantic_dedup")(spark, d).count()
    val emb = graft.engine.Tables.embeddings(spark, d)
    val cent = spark.read.parquet(graft.queries.PipelineQueries.semanticCentroidsPath)
    val idxPath = graft.ops.Indexes.ensureIvfIndex(spark, emb, cent, d, nCells = 256)
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      t("ensureIvfIndex (presence check)") {
        graft.ops.Indexes.ensureIvfIndex(spark, emb, cent, d, nCells = 256)
      }
      val pairs = t("semanticDedupPairs plan+count") {
        val p = graft.ops.Indexes.semanticDedupPairs(emb, idxPath, threshold = 0.4)
        println("  pairs=" + p.count()); p
      }
      t("connectedComponents") {
        graft.ops.Dedup.connectedComponents(
          pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))).count()
      }
      t("full q_semantic_dedup") {
        graft.SparkEntry.queries("q_semantic_dedup")(spark, d).count()
      }
    }
    spark.stop()
  }
}
