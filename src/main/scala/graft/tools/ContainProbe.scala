package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: stage volumes and timings of the containment-pairs path.
  * Not part of the driver contract. Usage: runMain graft.tools.ContainProbe [sfDir] */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-containprobe")
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm
    graft.SparkEntry.queries("q_containment_pairs")(spark, d).count()
    val (setsPath, _) = graft.ops.Indexes.ensureMinhashIndex(spark,
      graft.engine.Tables.documents(spark, d), d)
    val sets = spark.read.parquet(setsPath)
    println("docs=" + sets.count())
    println("avg set size=" + sets.select(avg(size(col("sh")))).head.getDouble(0))
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("h"))
    println("postings=" + ex.count())
    val rare = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= 16).select(col("h"))
    println("rare shingles=" + rare.count())
    val rareEx = ex.join(rare, Seq("h"))
    println("rare postings=" + rareEx.count())
    val cand = rareEx.select(col("h"), col("doc_id").as("doc_a"))
      .join(rareEx.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    println("cand raw=" + cand.count())
    println("cand distinct=" + cand.distinct().count())
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      t("full q_containment_pairs") {
        graft.SparkEntry.queries("q_containment_pairs")(spark, d).count()
      }
    }
    spark.stop()
  }
}
