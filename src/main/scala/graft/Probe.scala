package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local("32", "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = graft.engine.Tables.documents(spark, d).cache()
    docs.count()
    time("warm")(docs.count())
    time("shingleSet")(graft.ops.Dedup.shingleSets(docs).select(explode(col("sh"))).count())
    val sig = graft.ops.Dedup.minhashSignatures(docs)
    time("signatures")(sig.count())
    val bands = graft.ops.Dedup.lshBandKeys(sig, 16, 2)
    time("bands")(bands.count())
    time("bandCollisions") {
      bands.groupBy("band", "key").count().where(col("count") > 1)
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect()
        .headOption.map(r => if (r.isNullAt(0)) 0L else r.getDouble(0).toLong).getOrElse(0L)
    }
    time("lshPairs")(graft.ops.Dedup.lshCandidatePairs(docs).count())
    time("nearDups")(graft.ops.Dedup.nearDupPairs(docs, 0.3).count())
    spark.stop()
  }
}
