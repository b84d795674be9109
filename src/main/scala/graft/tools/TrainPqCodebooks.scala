package graft.tools

/** One-shot offline trainer for the PQ subquantizer codebooks (run via
  * `sbt "runMain graft.tools.TrainPqCodebooks [sfDir]"`; output is
  * committed). Same determinism rationale as [[TrainIvfCentroids]]: the
  * committed parquet is the frozen model every verified path consumes —
  * a bit-drifting retrain cannot silently change query results. */
object TrainPqCodebooks {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.engine.Sessions.local("8", "graft-train-pq")
    val cb = graft.ops.Similarity.pqCodebooks(
      graft.engine.Tables.embeddings(spark, sfDir),
      nSub = 8, k = 16, dim = 64, iters = 10, seed = 42L)
    cb.coalesce(1).write.mode("overwrite").parquet("fixtures/pq_codebooks.parquet")
    println(s"trained ${cb.count()} subspace codes from $sfDir")
    spark.stop()
  }
}
