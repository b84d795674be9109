package graft.tools

/** One-shot offline trainer for the IVF coarse quantizer (run via
  * `sbt "runMain graft.tools.TrainIvfCentroids [sfDir]"`; output is
  * committed).
  *
  * Runs [[graft.ops.Similarity.kMeansCentroids]] (seeded Lloyd's, spherical
  * assignment) over the verification-scale embeddings corpus and writes the
  * converged model to `fixtures/ivf_centroids.parquet`
  * (cell: int, centroid: array<double>). The registered `q_ann_ivf` query
  * and its DuckDB oracle both read this parquet, so cell assignment replays
  * bit-exactly on either engine — the fixture IS the "offline k-means job"
  * the production IVF design calls for, at test scale.
  *
  * Determinism: init is a `xxhash64(vec_id, seed)`-ordered sample (no RNG
  * state); the per-dim mean update uses Spark's partial-aggregated `avg`,
  * whose float-sum ordering is partition-dependent in the last bits — which
  * is why the model is committed rather than retrained per run: every
  * verified path consumes the frozen artifact, and bit-drift on retrain
  * cannot silently change query results.
  */
object TrainIvfCentroids {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // round 8: optional k + output path, so the corpus-scaled SemDeDup
    // quantizer (k=256 at the bench SF) trains with the same job as the
    // ANN coarse quantizer (k=16) without disturbing the frozen original
    val k = args.lift(1).map(_.toInt).getOrElse(16)
    val out = args.lift(2).getOrElse("fixtures/ivf_centroids.parquet")
    val spark = graft.engine.Sessions.local("8", "graft-train-ivf")
    val cent = graft.ops.Similarity.kMeansCentroids(
      graft.engine.Tables.embeddings(spark, sfDir), k = k, iters = 10, seed = 42L)
    cent.coalesce(1).write.mode("overwrite").parquet(out)
    println(s"trained ${cent.count()} centroids from $sfDir -> $out")
    spark.stop()
  }
}
