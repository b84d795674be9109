package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** The distributed components path on REAL fixture data (VERDICT r9 #4):
  * every fixture SF stays under the 100k-edge small-graph threshold, so the
  * registered q_dedup_components always resolves via driver union-find and
  * the pointer-jumping loop — the path that matters at 100 TB — was only
  * exercised by synthetic unit graphs. This spec runs BOTH paths end-to-end
  * on the fixture-derived near-dup pair set and asserts byte-identical
  * labelings, then does it again on a ~64×-amplified pair set large enough
  * to exercise multi-round jumping across partitions. */
class ComponentsScaleStressSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def fixturePairs() = {
    val docs = graft.engine.Tables.documents(spark, d)
    val (sets, bands) = graft.ops.Indexes.ensureMinhashIndex(spark, docs, d)
    graft.ops.Indexes.minhashNearDupsIndexed(spark, sets, bands, threshold = 0.3)
      .select(col("doc_a"), col("doc_b"))
  }

  private def labels(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("doc_id").cast("long"), col("rep").cast("long"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted

  test("distributed pointer-jumping matches driver union-find on the real fixture pairs") {
    val pairs = fixturePairs()
    val viaDriver = labels(Dedup.connectedComponents(pairs))
    // localEdgeThreshold = 0 forces the RDD loop regardless of edge count.
    val viaDistributed = labels(
      Dedup.connectedComponents(pairs, localEdgeThreshold = 0L))
    assert(viaDriver.nonEmpty, "fixture produced no near-dup pairs")
    assert(viaDistributed == viaDriver,
      "distributed pointer-jumping diverged from the driver union-find fixpoint")
  }

  test("both paths agree on a 64x-amplified fixture graph (multi-round jumping)") {
    // Amplify the REAL pair set: 64 disjoint id-shifted copies of the
    // fixture graph, PLUS a chain edge linking copy k's minimum vertex to
    // copy k+1's — one giant elongated component spanning every copy, the
    // worst case for label propagation (diameter ≈ 64 × fixture diameter),
    // so the loop genuinely runs multiple pointer-jumping rounds.
    val base = fixturePairs()
    val minId = base.agg(min(least(col("doc_a"), col("doc_b")))).head().getLong(0)
    val span = lit(1000000L)
    val copies = spark.range(64).crossJoin(base)
      .select((col("doc_a") + col("id") * span).as("doc_a"),
              (col("doc_b") + col("id") * span).as("doc_b"))
    val chain = spark.range(63)
      .select((lit(minId) + col("id") * span).as("doc_a"),
              (lit(minId) + (col("id") + 1) * span).as("doc_b"))
    val amplified = copies.unionByName(chain)

    val viaDriver = labels(Dedup.connectedComponents(amplified))
    val viaDistributed = labels(
      Dedup.connectedComponents(amplified, localEdgeThreshold = 0L))
    assert(viaDistributed == viaDriver,
      "distributed path diverged from driver union-find on the amplified graph")
    // The chain collapsed every copy of minId's component onto ONE rep.
    val chainReps = viaDistributed.filter { case (id, _) =>
      (id - minId) % 1000000L == 0 && id >= minId
    }.map(_._2).distinct
    assert(chainReps == Seq(minId),
      s"expected the cross-copy chain to share rep $minId, got $chainReps")
  }

  test("reliable-checkpoint mode matches and keeps only final-round files") {
    // The cluster fault-tolerance mode (checkpointDir set) documented in the
    // connectedComponents scaladoc, exercised on real fixture pairs for the
    // first time: it must always take the distributed loop, produce the same
    // fixpoint, and reclaim every superseded round's checkpoint files —
    // only the final labels round (which serves the returned frame) and the
    // still-referenced edge materialization may remain on disk.
    val pairs = fixturePairs()
    val ckpt = java.nio.file.Files.createTempDirectory("cc-reliable").toString
    val viaReliable = labels(
      Dedup.connectedComponents(pairs, checkpointDir = Some(ckpt)))
    val viaDriver = labels(Dedup.connectedComponents(pairs))
    assert(viaReliable == viaDriver,
      "reliable-checkpoint mode diverged from the driver union-find fixpoint")

    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString.startsWith("rdd-"))
      .filter(p => java.nio.file.Files.isDirectory(p))
      .count()
    assert(rddDirs >= 1, "the final round's checkpoint files must remain " +
      "(the returned frame is served from them)")
    assert(rddDirs <= 2,
      s"superseded rounds' checkpoint files were not reclaimed: $rddDirs " +
        "rdd-* dirs remain (expected only the final labels round, plus at " +
        "most the released edge RDD's dir if deletion is async)")
  }
}
