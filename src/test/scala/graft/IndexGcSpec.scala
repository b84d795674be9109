package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Indexes

/** The index-generation GC (Indexes.gcSiblings) had a purpose-built test
  * hook (`gcGraceMs`) but no spec driving it — the mark-then-sweep contract
  * was documentation only. Asserted here on a throwaway index root tag:
  * a superseded generation and an orphaned crashed-build tmp dir older than
  * the grace period are reclaimed by the next successful build; a
  * generation inside the grace window survives (another session may be
  * mid-read on it). */
class IndexGcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeCorpus(dir: String, shift: Int): org.apache.spark.sql.DataFrame = {
    (0 until 32).map(i =>
        (i.toLong, Array.tabulate(8)(k => (i * 31 + k + shift).toFloat)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("aged superseded generations and orphan tmp dirs are swept; fresh ones survive") {
    val base = Files.createTempDirectory("idxgc").toString
    val sfTag = s"$base/corpus" // distinct tag isolates this test's index subdir
    val p1 = Indexes.ensureLshIndex(spark, writeCorpus(s"$base/data", 0),
      sfTag, bBits = 3, lTables = 2, dim = 8, partitionByBucket = false)
    assert(Files.exists(Paths.get(p1, "_SUCCESS")))

    // An orphaned tmp dir, as a crashed build would leave behind.
    val parent = Paths.get(p1).getParent
    val orphan = parent.resolve("lsh_b3_L2_s42_flat_deadbeef.tmp-123")
    Files.createDirectories(orphan)
    // Age both past the grace period.
    val old = FileTime.fromMillis(System.currentTimeMillis() - 3600 * 1000L)
    Files.setLastModifiedTime(Paths.get(p1), old)
    Files.setLastModifiedTime(orphan, old)

    // withGcGrace scopes the forced grace to THIS thread's sweeps only
    // (ADVICE r10: the old global-var hook could reclaim a generation a
    // concurrently-running suite was still reading).
    // New corpus content at the same path → new fingerprint → rebuild+sweep.
    val p2 = Indexes.withGcGrace(1000L) {
      Indexes.ensureLshIndex(spark, writeCorpus(s"$base/data", 7),
        sfTag, bBits = 3, lTables = 2, dim = 8, partitionByBucket = false)
    }
    assert(p2 != p1, "new corpus content must rotate the index path")
    assert(!Files.exists(Paths.get(p1)),
      "aged superseded generation must be reclaimed by the sweep")
    assert(!Files.exists(orphan),
      "orphaned crashed-build tmp dir must be reclaimed by the sweep")
    assert(Files.exists(Paths.get(p2, "_SUCCESS")))

    // A generation still inside the grace window must survive the sweep.
    val p3 = Indexes.withGcGrace(Long.MaxValue) {
      Indexes.ensureLshIndex(spark, writeCorpus(s"$base/data", 13),
        sfTag, bBits = 3, lTables = 2, dim = 8, partitionByBucket = false)
    }
    assert(p3 != p2)
    assert(Files.exists(Paths.get(p2)),
      "generation inside the grace window must survive (in-flight readers)")
  }
}
