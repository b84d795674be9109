package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bloom

/** The Bloom membership sketch: the fixed-size broadcastable prefilter
  * behind [[graft.ops.Decontamination.contaminatedDocsBloom]]. */
class BloomSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val mBits = 1 << 16
  private val k = 5

  test("zero false negatives: every inserted key tests true") {
    val keys = (0L until 1000L).toDF("s")
    val bits = Bloom.buildBitset(keys, "s", mBits, k)
    val misses = keys.where(!Bloom.mightContain(col("s"), bits, k)).count()
    assert(misses === 0L, "a Bloom filter may never reject an inserted key")
  }

  test("false-positive rate on disjoint keys is small at the design load") {
    // 1000 keys in 2^16 bits ≈ 0.076 bits-per-key load → theoretical FP
    // ~ (1 - e^(-kn/m))^k ≈ 0.0002; assert an order of magnitude slack.
    val bits = Bloom.buildBitset((0L until 1000L).toDF("s"), "s", mBits, k)
    val fp = (100000L until 110000L).toDF("s")
      .where(Bloom.mightContain(col("s"), bits, k)).count()
    assert(fp < 100L, s"false-positive count $fp/10000 exceeds 1%")
  }

  test("duplicate keys are idempotent; empty build rejects everything") {
    val once = Bloom.buildBitset(Seq(7L).toDF("s"), "s", mBits, k)
    val thrice = Bloom.buildBitset(Seq(7L, 7L, 7L).toDF("s"), "s", mBits, k)
    assert(once.toSeq === thrice.toSeq)
    val empty = Bloom.buildBitset(Seq.empty[Long].toDF("s"), "s", mBits, k)
    assert(empty.forall(_ == 0L))
    val pass = (0L until 100L).toDF("s")
      .where(Bloom.mightContain(col("s"), empty, k)).count()
    assert(pass === 0L)
  }

  test("membership test is a codegen'd Filter, never a join") {
    val bits = Bloom.buildBitset((0L until 10L).toDF("s"), "s", mBits, k)
    // range, not a local Seq: ConvertToLocalRelation would fold the filter
    // into the LocalTableScan and leave nothing to assert on
    val probe = spark.range(100).select(col("id").as("s"))
      .where(Bloom.mightContain(col("s"), bits, k))
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("Filter") && p.contains("xxhash64"))
    assert(!p.toLowerCase.contains("join"))
    // `*(n)` prefixes are executedPlan.toString's whole-stage-codegen marker
    assert("""\*\(\d+\) Filter""".r.findFirstIn(p).isDefined,
      "the bit test must stay inside whole-stage codegen")
  }
}
