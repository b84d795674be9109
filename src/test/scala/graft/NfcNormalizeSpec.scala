package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NfcNormalize

/** The Unicode-canonicalization cases the ASCII fixture can't exercise:
  * composed vs decomposed accents must collapse to one fingerprint, and
  * the expression must agree with DuckDB's nfc_normalize semantics (the
  * registered q_unicode_fingerprints row proves engine parity on the real
  * corpus; these literals prove the SEMANTICS). */
class NfcNormalizeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val composed = "caf\u00e9"
  private val decomposed = "cafe\u0301"

  test("composed == decomposed after NFC; fingerprints collide") {
    val df = Seq((1, composed), (2, decomposed), (3, "plain ascii"))
      .toDF("i", "t")
      .select(col("i"), NfcNormalize(col("t")).as("n"),
        md5(NfcNormalize(col("t"))).as("fp"))
    val rows = df.collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1)._1 === rows(2)._1, "NFC must unify the two encodings")
    assert(rows(1)._2 === rows(2)._2, "fingerprints must collide after NFC")
    assert(rows(3)._1 === "plain ascii", "ASCII passes through untouched")
    // without normalization the raw strings differ — the defect NFC fixes
    assert(composed !== decomposed)
  }

  test("SQL registry twin (graft_nfc) and null handling") {
    Seq((1, Some(decomposed)), (2, None: Option[String]))
      .toDF("i", "t").createOrReplaceTempView("nfc_v")
    val got = spark.sql("SELECT i, graft_nfc(t) AS n FROM nfc_v")
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(got(1).contains(composed))
    assert(got(2).isEmpty, "null propagates")
  }

  test("already-normalized fast path returns the input unchanged") {
    // whole-stage codegen path: run through a real projection over a range
    val n = spark.range(100)
      .select(NfcNormalize(concat(lit("doc "), col("id"))).as("n"))
      .where(col("n").startsWith("doc ")).count()
    assert(n === 100L)
  }
}
