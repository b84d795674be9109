package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the Verify failure path (VERDICT r9 #2): the `_FAILED`
  * marker + `errors.json` mechanism rescued round 8's invisible breakage —
  * a broken query that writes nothing must never again masquerade as absent-
  * but-fine. This spec runs the REAL dump loop (Verify.dumpAll) over a mix of
  * working and deliberately-throwing queries and asserts every visible
  * artifact the driver relies on. */
class VerifyFailurePathSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def tmpDir(): String =
    Files.createTempDirectory("verify-failure-spec").toString

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => { import s.implicits._; Seq((1, "a"), (2, "b")).toDF("id", "v") }

  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("deliberate spec failure")

  // Fails at EXECUTION (analysis passes; the write triggers it) — the round-8
  // breakage class: plans built fine, the action died.
  private val lateBoom: (SparkSession, String) => DataFrame =
    (s, _) => {
      import s.implicits._
      Seq(1, 2).toDF("n").selectExpr(
        "if(n > 0, raise_error('deliberate exec-time failure'), 'x') as v")
    }

  test("a throwing query leaves _FAILED + errors.json; survivors still dump") {
    val out = tmpDir()
    val failures = Verify.dumpAll(spark, "unused-sf-dir", out, Seq(
      "q_ok"        -> good,
      "q_broken"    -> boom,
      "q_exec_dead" -> lateBoom))

    assert(failures.keySet == Set("q_broken", "q_exec_dead"))

    // The survivor's parquet dump is intact and readable.
    val okRows = spark.read.parquet(s"$out/q_ok").count()
    assert(okRows == 2)
    assert(!Files.exists(Paths.get(s"$out/q_ok/_FAILED")))

    // Each broken query left a _FAILED marker carrying the error message.
    val brokenMarker = Files.readString(Paths.get(s"$out/q_broken/_FAILED"))
    assert(brokenMarker.contains("deliberate spec failure"))
    val execMarker = Files.readString(Paths.get(s"$out/q_exec_dead/_FAILED"))
    assert(execMarker.contains("deliberate exec-time failure"))

    // errors.json names both failures (valid JSON object with both keys).
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errJson.contains("\"q_broken\""))
    assert(errJson.contains("\"q_exec_dead\""))
    assert(errJson.contains("deliberate spec failure"))
  }

  test("all-green run writes an empty errors.json and no markers") {
    val out = tmpDir()
    val failures = Verify.dumpAll(spark, "unused-sf-dir", out, Seq("q_ok" -> good))
    assert(failures.isEmpty)
    assert(Files.readString(Paths.get(s"$out/errors.json")) == "{}")
    assert(!Files.exists(Paths.get(s"$out/q_ok/_FAILED")))
  }

  test("error messages with quotes/newlines stay valid JSON") {
    val out = tmpDir()
    val nasty: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("line1\nline2 \"quoted\"\ttab")
    Verify.dumpAll(spark, "unused-sf-dir", out, Seq("q_nasty" -> nasty))
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    // Raw control characters must not survive into the JSON document.
    assert(!errJson.exists(c => c == '\n' || c == '\t' || c == '\r'))
    assert(errJson.contains("\\n") && errJson.contains("\\\"") && errJson.contains("\\t"))
  }
}
