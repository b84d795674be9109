package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Parse

/** Edge cases from FIXTURES.md §2 / reference `analytics_otodom.py:22-29`,
  * `test.py:15-19`, `main_otodom.py:174-191`. */
class ParseSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def runD(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                   in: Seq[String]): Seq[Option[Double]] =
    in.toDF("x").select(f(col("x")).as("y")).as[Option[Double]].collect().toSeq

  test("parseMoney: reference to_number semantics") {
    val got = runD(Parse.parseMoney,
      Seq("3 200 zł", "1 500,50 zł", "brak informacji", "", "2,5", "-42 zł",
        "1.500,50", "zł", null))
    assert(got === Seq(Some(3200.0), Some(1500.5), None, None, Some(2.5),
      Some(-42.0), None /* "1.500.50" fails float() in pandas too */, None, None))
  }

  test("parseRooms: digit capture, null on no-match (pandas NaN parity)") {
    val got = runD(Parse.parseRooms, Seq("3", "3 pokoje", "Kawalerka", "", null, "10+"))
    assert(got === Seq(Some(3.0), Some(3.0), None, None, None, Some(10.0)))
  }

  test("parseArea: first numeric run with comma decimals") {
    val got = runD(Parse.parseArea, Seq("27.4 m²", "27,4 m²", "brak informacji", "100"))
    assert(got === Seq(Some(27.4), Some(27.4), None, Some(100.0)))
  }

  test("parseFee: integer fee digits") {
    val got = Seq("czynsz: 500 zł", "brak informacji")
      .toDF("x").select(Parse.parseFee(col("x")).as("y"))
      .as[Option[Long]].collect().toSeq
    assert(got === Seq(Some(500L), None))
  }

  test("parseTimestamp: coerce to null on malformed") {
    val got = Seq("2025-06-14 12:00:00", "junk", "")
      .toDF("x").select(Parse.parseTimestamp(col("x")).as("y"))
      .select(col("y").cast("string")).as[Option[String]].collect().toSeq
    assert(got === Seq(Some("2025-06-14 12:00:00"), None, None))
  }

  test("capitalizeFirst: Python str.capitalize parity (not initcap)") {
    val got = Seq("kujawsko-POMORSKIE", "śląskie", "")
      .toDF("x").select(Parse.capitalizeFirst(col("x")).as("y"))
      .as[String].collect().toSeq
    assert(got === Seq("Kujawsko-pomorskie", "Śląskie", ""))
  }
}
