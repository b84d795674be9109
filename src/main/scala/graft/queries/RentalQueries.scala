package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{LocationParse, Tables}

/** The reference's rental-ingest/clean pipeline operators as driver-contract
  * queries (SURVEY.md §2.2 P8-P12, §3 E1/E2).
  *
  * Location strings are synthesized deterministically from `customer` rows —
  * ten variants, one per branch family of `main_otodom.py:47-114` — with the
  * IDENTICAL construction in the DuckDB oracle, so the parser itself is what
  * the hash compare exercises.
  */
object RentalQueries {
  import Tables._

  /** Deterministic location-string variants (Spark side). Must stay textually
    * in sync with [[locationSrcSql]]. */
  private def locExpr(ck: Column, seg: Column): Column = {
    val v = ck % 10
    when(v === 0, concat(seg, lit(", małopolskie")))
      .when(v === 1, concat(lit("Wola, "), seg, lit(", mazowieckie")))
      .when(v === 2, concat(lit("ul. Krótka, "), seg, lit(", pomorskie")))
      .when(v === 3, concat(lit("Ursynów, ul. Cicha "), (ck % 20).cast("string"),
        lit(", "), seg, lit(", śląskie")))
      .when(v === 4, concat(seg, lit(", powiat krakowski, małopolskie")))
      .when(v === 5, lit("śląskie"))
      .when(v === 6, lit(""))
      .when(v === 7, concat(seg, lit(", Centrum, ul. cicha, mazowieckie")))
      .when(v === 8, concat(lit("Centrum, "), seg, lit(", powiat poznański, ul. polna")))
      .otherwise(concat(lit("ul. Długa "), (ck % 20).cast("string"),
        lit(", Stare Miasto, "), seg, lit(", małopolskie")))
  }

  /** The identical variant construction for the oracle. */
  private val locationSrcSql: String =
    """SELECT c_custkey AS id,
      |  CASE c_custkey % 10
      |    WHEN 0 THEN c_mktsegment || ', małopolskie'
      |    WHEN 1 THEN 'Wola, ' || c_mktsegment || ', mazowieckie'
      |    WHEN 2 THEN 'ul. Krótka, ' || c_mktsegment || ', pomorskie'
      |    WHEN 3 THEN 'Ursynów, ul. Cicha ' || (c_custkey % 20)::VARCHAR || ', ' || c_mktsegment || ', śląskie'
      |    WHEN 4 THEN c_mktsegment || ', powiat krakowski, małopolskie'
      |    WHEN 5 THEN 'śląskie'
      |    WHEN 6 THEN ''
      |    WHEN 7 THEN c_mktsegment || ', Centrum, ul. cicha, mazowieckie'
      |    WHEN 8 THEN 'Centrum, ' || c_mktsegment || ', powiat poznański, ul. polna'
      |    ELSE 'ul. Długa ' || (c_custkey % 20)::VARCHAR || ', Stare Miasto, ' || c_mktsegment || ', małopolskie'
      |  END AS loc
      |FROM customer WHERE c_custkey <= 400""".stripMargin

  /** P8/U1 — the 5-way location split over all ten branch families.
    * The parse is the codegen Column form ([[LocationParse.parseLocation]]):
    * pure expression chain, no UDF, so at 100 TB it fuses into the scan
    * stage's whole-stage-codegen and shuffles nothing. */
  def locationParse(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .where(col("c_custkey") <= 400)
      .select(col("c_custkey").as("id"),
        LocationParse.parseLocation(
          locExpr(col("c_custkey"), col("c_mktsegment"))).as("r"))
      .select(col("id"), col("r.wojewodztwo").as("wojewodztwo"),
        col("r.powiat").as("powiat"), col("r.miasto").as("miasto"),
        col("r.dzielnica").as("dzielnica"), col("r.ulica").as("ulica"))
      .orderBy(col("id"))

  val locationParseSql: String =
    LocationParse.duckDbParseSql(locationSrcSql, "id") + "\nORDER BY id"
}
