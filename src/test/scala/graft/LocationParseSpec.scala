package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.LocationParse
import graft.engine.LocationParse.Loc

/** Table-driven branch tests for the 5-way location split — one vector per
  * branch of `main_otodom.py:47-114` (FIXTURES.md §2) — plus a seeded
  * random-combination sweep pinning the codegen Column form and the UDF form
  * to the Scala core. */
class LocationParseSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def L(w: String = null, p: String = null, m: String = null,
                d: String = null, u: String = null): Loc =
    Loc(Option(w), Option(p), Option(m), Option(d), Option(u))

  // (input, expected) — expectations hand-derived from the reference rules
  private val vectors: Seq[(String, Loc)] = Seq(
    // street-first: district stays null (`main_otodom.py:94-96`)
    "ul. Długa, Stare Miasto, Kraków, małopolskie" ->
      L(w = "małopolskie", m = "Kraków", u = "ul. Długa"),
    "ul. Prosta, Warszawa, mazowieckie" ->
      L(w = "mazowieckie", m = "Warszawa", u = "ul. Prosta"),
    // district, no street (`:108-113`)
    "Wola, Warszawa, mazowieckie" ->
      L(w = "mazowieckie", m = "Warszawa", d = "Wola"),
    // lowercase county branch (`:71-74`); miastoIdx==0 so no district
    "Gdańsk, pomorski, pomorskie" ->
      L(w = "pomorskie", p = "pomorski", m = "Gdańsk"),
    // voivodeship only
    "mazowieckie" -> L(w = "mazowieckie"),
    // empty / null → all null (`:49-56`)
    "" -> L(),
    (null: String) -> L(),
    // district before a non-first street (`:97-107` happy path)
    "Ursynów, ul. Cicha 5, WARSZAWA, śląskie" ->
      L(w = "śląskie", m = "WARSZAWA", d = "Ursynów", u = "ul. Cicha 5"),
    // street that is ALSO the lowercase county: adjacency rule nulls the
    // district because the part before the street is the city (`:100-102`)
    "BUILDING, Centrum, ul. cicha, mazowieckie" ->
      L(w = "mazowieckie", p = "ul. cicha", m = "Centrum", u = "ul. cicha"),
    // street in last position (= voivodeship) with county just before it:
    // adjacency rule nulls the district via powiat_idx (`:100-102`)
    "Centrum, BUILDING, powiat poznański, ul. polna" ->
      L(w = "ul. polna", p = "powiat poznański", m = "BUILDING", u = "ul. polna"),
    // county found with n==2: the county string doubles as the city (`:76-83`)
    "a, b" -> L(w = "b", p = "a", m = "a"),
    // bare comma: empty strings survive as values, islower('')==false
    "," -> L(w = "", m = ""),
    // tab/newline padding: Java-trim parity across all surfaces (the SQL
    // forms use a [\x00-\x20] regex, not space-only SQL trim)
    "Wola,\tWARSZAWA,\nmazowieckie " ->
      L(w = "mazowieckie", m = "WARSZAWA", d = "Wola")
  )

  test("Scala core: every branch of main_otodom.py:47-114") {
    vectors.foreach { case (in, want) =>
      assert(LocationParse.parse(in) === want, s"input=<$in>")
    }
  }

  private def viaSpark(inputs: Seq[String], expr: org.apache.spark.sql.Column): Seq[Loc] =
    inputs.toDF("loc").select(expr.as("r"))
      .select("r.wojewodztwo", "r.powiat", "r.miasto", "r.dzielnica", "r.ulica")
      .as[(Option[String], Option[String], Option[String], Option[String], Option[String])]
      .collect().toSeq.map(t => Loc(t._1, t._2, t._3, t._4, t._5))

  test("Column expression form matches the Scala core on all vectors") {
    val got = viaSpark(vectors.map(_._1), LocationParse.parseLocation(col("loc")))
    assert(got === vectors.map(v => LocationParse.parse(v._1)))
  }

  test("UDF form matches the Scala core on all vectors") {
    val got = viaSpark(vectors.map(_._1), LocationParse.parseLocationUdf(col("loc")))
    assert(got === vectors.map(v => LocationParse.parse(v._1)))
  }

  test("sweep: expression == core == UDF on 400 seeded random part lists") {
    val pool = Vector("Kraków", "WARSZAWA", "Wola", "powiat poznański",
      "mazowieckie", "ul. Cicha", "ul. polna", "", " x ", "Stare Miasto",
      "b123", "śląskie", "ul.x", "UL. Duża", "dolny śląsk")
    val rnd = new scala.util.Random(7L)
    val inputs = Vector.fill(400) {
      val n = rnd.nextInt(7)
      Vector.fill(n)(pool(rnd.nextInt(pool.size))).mkString(",")
    }
    val core = inputs.map(LocationParse.parse)
    assert(viaSpark(inputs, LocationParse.parseLocation(col("loc"))) === core)
    assert(viaSpark(inputs, LocationParse.parseLocationUdf(col("loc"))) === core)
    assert(viaStagedFrame(inputs) === core)
  }

  private def viaStagedFrame(inputs: Seq[String]): Seq[Loc] =
    LocationParse.withParsedLocation(inputs.toDF("loc"), col("loc"), "r")
      .select("r.wojewodztwo", "r.powiat", "r.miasto", "r.dzielnica", "r.ulica")
      .as[(Option[String], Option[String], Option[String], Option[String], Option[String])]
      .collect().toSeq.map(t => Loc(t._1, t._2, t._3, t._4, t._5))

  test("staged frame form matches the Scala core on all vectors") {
    assert(viaStagedFrame(vectors.map(_._1)) ===
      vectors.map(v => LocationParse.parse(v._1)))
  }
}
