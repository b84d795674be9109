package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 5-way positional location split (`main_otodom.py:47-114`)
  * — its only operator that genuinely needs custom code (SURVEY.md §2.2 P8,
  * §2.10 U1).
  *
  * Semantics reproduced exactly (all rules from `main_otodom.py`):
  *  - null/empty input → all five fields null (`:49-56`);
  *  - parts = comma-split, each trimmed (`:57`); trailing empties survive
  *    (Python `str.split` keeps them);
  *  - voivodeship = last part, unconditionally (`:69`);
  *  - county: if the 2nd-from-last part is lowercase (Python `str.islower` —
  *    equal to its lowercase AND has at least one cased char) it is the
  *    county (`:71-74`);
  *  - city = 3rd-from-last when a county was found and n > 2, else
  *    2nd-from-last when n > 1 (`:76-83`) — note when a county is found but
  *    n == 2 the county string doubles as the city, faithfully mirrored;
  *  - street = first part starting with "ul." (`:85-90`);
  *  - district: if a street exists and is not the first part, the part just
  *    before it — unless that position is the city or the county (adjacency
  *    rule) or itself starts with "ul." (`:92-107`); without a street, the
  *    part just before the city (`:108-113`).
  *
  * Three surfaces, pinned together by LocationParseSpec:
  *  1. [[parse]] — pure Scala over the raw string (unit-testable sans Spark);
  *  2. [[parseLocationUdf]] — the reference-shaped API: one struct-returning
  *     UDF call, for users who want `parse_location(col)` verbatim;
  *  3. [[parseLocation]] — the hot-path form: a pure Column expression chain
  *     (split/element_at/when), fully whole-stage-codegen'd and replayable in
  *     DuckDB SQL, so the registered query gets exact oracle verification.
  *     Use this in pipelines; at 100 TB a UDF would break codegen fusion and
  *     serialize every row through a Scala call.
  */
object LocationParse {

  /** Parsed location; None ↔ SQL null. */
  final case class Loc(
      wojewodztwo: Option[String],
      powiat: Option[String],
      miasto: Option[String],
      dzielnica: Option[String],
      ulica: Option[String])

  private val Empty = Loc(None, None, None, None, None)

  /** Python `str.islower()` parity for the county rule: every cased char is
    * lowercase and at least one cased char exists. */
  private[engine] def isLowerPy(s: String): Boolean =
    s == s.toLowerCase && s != s.toUpperCase

  /** Pure-Scala core — the exact rule set of `main_otodom.py:47-114`. */
  def parse(location: String): Loc = {
    if (location == null || location.isEmpty) return Empty
    val parts = location.split(",", -1).map(_.trim)
    val n = parts.length

    val woj = Some(parts(n - 1))

    val powiatIdx: Option[Int] =
      if (n > 1 && isLowerPy(parts(n - 2))) Some(n - 2) else None
    val powiat = powiatIdx.map(parts)

    val miastoIdx: Option[Int] =
      if (powiatIdx.isDefined && n > 2) Some(n - 3)
      else if (n > 1) Some(n - 2)
      else None
    val miasto = miastoIdx.map(parts)

    val ulicaIdx: Option[Int] = {
      val i = parts.indexWhere(_.startsWith("ul."))
      if (i >= 0) Some(i) else None
    }
    val ulica = ulicaIdx.map(parts)

    val dzielnica: Option[String] = ulicaIdx match {
      case Some(ui) if ui > 0 =>
        val cand = parts(ui - 1)
        if (miastoIdx.contains(ui - 1) || powiatIdx.contains(ui - 1)) None
        else if (!cand.startsWith("ul.")) Some(cand)
        else None
      case Some(_) => None // street is the first part (`:94-96`)
      case None =>
        miastoIdx match {
          case Some(mi) if mi > 0 =>
            val cand = parts(mi - 1)
            if (!cand.startsWith("ul.")) Some(cand) else None
          case _ => None
        }
    }

    Loc(woj, powiat, miasto, dzielnica, ulica)
  }

  /** Reference-shaped API: `parse_location(col)` as one struct-returning UDF.
    * Prefer [[parseLocation]] in query plans (codegen); this exists for API
    * parity and as the cross-check surface in LocationParseSpec. */
  val parseLocationUdf = udf { (s: String) => parse(s) }

  /** Java `String.trim` parity (strips leading/trailing chars ≤ U+0020):
    * SQL `trim` strips ONLY spaces, which would diverge from the Scala
    * core/UDF on tab- or newline-padded parts. The DuckDB mirror is the
    * identical regex with the 'g' flag. */
  private def trimJ(c: Column): Column =
    regexp_replace(c, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")

  private def isLowerC(c: Column): Column = c === lower(c) && c =!= upper(c)

  // 1-based county index (n-1 ↔ Python's parts[-2]); the element_at is
  // `when`-guarded because SQL AND does not short-circuit (ANSI safety).
  private def pidxExpr(parts: Column, n: Column): Column =
    when(n > 1 && isLowerC(when(n > 1, element_at(parts, n - 1))), n - 1)

  // 1-based position of the first part starting with "ul."
  // (array_position yields 0 when absent → null via `when`)
  private def uidxExpr(parts: Column): Column = {
    val upos = array_position(
      transform(parts, p => p.startsWith("ul.")), lit(true))
    when(upos > 0, upos).cast("int")
  }

  private def midxExpr(pidx: Column, n: Column): Column =
    when(pidx.isNotNull && n > 2, n - 2).otherwise(when(n > 1, n - 1))

  /** The result struct from pre-built (loc, parts, n, pidx, uidx, midx)
    * columns — the ONE place the dzielnica adjacency rules and null guards
    * live; the single-Column and staged forms both delegate here. */
  private def resultStruct(loc: Column, parts: Column, n: Column,
                           pidx: Column, uidx: Column, midx: Column): Column = {
    def at(i: Column): Column = element_at(parts, i)
    val uCand = when(uidx > 1, at(uidx - 1))
    val mCand = when(midx > 1, at(midx - 1))
    val dzielnica =
      when(uidx.isNotNull,
        when(uidx === 1, lit(null).cast("string"))
          .otherwise(
            when(coalesce(midx === uidx - 1, lit(false)) ||
                 coalesce(pidx === uidx - 1, lit(false)),
                 lit(null).cast("string"))
              .otherwise(when(!startswith(uCand, lit("ul.")), uCand))))
        .otherwise(
          when(midx.isNotNull && midx > 1,
            when(!startswith(mCand, lit("ul.")), mCand)))
    when(loc.isNull || loc === "",
      struct(
        lit(null).cast("string").as("wojewodztwo"),
        lit(null).cast("string").as("powiat"),
        lit(null).cast("string").as("miasto"),
        lit(null).cast("string").as("dzielnica"),
        lit(null).cast("string").as("ulica")))
      .otherwise(struct(
        at(n).as("wojewodztwo"),
        element_at(parts, pidx).as("powiat"),
        element_at(parts, midx).as("miasto"),
        dzielnica.as("dzielnica"),
        element_at(parts, uidx).as("ulica")))
  }

  /** Codegen-friendly Column form: returns a struct
    * `{wojewodztwo, powiat, miasto, dzielnica, ulica}` of strings.
    *
    * Index arithmetic is 1-based (`element_at`) so the DuckDB oracle
    * (1-based lists) replays it verbatim. NOTE this form inlines `parts`
    * into every consumer — fine on a plain column, but for a computed `loc`
    * use [[withParsedLocation]] (linear tree). */
  def parseLocation(loc: Column): Column = {
    val parts = transform(split(loc, ","), p => trimJ(p))
    val n = size(parts)
    val pidx = pidxExpr(parts, n)
    resultStruct(loc, parts, n, pidx, uidxExpr(parts), midxExpr(pidx, n))
  }

  /** Staged frame form of [[parseLocation]] for pipelines: the parts array,
    * its length, and the three positional indices each materialize ONCE as
    * real columns — separate projection stages, exactly mirroring the
    * oracle's p/q/r CTE structure — so the expression tree stays linear.
    * The single-Column form inlines `parts` into every consumer, which on a
    * non-trivial `loc` expression multiplies the tree ~15× (measured ~1 s
    * of planning+eval overhead per query on the registered fixture).
    * CollapseProject keeps the stages apart: each intermediate is non-cheap
    * and multiply-referenced. Same rule set, same results, same guards
    * (`when`-wrapped element_at — SQL AND does not short-circuit). */
  def withParsedLocation(df: org.apache.spark.sql.DataFrame, loc: Column,
                         out: String): org.apache.spark.sql.DataFrame = {
    val P = "__lp_parts"; val N = "__lp_n"; val PI = "__lp_pidx"
    val UI = "__lp_uidx"; val MI = "__lp_midx"; val L = "__lp_loc"
    df.withColumn(L, loc)
      .withColumn(P, transform(split(col(L), ","), p => trimJ(p)))
      .withColumn(N, size(col(P)))
      .withColumn(PI, pidxExpr(col(P), col(N)))
      .withColumn(UI, uidxExpr(col(P)))
      .withColumn(MI, midxExpr(col(PI), col(N)))
      .withColumn(out,
        resultStruct(col(L), col(P), col(N), col(PI), col(UI), col(MI)))
      .drop(L, P, N, PI, UI, MI)
  }

  /** The identical rule set as a DuckDB SQL expression suite, parameterized
    * by the column holding the raw location string. Produces a query fragment
    * `SELECT <idCol>, wojewodztwo, powiat, miasto, dzielnica, ulica FROM ...`
    * given a source relation SQL exposing (<idCol>, loc). Used by the
    * registered oracle so the driver hash-verifies every branch. */
  def duckDbParseSql(srcSql: String, idCol: String): String =
    s"""WITH src AS ($srcSql),
       |p AS (SELECT $idCol, loc,
       |        list_transform(string_split(loc, ','),
       |          x -> regexp_replace(x, '^[\\x00-\\x20]+|[\\x00-\\x20]+$$', '', 'g')) AS parts
       |      FROM src),
       |q AS (SELECT $idCol, loc, parts, len(parts) AS n,
       |        CASE WHEN len(parts) > 1
       |              AND parts[len(parts)-1] = lower(parts[len(parts)-1])
       |              AND parts[len(parts)-1] <> upper(parts[len(parts)-1])
       |             THEN len(parts)-1 END AS pidx,
       |        CASE WHEN list_position(list_transform(parts, x -> starts_with(x, 'ul.')), true) > 0
       |             THEN list_position(list_transform(parts, x -> starts_with(x, 'ul.')), true) END AS uidx
       |      FROM p),
       |r AS (SELECT *,
       |        CASE WHEN pidx IS NOT NULL AND n > 2 THEN n-2
       |             WHEN n > 1 THEN n-1 END AS midx
       |      FROM q)
       |SELECT $idCol,
       |  CASE WHEN loc IS NULL OR loc = '' THEN NULL ELSE parts[n] END AS wojewodztwo,
       |  CASE WHEN loc IS NULL OR loc = '' THEN NULL ELSE parts[pidx] END AS powiat,
       |  CASE WHEN loc IS NULL OR loc = '' THEN NULL ELSE parts[midx] END AS miasto,
       |  CASE WHEN loc IS NULL OR loc = '' THEN NULL
       |       WHEN uidx IS NOT NULL THEN
       |         CASE WHEN uidx = 1 THEN NULL
       |              WHEN coalesce(midx = uidx-1, false) OR coalesce(pidx = uidx-1, false) THEN NULL
       |              WHEN NOT starts_with(parts[uidx-1], 'ul.') THEN parts[uidx-1]
       |              ELSE NULL END
       |       WHEN midx IS NOT NULL AND midx > 1 THEN
       |         CASE WHEN NOT starts_with(parts[midx-1], 'ul.') THEN parts[midx-1] ELSE NULL END
       |       ELSE NULL END AS dzielnica,
       |  CASE WHEN loc IS NULL OR loc = '' THEN NULL ELSE parts[uidx] END AS ulica
       |FROM r""".stripMargin
}
