package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The reference's string-to-number coercion semantics as pure, codegen'd
  * Column expression chains — no UDFs, so whole-stage codegen and constant
  * folding stay intact and the expressions can sit directly above a parquet
  * scan without breaking pushdown of sibling predicates.
  *
  * Reference semantics reproduced (see SURVEY.md §2.2):
  *  - `to_number` (`analytics_otodom.py:22-29`) / `parse_price`
  *    (`test.py:15-19`): strip everything but `[0-9,.-]`, `,`→`.`, float,
  *    null (never an error) on junk — hence `try_cast`, which also keeps the
  *    chain safe under Spark 4's ANSI-on default.
  *  - room count (`analytics_otodom.py:45-46`): first `(\d+)` capture, float;
  *    pandas `str.extract` yields NaN on no-match while Spark
  *    `regexp_extract` yields `""` — the `nullif` guard restores parity.
  *  - area (`main_otodom.py:174-176`): first `[\d,.]+` run, `,`→`.`, float.
  *  - integer fee (`main_otodom.py:185-191`): first `\d+` run as long.
  *  - timestamp (`analytics_otodom.py:49`): `errors="coerce"` → `try_to_timestamp`.
  */
object Parse {

  private def nullIfEmpty(c: Column): Column =
    when(c === "", lit(null)).otherwise(c)

  /** "3 200 zł" → 3200.0; "1 500,50 zł" → 1500.5; "brak informacji" → null. */
  def parseMoney(c: Column): Column = {
    val stripped = regexp_replace(c, "[^0-9,.\\-]", "")
    val dotted   = regexp_replace(stripped, ",", ".")
    nullIfEmpty(dotted).try_cast(DoubleType)
  }

  /** "3 pokoje" → 3.0; "Kawalerka" → null. */
  def parseRooms(c: Column): Column =
    nullIfEmpty(regexp_extract(c, "(\\d+)", 1)).try_cast(DoubleType)

  /** "27,4 m²" → 27.4. */
  def parseArea(c: Column): Column = {
    val m = regexp_extract(c, "([0-9][0-9,\\.]*)", 1)
    nullIfEmpty(regexp_replace(m, ",", ".")).try_cast(DoubleType)
  }

  /** "czynsz: 500 zł" → 500L (integer fee parse, `main_otodom.py:185-191`). */
  def parseFee(c: Column): Column =
    nullIfEmpty(regexp_extract(c, "(\\d+)", 1)).try_cast(LongType)

  /** "2025-06-14 12:00:00" → timestamp; malformed → null. */
  def parseTimestamp(c: Column): Column =
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss"))

  /** Python `str.capitalize()` parity: first char upper, REST lower —
    * `initcap` would capitalize every word (wrong for "Kujawsko-pomorskie").
    * Used by the geo name normalization (`analytics_otodom.py:178-183`). */
  def capitalizeFirst(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(
      concat(upper(substring(c, 1, 1)), lower(substring(c, 2, Int.MaxValue))))
}
