package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operators.
  *
  * All pure Column chains (codegen'd, no UDFs). Word extraction and
  * shingling deliberately use only constructs with exact DuckDB equivalents
  * (`string_split_regex`, `list_transform`, 1-based `element_at`), so the
  * dedup oracles can replay the identical computation.
  */
object TextOps {

  /** Whitespace tokenization after lowercase+trim (matches DuckDB
    * `string_split_regex(lower(trim(x)), '\s+')`). */
  def words(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Null-safe [[words]]: NULL text tokenizes like '' → [''] — the ONE
    * shared definition of that convention (it must match the oracles'
    * `coalesce($expr, '')` in duckWordsOf; re-implementing the coalesce
    * at call sites invites the variants drifting apart). */
  def wordsSafe(c: Column): Column = words(coalesce(c, lit("")))

  /** Word n-gram shingles; `[]` when fewer than n words. 1-based
    * `element_at` keeps index arithmetic identical to DuckDB lists.
    * Indices are always in range, so this is ANSI-safe. */
  def shingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingle set from a PRE-MATERIALIZED words array.
    *
    * Documents with fewer than n words fall back to ONE whole-text shingle
    * (the space-joined word list) instead of an empty set — otherwise short
    * docs produce no signature rows and silently vanish from the LSH dedup
    * path (even byte-identical ones could never be flagged). DuckDB mirror:
    * `CASE WHEN len(w) >= n THEN ... ELSE [array_to_string(w, ' ')] END`.
    *
    * `w` MUST be a materialized column (its own projection), not the raw
    * `words(text)` expression: Catalyst does not eliminate common
    * subexpressions across a lambda boundary, so an inlined regex split
    * re-executes inside every `element_at` of the `transform` — O(words²)
    * per document (measured 24 s → 1 s on 5k docs at sf0.1). CollapseProject
    * keeps the two projections separate because the array is referenced many
    * times and `split` is not a cheap expression. */
  def shingleSetFromWords(w: Column, n: Int): Column =
    when(size(w) >= n, array_distinct(shingles(w, n)))
      .otherwise(array(concat_ws(" ", w)))

  /** 48-bit shingle id from the md5 hex prefix — the SAME base value the
    * MinHash family consumes (DuckDB mirror:
    * `('0x' || substr(md5(s), 1, 12))::BIGINT`). 48 bits fit a signed long
    * with headroom for the universal-hash multiply in [[Dedup]].
    *
    * KEY vs IDENTITY: this is the hash for shingle/bucket KEYS, where a
    * collision merely merges two shingles identically on both engines
    * (graceful, documented). Where the hash is a node IDENTITY — a
    * collision would merge unrelated dup clusters or graph nodes — use
    * [[nodeId64]]: at billions of items the 48-bit birthday bound
    * (n²/2⁴⁹) expects thousands of spurious merges, the 64-bit one
    * (n²/2⁶⁵) a handful at most (VERDICT r15 scale-margin note). */
  def shingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** 64-bit node IDENTITY from the full md5 upper half, signed two's
    * complement (`conv(hex, 16, -10)` interprets the 64-bit value as
    * signed, so the cast to long never overflows). DuckDB mirror:
    * `('0x' || substr(md5(s), 1, 16))::UBIGINT` — the oracle's ids are
    * the same 64 bits read unsigned, which partitions values identically
    * for every group/join use (ids are internal labels and never appear
    * in query output, so signedness cannot leak). */
  def nodeId64(s: Column): Column =
    conv(substring(md5(s), 1, 16), 16, -10).cast("long")

  /** The ONE splitmix64 finalizer (self-review: three private copies —
    * fixture generators, probe tools, the BPE content fingerprint — were
    * drifting surfaces for a constant typo no test would cross-check).
    * Plain JVM function: deterministic mixing for fixture formulas and
    * cache fingerprints, never a Column. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Distinct 48-bit shingle ids from a string shingle array. Dedup stores
    * and shuffles THESE, not the shingle strings: at corpus scale the
    * persisted/shuffled payload drops from ~tens of bytes per shingle to 8,
    * and the Jaccard refine intersects longs instead of strings. Collisions
    * (±2⁻⁴⁸ per pair) merge shingles identically on both engines — the
    * DuckDB oracles apply the same transform, so results stay hash-exact. */
  def hashedShingleSet(sh: Column): Column =
    array_distinct(transform(sh, shingleHash(_)))

  /** Jaccard similarity of two pre-distinct HASHED (long) arrays:
    * |a ∩ b| / |a ∪ b| (sizes only — element order never matters).
    *
    * r20 OPT: the intersection count runs through the native
    * [[graft.functions.IntersectCount64]] kernel, and the union size is
    * derived arithmetically (|a| + |b| − |a∩b| — exact for the
    * pre-distinct inputs this function has always contracted for)
    * instead of materializing `array_union`. Two boxed hash-set builds
    * and two throwaway arrays per pair become one primitive probe pass;
    * values are bit-identical (same integers into the same double
    * division — DedupSpec pins the family, every oracle replays
    * `len(list_intersect)/len(list_distinct(a||b))`). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.IntersectCount64.of(a, b)
    inter.cast("double") /
      greatest(size(a).cast("long") + size(b).cast("long") - inter, lit(1L))
        .cast("double")
  }
}
