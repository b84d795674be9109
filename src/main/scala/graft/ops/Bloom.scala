package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter as a pure expression surface — the fixed-size
  * broadcastable membership sketch a 100 TB decontamination / blocklist /
  * join-prefilter pass needs when the probe set's raw keys are too large to
  * broadcast: the bitset is a few hundred KB REGARDLESS of key count, the
  * membership test is k codegen'd hash+bit-test expressions (no UDF, no
  * join), and false positives are resolved by a later exact confirm join
  * over the (tiny) surviving candidates — so the composed operator is
  * exact while the full corpus scan stays join-free.
  *
  * Everything is deterministic: positions come from `xxhash64(seed, key)`
  * (Spark's codegen'd XXH64 — stable across sessions/partitionings), the
  * build is a commutative bitwise-OR aggregate, and the membership column
  * is a pure function of (key, bitset literal). No engine-portability
  * burden: consumers pair the filter with an exact confirm join, so the
  * DuckDB oracle never needs to replay the hash family.
  */
object Bloom {

  /** Bitset + its build-time hash count, bundled so probe parameters can
    * never drift from build parameters: a `mightContain` probed with a k
    * larger than the build k silently yields false negatives, defeating
    * the zero-false-negative contract the decontamination composition
    * relies on. Prefer [[buildSketch]] + [[BloomSketch.mightContain]];
    * the raw (bits, k) overloads remain for tests and for callers that
    * serialize the two parts separately — those callers own the invariant. */
  final case class BloomSketch(bits: Array[Long], k: Int) {
    def mightContain(key: Column): Column = Bloom.mightContain(key, bits, k)
  }

  /** [[buildBitset]] with the hash count captured alongside the bits. */
  def buildSketch(keys: DataFrame, keyCol: String, mBits: Int, k: Int): BloomSketch =
    BloomSketch(buildBitset(keys, keyCol, mBits, k), k)

  /** The k bit positions of `key` in an `mBits`-bit filter: position_i =
    * xxhash64(i, key) mod mBits (pmod — xxhash64 is signed). */
  def bitPositions(key: Column, mBits: Int, k: Int): Seq[Column] = {
    require(k >= 1 && k <= 16, s"bloom hash count k must be in [1, 16], got $k")
    require(mBits >= 64, s"bloom bitset needs at least one word, got $mBits bits")
    (0 until k).map(i => pmod(xxhash64(lit(i), key), lit(mBits.toLong)))
  }

  /** Build the bitset DISTRIBUTED: explode each key's k positions, fold
    * into 64-bit words with a map-side-combined `bit_or` aggregate (the
    * shuffle carries at most mBits/64 rows of (word_idx, word) — never the
    * keys), and collect the ≤ mBits/64 non-zero words. Duplicate keys are
    * free (OR is idempotent), so callers need not pre-distinct. */
  def buildBitset(keys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val p = keys.select(explode(array(bitPositions(col(keyCol), mBits, k): _*)).as("p"))
    val words = p
      .select(shiftright(col("p"), 6).cast("int").as("wi"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int")).as("b"))
      .groupBy(col("wi")).agg(bit_or(col("b")).as("w"))
      .collect()
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** Membership-test column against a literal-embedded bitset: true iff all
    * k bits are set (i.e. `key` MAY be in the build set; definitely-absent
    * keys always test false — zero false negatives). The bitset rides the
    * plan as one array literal, so the test is a plain codegen'd Filter
    * that pushes below joins and survives whole-stage codegen.
    *
    * INVARIANT: `k` must equal the k the bitset was BUILT with — probing
    * with a larger k tests bits that were never set and produces false
    * negatives; a smaller k only loosens the filter. Use [[BloomSketch]]
    * to carry the pair together. */
  def mightContain(key: Column, bits: Array[Long], k: Int): Column = {
    val arr = typedlit(bits.toSeq)
    bitPositions(key, bits.length * 64, k).map { p =>
      element_at(arr, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
  }
}
