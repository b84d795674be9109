package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * At 100 TB the cheapest predicate is the one that never reads the file:
  * columnar scans skip whole files/row-groups whose footer min/max stats
  * exclude the predicate range. Sorting by ONE column makes only that
  * column's stats selective; interleaving the bits of SEVERAL columns'
  * normalized ranks gives every participating dimension a bounded span
  * within any contiguous z-range, so a file written from a z-sorted range
  * carries a tight bounding box on ALL of them — multi-dimensional file
  * skipping from ordinary min/max stats (the technique behind
  * OPTIMIZE ... ZORDER BY in lakehouse engines).
  *
  * Guarantee being traded on: fixing the top `p` bits of a z-value fixes
  * the top `p / n_dims` bits of every dimension's normalized rank, so a
  * bucket of 2^(n*bits - p) consecutive z-values spans at most
  * range / 2^(p/n) of each raw dimension (plus normalization rounding).
  * [[graft.queries.PipelineQueries.zorderLocality]] measures exactly this
  * and its oracle replays the bit math; LayoutSpec additionally writes a
  * z-ordered file tree and checks per-FILE bounding boxes against a
  * single-column sort's.
  *
  * Everything here is a pure `Column` expression (codegen'd, shuffle-free);
  * the only wide operation is the optional `repartitionByRange` in
  * [[writeZordered]] — a range shuffle on the z-value, which doubles as
  * skew balancing (range boundaries come from sampling the z distribution,
  * so hot key regions split across files instead of piling into one). */
object Layout {

  /** `(c - lo) * ((1 << bits) - 1) div (hi - lo)` — normalize a value into
    * the dense rank space [0, 2^bits). Exact integer arithmetic (inputs
    * cast to long; floor-div matches DuckDB `//` on the non-negative
    * ranges produced by `c - lo`); a degenerate dimension (hi == lo) maps
    * to 0 everywhere instead of dividing by zero. */
  def normalizeToBits(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val m = lit((1L << bits) - 1)
    when(hi > lo,
      call_function("div", (c.cast("long") - lo.cast("long")) * m,
        hi.cast("long") - lo.cast("long")))
      .otherwise(lit(0L))
  }

  /** Morton interleave: bit `i` of normalized column `j` lands at z-bit
    * `i * n + j`, so consecutive z-values alternate dimensions at every
    * scale. Unrolled into `bits * n` OR terms — all constant-shift long
    * ops, fully inside whole-stage codegen. Inputs MUST already be in
    * [0, 2^bits) ([[normalizeToBits]]); 63-bit budget enforced. */
  def interleaveBits(normCols: Seq[Column], bits: Int): Column = {
    require(normCols.nonEmpty, "need at least one dimension")
    require(bits >= 1 && bits * normCols.size <= 63,
      s"z-width ${bits * normCols.size} exceeds a signed long")
    val n = normCols.size
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      normCols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** The SAME unrolled interleave as a SQL string over pre-normalized
    * column names — generated from one description so the DuckDB oracle
    * replays bit-identical arithmetic instead of hand-transcribing it. */
  def interleaveSqlExpr(normCols: Seq[String], bits: Int): String = {
    require(normCols.nonEmpty && bits * normCols.size <= 63)
    val n = normCols.size
    val terms = for (i <- 0 until bits; (c, j) <- normCols.zipWithIndex)
      yield s"((($c >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` as a z-clustered parquet tree: range-partition on the
    * z-value (balanced files even under key skew — boundaries are sampled
    * from the actual distribution), sort within each partition, one file
    * per partition. Every output file then covers one contiguous z-range
    * = one small bounding box in every clustered dimension, which is what
    * makes footer-stats skipping fire on multi-dimensional predicates. */
  def writeZordered(df: DataFrame, zCol: Column, path: String,
                    numFiles: Int): Unit =
    df.withColumn("__graft_z", zCol)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
}
