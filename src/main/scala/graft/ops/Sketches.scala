package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed probabilistic sketches built as plain aggregates — Count-Min
  * (frequency) and HyperLogLog (cardinality) — with every hash md5-derived
  * and every merge an integer sum/max, so a sketch built by Spark and one
  * built by the DuckDB oracle are IDENTICAL tables, not merely similar
  * estimates.
  *
  * Why build sketches as DataFrames at 100 TB:
  *  - the build is one explode + one hash-aggregate — partial (map-side)
  *    combine does almost all the work, the shuffle carries (row, col) /
  *    (bucket, rank) integer pairs, and the result is a TINY table (d·w
  *    counters / m buckets) that broadcasts anywhere;
  *  - sketch merge across corpora/shards = union + the same aggregate
  *    (counter add / rank max) — associative, so incremental maintenance is
  *    the same code path;
  *  - estimates read the sketch, never the corpus.
  *
  * The hash family is the [[Dedup.minhashConsts]] universal family over the
  * 48-bit md5 prefix ([[TextOps.shingleHash]]) — one digest per item, k
  * multiply-adds, overflow-free under 2^60, replayable in SQL.
  */
object Sketches {

  private val P = Dedup.MinhashP

  /** 48-bit md5-prefix base hash of an item, reduced mod P (the universal
    * family's domain). */
  private def baseHash(item: Column): Column = TextOps.shingleHash(item) % P

  // ---- Count-Min ----------------------------------------------------------

  /** Build a depth×width Count-Min sketch over `itemCol`: row i holds
    * counters indexed by h_i(x) = (base(x)·A_i + B_i) mod P mod width. The
    * result has one row per NON-ZERO counter (row, col, cnt) — absent
    * counters are zero. */
  def cmsBuild(items: DataFrame, itemCol: String, depth: Int = 4,
               width: Int = 256): DataFrame = {
    val cells = Dedup.minhashConsts(depth).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), ((col("hb") * a + b) % P % width).as("col"))
    }
    items.select(baseHash(col(itemCol)).as("hb"))
      .select(explode(array(cells: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Driver-side replica of the cell index chain for ONE item — bit-exact
    * with the Column form (pure integer arithmetic on the md5 hex prefix),
    * so probe keys are computed without touching the cluster. */
  def cmsCellsLocal(item: String, depth: Int, width: Int): Seq[(Int, Long)] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(12)
    val hb = java.lang.Long.parseLong(hex, 16) % P
    Dedup.minhashConsts(depth).zipWithIndex.map { case ((a, b), i) =>
      i -> ((hb * a + b) % P % width)
    }
  }

  /** Point-estimate frequencies for `probes` from a built sketch:
    * min over the depth counters (the classic CM overestimate — never under,
    * over only on collision). The probe keys are literals, so the lookup is
    * a broadcast hash join against the tiny sketch — no corpus access. */
  def cmsEstimate(sketch: DataFrame, probes: Seq[String], depth: Int = 4,
                  width: Int = 256): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val keys = probes.flatMap(w => cmsCellsLocal(w, depth, width)
      .map { case (i, c) => (w, i, c.toLong) })
      .toDF("item", "row", "col")
    keys.join(broadcast(sketch), Seq("row", "col"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Collect a built CMS into ONE flat row-major depth×width array (absent
    * cells zero) — the literal-embeddable form for scan-stage lookups
    * ([[cmsLookupHashed]]): depth·width longs regardless of how many items
    * the sketch counted, the same "fixed-size state rides the plan" shape
    * as the [[Bloom]] bitset. */
  def cmsFlat(sketch: DataFrame, depth: Int, width: Int): Array[Long] = {
    val arr = new Array[Long](depth * width)
    sketch.select(col("row"), col("col"), col("cnt")).collect().foreach { r =>
      arr(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
    }
    arr
  }

  /** Point-estimate column against a literal-embedded flat sketch for an
    * item whose 48-bit md5-prefix hash ([[TextOps.shingleHash]]) is already
    * a column: min over the depth counters. Pure codegen'd arithmetic +
    * array indexing — no join, no UDF — so a CMS frequency lookup can sit
    * inside a per-row `transform` on a full-corpus scan. The caller must
    * pass the SAME (depth, width) the sketch was built with ([[graft.ops
    * .LmScore.NgramLm]] bundles them for the LM case). */
  def cmsLookupHashed(hb48: Column, flat: Array[Long], depth: Int,
                      width: Int): Column = {
    require(flat.length == depth * width,
      s"flat sketch length ${flat.length} != depth $depth * width $width")
    val arr = typedlit(flat.toSeq)
    val hb = hb48 % P
    val cells = Dedup.minhashConsts(depth).zipWithIndex.map { case ((a, b), i) =>
      element_at(arr, (lit(i.toLong * width) + (hb * a + b) % P % width)
        .cast("int") + 1)
    }
    if (cells.sizeIs == 1) cells.head else least(cells: _*)
  }

  // ---- HyperLogLog --------------------------------------------------------

  /** HLL bucket/rank pairs for an item hash: bucket = low `bBits` bits,
    * rank = 1-based position of the leftmost 1 in the remaining 48−bBits
    * bits (0 remainder ⇒ maximal rank). `length(bin(w))−1` is floor(log2)
    * in both engines — integer-only, no float log. */
  private def rankExpr(bBits: Int): Column = {
    val rem = 48 - bBits
    val w = shiftrightunsigned(col("hb48"), bBits)
    when(w === 0L, lit(rem + 1))
      .otherwise(lit(rem) - (length(bin(w)) - 1))
  }

  /** Per-bucket max rank — the HLL register table (one row per non-empty
    * bucket; empty buckets are rank 0). Merge of two register tables =
    * union + the same max — associative, shard-friendly. */
  def hllRegisters(items: DataFrame, itemCol: String, bBits: Int): DataFrame =
    items.select(TextOps.shingleHash(col(itemCol)).as("hb48"))
      .select(pmod(col("hb48"), lit(1L << bBits)).as("bucket"), rankExpr(bBits).as("rank"))
      .groupBy(col("bucket"))
      .agg(max(col("rank")).as("max_rank"))

  /** Merge HLL register tables: union + the same per-bucket max. The max
    * is associative and commutative, so per-shard register tables — each
    * built by ONE pass over its own shard — roll up into the corpus
    * registers without ever touching items again: merge(registers(A),
    * registers(B)) ≡ registers(A ∪ B), exactly (SketchesSpec asserts table
    * equality; q_hll_merge hash-verifies the merged ESTIMATE against the
    * oracle's single-pass build). This is the sketch contract that matters
    * at 100 TB: distinct-count state is k·shards tiny rows, recomputed
    * never. */
  def hllMergeRegisters(tables: Seq[DataFrame]): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(max(col("max_rank")).as("max_rank"))

  /** Merge Count-Min sketches: union + per-cell SUM — CM counters are
    * linear, so shard sketches add cell-wise into the corpus sketch
    * (merge(cms(A), cms(B)) ≡ cms(A ∪ B), table-exact). */
  def cmsMerge(tables: Seq[DataFrame]): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("row"), col("col")).agg(sum(col("cnt")).as("cnt"))

  /** Cardinality estimate from a register table ([[hllRegisters]] output,
    * or any [[hllMergeRegisters]] roll-up of shard tables). The harmonic
    * sum is EXACT integer arithmetic: Σ 2^(−M_j) is scaled by 2^49 (max
    * rank is 43 at bBits = 6, so every weight 2^(49−M) fits a long),
    * summed as longs — order-independent, engine-exact — and only the
    * final α·m²·2^49 / S division is floating point (one IEEE op chain,
    * bit-stable). Output: (m, n_empty_buckets, est) — raw HLL estimator,
    * documented ±1.04/√m; the small-range linear-counting correction is
    * deliberately omitted because its ln() is not bit-portable across
    * engines. */
  def hllEstimateFromRegisters(registers: DataFrame, bBits: Int = 6): DataFrame = {
    val m = 1L << bBits
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers
      .agg(count(lit(1)).as("n_filled"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - max_rank AS INT))")).as("s_filled"))
      .select(lit(m).as("m"), (lit(m) - col("n_filled")).as("n_empty_buckets"),
        round(lit(alpha * m * m) * lit(math.pow(2.0, 49)) /
          (col("s_filled") + (lit(m) - col("n_filled")) * lit(1L << 49)).cast("double"), 2)
          .as("est"))
  }

  /** One-pass build + estimate (see [[hllEstimateFromRegisters]]). */
  def hllEstimate(items: DataFrame, itemCol: String, bBits: Int = 6): DataFrame =
    hllEstimateFromRegisters(hllRegisters(items, itemCol, bBits), bBits)

  /** Deterministic bottom-k hash sample — the mergeable uniform-sample
    * sketch behind sample-based quantiles (and any "look at k
    * representative rows" pass): keep the k rows whose md5 rank over the
    * row id is SMALLEST. Membership is a pure function of the id, so the
    * sample is identical across runs/engines, and it is mergeable:
    * re-cutting the union of two shard samples equals the sample of the
    * shard union (min-rank is associative — SketchesSpec asserts it), so
    * per-shard samples roll up without touching rows again. Globally the
    * cut is `orderBy(rank).limit(k)` which plans as TakeOrderedAndProject:
    * a per-partition bounded cut + a k·partitions driver merge — never a
    * full sort. At 100 TB this is how you answer "p95 of a column" without
    * sorting the column: maintain the k-sample as write-once state,
    * estimate quantiles from it ([[graft.queries.PipelineQueries]]'s
    * q_sample_quantiles measures the estimate against the exact answer). */
  def bottomKSample(rows: DataFrame, idCol: String, k: Int): DataFrame = {
    // `rnk` is part of the returned sample-frame contract (consumers re-cut
    // and order by it), so it cannot be renamed away — but a caller column
    // of the same name would be SILENTLY overwritten by withColumn. Fail
    // fast instead; callers merging sample frames drop `rnk` before
    // re-cutting (the union of two bottom-k frames re-cuts to the true
    // bottom-k of the union — SketchesSpec asserts it).
    require(!rows.columns.contains("rnk"),
      "input already has a 'rnk' column; drop or rename it before sampling")
    rows.withColumn("rnk", md5(col(idCol).cast("string")))
      .orderBy(col("rnk"), col(idCol)).limit(k)
  }

  /** Per-GROUP bottom-k hash sample — [[bottomKSample]] with the cut run
    * through the bounded-heap [[graft.plans.GroupedTopK]] operator (k rows
    * per group, O(n log k), k·|groups| shuffle, no per-group sort). The
    * rank hashes (group, id) together so each group draws an independent
    * sample; all input columns ride along, so per-group statistics
    * (quantiles, means) can be estimated directly from the sample frame.
    * This is the grouped generalization of
    * [[graft.ops.Curation.reservoirPerSource]] with the payload kept. */
  def bottomKSamplePerGroup(rows: DataFrame, groupCol: String, idCol: String,
                            k: Int): DataFrame = {
    require(!rows.columns.contains("rnk"),
      "input already has a 'rnk' column; drop or rename it before sampling")
    graft.plans.GroupedTopK.topK(
      rows.withColumn("rnk",
        md5(concat_ws(":", col(groupCol), col(idCol).cast("string")))),
      Seq(groupCol), Seq("rnk" -> false, idCol -> false), k)
  }

  /** Set-INTERSECTION estimate from two register tables via
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    * union estimate comes from [[hllMergeRegisters]] — so the whole
    * three-way answer is computed from the two sketches alone, never the
    * items. This is the sketch-algebra payoff at 100 TB: overlap between
    * any two corpus slices (two crawls, two snapshots, train vs eval) is
    * answerable from per-slice register tables that already exist. Error
    * compounds (three ±1.04/√m estimates), and small true intersections
    * can estimate negative — standard HLL inclusion–exclusion behavior,
    * reported as-is rather than clamped so callers see the raw algebra.
    * All arithmetic after the integer harmonic sums is one IEEE add/sub
    * chain on identical doubles — engine-exact, hash-verifiable. */
  def hllIntersectEstimate(a: DataFrame, b: DataFrame, bBits: Int = 6): DataFrame = {
    val ea = hllEstimateFromRegisters(a, bBits).select(col("est").as("est_a"))
    val eb = hllEstimateFromRegisters(b, bBits).select(col("est").as("est_b"))
    val eu = hllEstimateFromRegisters(hllMergeRegisters(Seq(a, b)), bBits)
      .select(col("est").as("est_union"))
    ea.join(eb).join(eu)
      .select(col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 2).as("est_intersect"))
  }
}
