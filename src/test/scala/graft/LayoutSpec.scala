package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Z-order layout: the bit math against a reference implementation, the
  * locality bound the registered audit advertises, and the actual payoff
  * — per-FILE bounding boxes of a z-clustered write vs a single-column
  * sort's. */
class LayoutSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton interleave in plain Scala. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      vals.zipWithIndex.foldLeft(acc) { case (a, (v, j)) =>
        a | (((v >> i) & 1L) << (i * vals.size + j))
      }
    }

  test("interleaveBits matches the reference on 2 and 3 dims") {
    val xs = Seq(0L, 1L, 5L, 127L, 128L, 200L, 255L)
    val rows2 = for (a <- xs; b <- xs) yield (a, b)
    val got2 = rows2.toDF("a", "b")
      .select(Layout.interleaveBits(Seq(col("a"), col("b")), 8).as("z"))
      .as[Long].collect()
    assert(got2.toSeq === rows2.map { case (a, b) => mortonRef(Seq(a, b), 8) })
    val rows3 = for (a <- xs.take(4); b <- xs.take(4); c <- xs.take(4))
      yield (a, b, c)
    val got3 = rows3.toDF("a", "b", "c")
      .select(Layout.interleaveBits(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .as[Long].collect()
    assert(got3.toSeq ===
      rows3.map { case (a, b, c) => mortonRef(Seq(a, b, c), 8) })
  }

  test("interleave z-curve basics: dimension bits land where they should") {
    // z(x=all-ones, y=0) has exactly the even bits set; swapping sets odd
    val df = Seq((255L, 0L)).toDF("x", "y")
    val Seq(zx, zy) = Seq(("x", "y"), ("y", "x")).map { case (a, b) =>
      df.select(Layout.interleaveBits(Seq(col(a), col(b)), 8).as("z"))
        .as[Long].head()
    }
    assert(zx === (0 until 8).map(i => 1L << (2 * i)).sum)
    assert(zy === (0 until 8).map(i => 1L << (2 * i + 1)).sum)
  }

  test("registered audit holds its locality bound: span <= range/16 + rounding") {
    val rows = graft.queries.CoreQueries
      .zorderLocality(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 1)
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val (okRange, pkRange) = li
      .agg((max("l_orderkey") - min("l_orderkey")).cast("long"),
        (max("l_partkey") - min("l_partkey")).cast("long"))
      .as[(Long, Long)].head()
    // top 4 normalized bits fixed per dim ⇒ normalized span < 16 of 256;
    // raw span ≤ range * 16/255 + rounding slack
    def bound(range: Long) = range * 16L / 255L + 2L
    rows.foreach { r =>
      assert(r.getLong(2) <= bound(okRange),
        s"bucket ${r.getLong(0)} ok_span ${r.getLong(2)} > ${bound(okRange)}")
      assert(r.getLong(3) <= bound(pkRange),
        s"bucket ${r.getLong(0)} pk_span ${r.getLong(3)} > ${bound(pkRange)}")
    }
  }

  test("a non-sort-dim predicate skips z-ordered files but hits every linear file") {
    // The file-skipping payoff, measured on footer-equivalent boxes: with a
    // linear sort on ok, a predicate on pk alone overlaps EVERY file's
    // (min,max) box; z-order bounds both dims, so the same predicate
    // prunes most files — and ok-predicates still prune too.
    val d = "/root/testdata/sf0.001"
    val li = graft.engine.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val mm = li.agg(min(col("ok")).as("oklo"), max(col("ok")).as("okhi"),
      min(col("pk")).as("pklo"), max(col("pk")).as("pkhi"))
    val z = Layout.interleaveBits(Seq(
      Layout.normalizeToBits(col("ok"), col("oklo"), col("okhi"), 8),
      Layout.normalizeToBits(col("pk"), col("pklo"), col("pkhi"), 8)), 8)
    val withZ = li.join(broadcast(mm)).select(col("ok"), col("pk"), z.as("zv"))

    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.writeZordered(withZ, col("zv"), s"$dir/zord", numFiles = 16)
    // baseline: same data, same file count, single-column range sort on ok
    li.repartitionByRange(16, col("ok")).sortWithinPartitions(col("ok"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    // per-file bounding boxes — what parquet footer min/max stats advertise
    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min(col("ok")).cast("long").as("oklo"),
          max(col("ok")).cast("long").as("okhi"),
          min(col("pk")).cast("long").as("pklo"),
          max(col("pk")).cast("long").as("pkhi"))
        .select(col("oklo"), col("okhi"), col("pklo"), col("pkhi"))
        .as[(Long, Long, Long, Long)].collect()
    val zb = boxes(s"$dir/zord")
    val lb = boxes(s"$dir/linear")
    assert(zb.length >= 8 && lb.length >= 8)

    // pk ∈ [100, 120] (~10% of the 0..199 range), no ok constraint
    def hitsPk(bs: Array[(Long, Long, Long, Long)]) =
      bs.count { case (_, _, plo, phi) => phi >= 100 && plo <= 120 }
    assert(hitsPk(lb) === lb.length,
      s"ok-sorted files should all intersect a pk-only predicate")
    assert(hitsPk(zb) * 2 <= zb.length,
      s"z-order should skip >= half the files: ${hitsPk(zb)}/${zb.length}")

    // ok ∈ [0, 90] (~6% of 0..1499): both layouts prune, z keeps pruning
    def hitsOk(bs: Array[(Long, Long, Long, Long)]) =
      bs.count { case (olo, ohi, _, _) => ohi >= 0 && olo <= 90 }
    assert(hitsOk(zb) * 2 <= zb.length,
      s"z-order must stay selective on ok too: ${hitsOk(zb)}/${zb.length}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("hilbert-ordered files prune on both dims like z-ordered ones") {
    // writeZordered is curve-agnostic (it range-partitions + sorts on the
    // given index column): the Hilbert index through the same writer must
    // deliver the same both-dims file-skipping payoff
    val d = "/root/testdata/sf0.001"
    val li = graft.engine.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val mm = li.agg(min(col("ok")).as("oklo"), max(col("ok")).as("okhi"),
      min(col("pk")).as("pklo"), max(col("pk")).as("pkhi"))
    val h = graft.functions.HilbertIndex.hilbert(
      Layout.normalizeToBits(col("ok"), col("oklo"), col("okhi"), 8),
      Layout.normalizeToBits(col("pk"), col("pklo"), col("pkhi"), 8), 8)
    val withH = li.join(broadcast(mm)).select(col("ok"), col("pk"), h.as("hv"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hilb").toString
    Layout.writeZordered(withH, col("hv"), s"$dir/hilb", numFiles = 16)
    val hb = spark.read.parquet(s"$dir/hilb")
      .groupBy(input_file_name())
      .agg(min(col("ok")).cast("long").as("oklo"),
        max(col("ok")).cast("long").as("okhi"),
        min(col("pk")).cast("long").as("pklo"),
        max(col("pk")).cast("long").as("pkhi"))
      .select(col("oklo"), col("okhi"), col("pklo"), col("pkhi"))
      .as[(Long, Long, Long, Long)].collect()
    assert(hb.length >= 8)
    val hitsPk = hb.count { case (_, _, plo, phi) => phi >= 100 && plo <= 120 }
    assert(hitsPk * 2 <= hb.length,
      s"hilbert order should skip >= half the files on a pk-only predicate: $hitsPk/${hb.length}")
    val hitsOk = hb.count { case (olo, ohi, _, _) => ohi >= 0 && olo <= 90 }
    assert(hitsOk * 2 <= hb.length,
      s"hilbert order must stay selective on ok too: $hitsOk/${hb.length}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("hilbert curve axioms: bijective onto [0, 4^bits), unit-step adjacent") {
    // exhaustive over the full 6-bit grid (4096 cells): the two properties
    // that DEFINE a Hilbert curve, and that the Morton interleave lacks
    // (its seam jumps are why Hilbert exists)
    val bits = 6
    val n = 1 << bits
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield ((x.toLong, y.toLong),
        graft.functions.HilbertIndex.xy2d(n.toLong, x.toLong, y.toLong))
    assert(ds.map(_._2).sorted === (0L until (n.toLong * n)).toSeq,
      "xy2d must be a bijection onto [0, n^2)")
    val byD = ds.map(_.swap).toMap
    (0L until (n.toLong * n - 1)).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"positions $d and ${d + 1} must be grid neighbours")
    }
  }

  test("hilbert expression == kernel; hilbert buckets at least as tight as morton") {
    // expression/codegen path equals the plain kernel on a random grid
    val bits = 8
    val pts = (0 until 500).map { i =>
      (graft.ops.TextOps.mix64(i.toLong) & 0xffL,
        graft.ops.TextOps.mix64(i + 9999L) & 0xffL)
    }
    val got = pts.toDF("x", "y")
      .select(graft.functions.HilbertIndex.hilbert(col("x"), col("y"), bits).as("h"))
      .as[Long].collect().toSeq
    val want = pts.map { case (x, y) =>
      graft.functions.HilbertIndex.xy2d(1L << bits, x, y) }
    assert(got === want)
    // locality: over an exhaustive 6-bit grid, the mean per-bucket bounding
    // box (top-2-bit buckets) of the hilbert order is no worse than morton's
    val n = 1 << 6
    def spans(index: (Long, Long) => Long): Double = {
      val cells = for (x <- 0L until n; y <- 0L until n) yield (index(x, y), x, y)
      val buckets = cells.groupBy(_._1 >> 8) // 16 buckets of 256 cells
      buckets.values.map { g =>
        (g.map(_._2).max - g.map(_._2).min + g.map(_._3).max - g.map(_._3).min).toDouble
      }.sum / buckets.size
    }
    def morton(x: Long, y: Long): Long =
      (0 until 6).foldLeft(0L)((a, i) =>
        a | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val hs = spans((x, y) => graft.functions.HilbertIndex.xy2d(n.toLong, x, y))
    val ms = spans(morton)
    assert(hs <= ms + 1e-9, s"hilbert mean span $hs must not exceed morton $ms")
  }

  test("n-dim hilbert axioms at d=3: bijective onto [0, 8^bits), unit-step adjacent; d=4 bijective") {
    // the same two defining properties the 2-D kernel pins, exhaustively,
    // for the Skilling transpose walk at three dims — the generalization
    // a 3+-column layout decision clusters on (r17 VERDICT #5)
    import graft.functions.HilbertIndex.axesToIndex
    for (bits <- 1 to 3) {
      val n = 1 << bits
      val ds = for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
        yield ((x.toLong, y.toLong, z.toLong),
          axesToIndex(bits, Array(x.toLong, y.toLong, z.toLong)))
      assert(ds.map(_._2).sorted === (0L until (1L << (3 * bits))).toSeq,
        s"bits=$bits: axesToIndex must be a bijection onto [0, 8^bits)")
      val byD = ds.map(_.swap).toMap
      (0L until (1L << (3 * bits)) - 1).foreach { d =>
        val (x1, y1, z1) = byD(d); val (x2, y2, z2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) === 1,
          s"bits=$bits: positions $d and ${d + 1} must be grid neighbours")
      }
    }
    // d=4 probe: bijectivity over the full 2-bit grid (65536 positions)
    val ds4 = for (a <- 0 until 4; b <- 0 until 4; c <- 0 until 4; e <- 0 until 4)
      yield axesToIndex(2, Array(a.toLong, b.toLong, c.toLong, e.toLong))
    assert(ds4.sorted === (0L until 256L).toSeq,
      "d=4 bits=2: bijection onto [0, 16^2)")
  }

  test("n-dim hilbert SQL chain rejects carry names that collide with its generated columns") {
    // a carry named ht (or x0..x{n-1}/hn) would be shadowed in the
    // twiddle CTE and duplicated in the SELECT list — silently wrong SQL
    // without the guard (r18 ADVICE)
    for (bad <- Seq("ht", "hn", "x0", "x2")) {
      val e = intercept[IllegalArgumentException] {
        graft.functions.HilbertIndex.hilbertNSqlCtes("src", 2, 3, Seq("ok", bad))
      }
      assert(e.getMessage.contains(bad), e.getMessage)
    }
    // non-colliding carries still render
    val (sql, last) = graft.functions.HilbertIndex
      .hilbertNSqlCtes("src", 2, 3, Seq("doc_id"))
    assert(last === "hf" && sql.contains("doc_id,"))
  }

  test("n-dim hilbert expression == kernel (codegen path); null in any dim → null") {
    val bits = 8
    val pts = (0 until 400).map { i =>
      (graft.ops.TextOps.mix64(i.toLong) & 0xffL,
        graft.ops.TextOps.mix64(i + 7777L) & 0xffL,
        graft.ops.TextOps.mix64(i + 31337L) & 0xffL)
    }
    val got = pts.toDF("x", "y", "z")
      .select(graft.functions.HilbertIndex.hilbertN(bits,
        col("x"), col("y"), col("z")).as("h"))
      .as[Long].collect().toSeq
    val want = pts.map { case (x, y, z) =>
      graft.functions.HilbertIndex.axesToIndex(bits, Array(x, y, z)) }
    assert(got === want)
    val withNull = Seq((Some(1L), Some(2L), Option.empty[Long]))
      .toDF("x", "y", "z")
      .select(graft.functions.HilbertIndex.hilbertN(bits,
        col("x"), col("y"), col("z")).as("h"))
      .collect()
    assert(withNull.head.isNullAt(0))
  }

  test("hilbert3-ordered files prune on all three dims (per-file footer boxes)") {
    // the 2-D payoff test at d=3: writeZordered is curve-agnostic, so the
    // n-dim index through the same writer must bound EVERY dimension in
    // every file's footer box tightly enough that a single-dim predicate
    // skips at least half the files — the property a single-column sort
    // provably lacks for its non-sort dims
    val d = "/root/testdata/sf0.001"
    val li = graft.engine.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
        col("l_suppkey").as("sk"))
    val mm = li.agg(min(col("ok")).as("oklo"), max(col("ok")).as("okhi"),
      min(col("pk")).as("pklo"), max(col("pk")).as("pkhi"),
      min(col("sk")).as("sklo"), max(col("sk")).as("skhi"))
    val h = graft.functions.HilbertIndex.hilbertN(8,
      Layout.normalizeToBits(col("ok"), col("oklo"), col("okhi"), 8),
      Layout.normalizeToBits(col("pk"), col("pklo"), col("pkhi"), 8),
      Layout.normalizeToBits(col("sk"), col("sklo"), col("skhi"), 8))
    val withH = li.join(broadcast(mm))
      .select(col("ok"), col("pk"), col("sk"), h.as("hv"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hilb3").toString
    // 32 files, not 16: at d=3 a 1/16 curve segment already spans ~40%
    // of each dimension, leaving the box-alignment jitter of the SAMPLED
    // range-partition boundaries enough room to flip a 50%-skip assert
    // run to run (observed 9/16 vs 10/16); 1/32 segments span ~31% per
    // dim, restoring deterministic margin under the bound below
    Layout.writeZordered(withH, col("hv"), s"$dir/h3", numFiles = 32)
    val boxes = spark.read.parquet(s"$dir/h3")
      .groupBy(input_file_name())
      .agg(min(col("ok")).cast("long").as("oklo"),
        max(col("ok")).cast("long").as("okhi"),
        min(col("pk")).cast("long").as("pklo"),
        max(col("pk")).cast("long").as("pkhi"),
        min(col("sk")).cast("long").as("sklo"),
        max(col("sk")).cast("long").as("skhi"))
      .drop("input_file_name()")
      .collect()
    assert(boxes.length >= 8)
    def hits(lo: String, hi: String, qlo: Long, qhi: Long): Int =
      boxes.count(r => r.getAs[Long](hi) >= qlo && r.getAs[Long](lo) <= qhi)
    // dimension-balance geometry at d=3: a 1/32 curve segment spans
    // ~(1/32)^(1/3) ≈ 31% of EACH dimension (vs 25% at d=2 — higher d
    // trades per-dim tightness for covering more dims), so a ~10%-wide
    // single-dim slice should hit ~40% of files; assert skip ≥ 1/3 with
    // margin for boundary jitter — a single-column sort hits 100% on
    // its non-sort dims, the property under test
    val okHits = hits("oklo", "okhi", 0L, 90L)
    val pkHits = hits("pklo", "pkhi", 100L, 120L)
    val skHits = hits("sklo", "skhi", 1L, 2L)
    for ((n, dim) <- Seq(okHits -> "ok", pkHits -> "pk", skHits -> "sk"))
      assert(n * 3 <= boxes.length * 2,
        s"hilbert3 order should skip >= 1/3 of files on a $dim-only predicate: $n/${boxes.length}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("n-dim hilbert at d=3 buckets no looser than 3-dim morton on the full grid") {
    val bits = 4 // 4096 cells
    val n = 1L << bits
    def morton3(x: Long, y: Long, z: Long): Long =
      (0 until bits).foldLeft(0L)((a, i) =>
        a | (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2)))
    def spans(index: (Long, Long, Long) => Long): Double = {
      val cells = for (x <- 0L until n; y <- 0L until n; z <- 0L until n)
        yield (index(x, y, z), x, y, z)
      val buckets = cells.groupBy(_._1 >> (3 * bits - 6)) // 64 buckets
      buckets.values.map { g =>
        (g.map(_._2).max - g.map(_._2).min + g.map(_._3).max - g.map(_._3).min +
          g.map(_._4).max - g.map(_._4).min).toDouble
      }.sum / buckets.size
    }
    val hs = spans((x, y, z) =>
      graft.functions.HilbertIndex.axesToIndex(bits, Array(x, y, z)))
    val ms = spans(morton3)
    assert(hs <= ms + 1e-9, s"hilbert3 mean span $hs must not exceed morton3 $ms")
  }
}
