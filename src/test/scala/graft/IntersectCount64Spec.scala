package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.IntersectCount64]] — the native refine-side
  * intersect-count kernel must equal `size(array_intersect(a, b))` on
  * every distinct-element long-array input (the hashedShingleSet
  * contract), including zero values, empty arrays, and full overlap. */
class IntersectCount64Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("kernel == size(array_intersect) on random distinct long arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      def arr(n: Int): Seq[Long] =
        rnd.shuffle((0 until n).map(_ =>
          // small value domain forces real overlaps; include 0 and negatives
          rnd.nextInt(40).toLong - 5L).distinct.toList).toSeq
      (i.toLong, arr(rnd.nextInt(30)), arr(rnd.nextInt(30)))
    } ++ Seq(
      (1000L, Seq.empty[Long], Seq(1L, 2L)),
      (1001L, Seq(1L, 2L), Seq.empty[Long]),
      (1002L, Seq(0L), Seq(0L)),
      (1003L, Seq(1L, 2L, 3L), Seq(3L, 2L, 1L)),
      (1004L, Seq(Long.MinValue, Long.MaxValue), Seq(Long.MaxValue)))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.IntersectCount64.of(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    val bad = df.where(col("k") =!= col("ref")).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("jaccard via the kernel equals the array_union form on distinct arrays") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      def arr(n: Int): Seq[Long] =
        (0 until n).map(_ => rnd.nextInt(30).toLong).distinct.toSeq
      (i.toLong, arr(1 + rnd.nextInt(20)), arr(1 + rnd.nextInt(20)))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        graft.ops.TextOps.jaccard(col("a"), col("b")).as("k"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          greatest(size(array_union(col("a"), col("b"))), lit(1))
            .cast("double")).as("ref"))
    val bad = df.where(col("k") =!= col("ref")).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
