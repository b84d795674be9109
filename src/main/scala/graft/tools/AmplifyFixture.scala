package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture amplifier for the cross-SF scale-ratio probe (VERDICT r10 #5).
  *
  * The per-round bench runs at sf0.1 only, so a superlinear term whose
  * constant is small at sf0.1 is structurally invisible — the probe runs the
  * same bench at ~10× and compares per-query ratios: a query far above the
  * ~10× band names a superlinear term (the class the old fixed-fraction
  * sampled-recall audit belonged to).
  *
  * `AmplifyFixture <srcSfDir> <destDir> [copies=10]` writes `copies` shifted
  * replicas of every FACT table (dimension tables region/nation keep their
  * real-world shape: dims don't scale with the fact data):
  *
  *  - every synthetic key is shifted by `i * 100_000_000` per copy, far above
  *    any fixture key, so referential integrity (orders→customer,
  *    lineitem→{orders,part,supplier}, events→user) is preserved per copy and
  *    key spaces never collide across copies;
  *  - `documents.text` gets a per-copy suffix on EVERY token and
  *    `embeddings.embedding` a per-copy SIGNED COORDINATE PERMUTATION:
  *    byte-identical replicas would make every row an exact duplicate of its
  *    9 clones, and the first attempt's small perturbations (one trailing
  *    token, ±0.05 jitter) still left cross-copy Jaccard ≈ 0.97 and
  *    near-identical embedding cliques that no hyperplane sub-block can
  *    separate (the 10× bench died on the semantic-dedup clique guard —
  *    working as designed, wrong corpus). The per-token suffix keeps every
  *    intra-copy shingle Jaccard EXACTLY as the original while making
  *    cross-copy shingle sets disjoint; the signed permutation is an
  *    orthogonal transform, so intra-copy cosines/distances are preserved
  *    bit-for-bit in structure while cross-copy vectors decorrelate to
  *    near-orthogonal. Each copy therefore reproduces the original
  *    fixture's dedup/ANN geometry and the corpus scales WORK 10×, not
  *    clique sizes;
  *  - timestamps are untouched: a 10× corpus over the same time range grows
  *    each window's rowcount 10× with the same window count — the aggregate
  *    scaling shape the windowed queries face in production.
  *
  * Dev/probe tool: the output lives under /tmp and is never committed; only
  * the ratio artifact (results/SCALE_RATIOS_rNN.md) is.
  */
object AmplifyFixture {

  private val Offset = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AmplifyFixture <srcSfDir> <destDir> [copies]")
    val (src, dest) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-amplify")

    def amplify(table: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until copies).map(i => shift(base, i)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dest/$table.parquet")
      System.err.println(s"[amplify] $table x$copies")
    }
    def shifted(cols: String*)(df: DataFrame, i: Int): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Offset)))

    // dims: copied once, unshifted (a 10x fact load joins the SAME dims)
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")
    }
    amplify("customer")(shifted("c_custkey"))
    amplify("supplier")(shifted("s_suppkey"))
    amplify("part")(shifted("p_partkey"))
    amplify("orders")(shifted("o_orderkey", "o_custkey"))
    amplify("lineitem")(shifted("l_orderkey", "l_partkey", "l_suppkey"))
    amplify("events")(shifted("event_id", "user_id"))
    amplify("documents") { (df, i) =>
      val s0 = shifted("doc_id")(df, i)
      if (i == 0) s0
      else s0
        .withColumn("text",
          regexp_replace(coalesce(col("text"), lit("")), "(\\S+)", s"$$1c$i"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    amplify("embeddings") { (df, i) =>
      val s0 = shifted("vec_id")(df, i)
      if (i == 0) s0
      else {
        val rnd = new scala.util.Random(7700L + i)
        val perm = rnd.shuffle((0 until 64).toVector)
        val sign = Vector.fill(64)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        s0.withColumn("embedding", array((0 until 64).map(k =>
          (col("embedding").getItem(perm(k)) * lit(sign(k))).cast("float")): _*))
      }
    }
    spark.stop()
  }
}
