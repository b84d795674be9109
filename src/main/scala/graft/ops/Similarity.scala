package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector and
  * one `TakeOrderedAndProject` pass over the corpus (no shuffle of the
  * corpus at all). Scale path: random-hyperplane LSH buckets the corpus once
  * (a narrow column of (bucket, id)), so a query probes only its own and
  * adjacent buckets — candidates shrink by ~2^planes while the final exact
  * re-rank stays tiny.
  */
object Similarity {

  /** Fused dot product of two float arrays as a deterministic sequential
    * double fold — bit-compatible with DuckDB
    * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`.
    *
    * A UDF (not `zip_with`+`aggregate`): higher-order expressions allocate an
    * intermediate array and interpret two lambdas per element, which at 2M+
    * pairs dominates the runtime; the fused loop is ~10× faster and keeps the
    * identical left-to-right summation order the oracle replays. */
  private val dotU = udf { (a: Seq[Float], b: Seq[Float]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** sqrt(v·v) — precompute ONCE per vector before any pairwise op. */
  def norm(v: Column): Column = sqrt(dotU(v, v))

  /** Cosine similarity of two `array<float>` columns (self-contained form;
    * pairwise operators below precompute norms instead of calling this). */
  def cosine(a: Column, b: Column): Column = dotU(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbours of `queryId`. Ordering and
    * selection use the rounded score (+ id tie-break) so the output is
    * totally ordered and hash-stable. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryId)
      .select(col("embedding").as("qv"), norm(col("embedding")).as("qn"))
    emb.join(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(dotU(col("embedding"), col("qv")) /
          (norm(col("embedding")) * col("qn")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed). */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for an embedding column. */
  def lshBucket(v: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val vd = v.cast("array<double>")
    val ps = planes(nPlanes, dim, seed)
    (0 until nPlanes).map { p =>
      val plane = typedlit(ps(p).toSeq)
      val dot = aggregate(zip_with(vd, plane, (x, y) => x * y), lit(0.0), (a, b) => a + b)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k via hyperplane LSH with 1-bit multi-probe: consider only
    * vectors whose bucket is the query's bucket or differs in exactly one
    * bit, then exact-re-rank those candidates. Recall/latency trade-off is
    * (nPlanes, probes); the bucketing pass is one narrow projection that at
    * scale would be precomputed and bucket-partitioned on write. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int,
              nPlanes: Int = 6, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col("embedding"), nPlanes, dim, seed))
    val q = bucketed.where(col("vec_id") === queryId)
      .select(col("embedding").as("qv"), norm(col("embedding")).as("qn"),
        col("bucket").as("qb"))
    val probeOk = (0 until nPlanes)
      .map(p => col("bucket") === col("qb").bitwiseXOR(lit(1L << p)))
      .foldLeft(col("bucket") === col("qb"))(_ || _)
    bucketed.join(broadcast(q))
      .where(col("vec_id") =!= queryId && probeOk)
      .select(col("vec_id"),
        round(dotU(col("embedding"), col("qv")) /
          (norm(col("embedding")) * col("qn")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding-space near-duplicate pairs above a cosine threshold —
    * exact all-pairs baseline (verification scale; LSH-bucket the ids first
    * at production scale, mirroring [[Dedup.nearDupPairs]]). */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double, maxId: Long): DataFrame = {
    val e = emb.where(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dotU(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6).as("cos"))
      .where(col("cos") > threshold)
  }
}
