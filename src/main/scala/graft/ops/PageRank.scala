package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in pure integer fixed point — the iterative
  * message-passing family member next to [[Dedup]]'s connected components
  * (pointer jumping): per round, every node divides its rank over its
  * out-edges and accumulates incoming shares, damped against uniform
  * teleport.
  *
  * Why integer fixed point: float PageRank is NOT hash-verifiable — the
  * per-node incoming sum is a float fold whose order differs between
  * Spark's partial aggregation and any oracle. Here ranks live as 1e-12
  * fixed-point BIGINTs: shares are integer divisions (exact, identical in
  * both engines), incoming sums are integer additions (commutative,
  * fold-order-free), and damping is `(dampNum · m) div dampDen`. The
  * quantization error vs real-valued PageRank is ≤ outdeg · 1e-12 per node
  * per round — far below any ranking-relevant difference — and the result
  * is bit-identical everywhere, so a 5-round run replays exactly as 5
  * unrolled CTEs in DuckDB.
  *
  * Scale design: the adjacency (src, dst, outdeg) is materialized ONCE and
  * each round costs one |E| equi-join (shuffle on src) plus one |V| hash
  * aggregation (shuffle on dst) — the same shape GraphX/Pregel lowers to,
  * with no driver-resident state at any point (ranks never collect; the
  * driver holds two scalars). Lineage grows LINEARLY per round (each round
  * reads only the previous ranks plus the two checkpointed invariants), so
  * rounds stay lazy and fuse into one job; a cadence `localCheckpoint`
  * (reliable `checkpoint` on a cluster — the components precedent) bounds
  * plan depth for high iteration counts without paying a per-round
  * materialization.
  * Dangling nodes cannot exist in a symmetric graph (every node listed has
  * an out-edge); for directed inputs their mass is dropped, which only
  * rescales ranks uniformly — documented rather than redistributed, to
  * keep the per-round cost at one join.
  */
object PageRank {

  /** `edges`: deduplicated directed (src, dst) pairs; nodes are
    * `distinct(src) ∪ distinct(dst)`. Returns (node, rank_fp) with
    * rank_fp ≈ pagerank · `scale`, after exactly `iters` rounds from the
    * uniform start (no convergence test — fixed rounds ARE the contract,
    * so two engines can replay it). */
  def pageRankFp(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
                 dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16, got $iters")
    require(dampNum > 0 && dampNum < dampDen, s"0 < dampNum < dampDen")
    // Materialize the edge list ONCE: nodes, outdeg and adj all consume it,
    // and without this the caller's edge DERIVATION (often a join+distinct)
    // would re-execute for each — measured 3x the whole query's cost on the
    // co-purchase graph. localCheckpoint here; reliable checkpoint on a
    // cluster (the components precedent).
    val ed = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRankFp: empty graph")
    val base = scale / n
    val teleport = ((dampDen - dampNum) * base) / dampDen
    val outdeg = ed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = ed.join(outdeg, "src").localCheckpoint()
    var ranks = nodes.select(col("node"), lit(base).as("rank_fp"))
    for (it <- 1 to iters) {
      val msgs = adj.join(ranks, adj("src") === ranks("node"))
        .select(adj("dst").as("node"),
          call_function("div", col("rank_fp"), col("outdeg")).as("c"))
      val agg = msgs.groupBy("node").agg(sum(col("c")).as("m"))
      ranks = nodes.join(agg, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + call_function("div",
            lit(dampNum) * coalesce(col("m"), lit(0L)), lit(dampDen)))
            .as("rank_fp"))
      // Lineage grows LINEARLY per round (each round reads only the
      // previous ranks plus the two checkpointed invariants), so a
      // per-round eager materialization is pure overhead — measured
      // ~0.2 s/round of job + block-manager cost on a 500-node graph.
      // A cadence checkpoint still bounds plan depth for high iters.
      if (it % 4 == 0 && it < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** PERSONALIZED PageRank (random walk with restart): teleport mass flows
    * only to `seeds`, so rank concentrates in the seed set's graph
    * neighbourhood. Over a kNN similarity graph this is SEED-SET
    * EXPANSION — "find documents like these curated ones" — the curation
    * primitive behind quality-propagation pipelines, here with the same
    * integer recurrence (and therefore the same hash-verifiability and
    * per-round |E|-join + |V|-agg cost) as [[pageRankFp]]. The seed panel
    * is a bounded literal riding in the plan (an `isin`), never a driver
    * loop. Seeds absent from the graph contribute nothing (their teleport
    * mass targets a node that has no edges and no output row) — callers
    * seed from the corpus the graph was built over. */
  def pprFp(edges: DataFrame, seeds: Seq[Long], iters: Int,
            scale: Long = 1000000000000L, dampNum: Long = 85L,
            dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16, got $iters")
    require(seeds.nonEmpty && seeds.size <= 1024,
      s"seed panel must be 1..1024 literals, got ${seeds.size}")
    require(seeds.distinct.size == seeds.size, "duplicate seeds")
    // Materialize the edge list ONCE: nodes, outdeg and adj all consume it,
    // and without this the caller's edge DERIVATION (often a join+distinct)
    // would re-execute for each — measured 3x the whole query's cost on the
    // co-purchase graph. localCheckpoint here; reliable checkpoint on a
    // cluster (the components precedent).
    val ed = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val base = scale / seeds.size
    val teleport = ((dampDen - dampNum) * base) / dampDen
    val isSeed = col("node").isin(seeds: _*)
    val outdeg = ed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = ed.join(outdeg, "src").localCheckpoint()
    var ranks = nodes.select(col("node"),
        when(isSeed, lit(base)).otherwise(lit(0L)).as("rank_fp"))
    for (it <- 1 to iters) {
      val msgs = adj.join(ranks, adj("src") === ranks("node"))
        .select(adj("dst").as("node"),
          call_function("div", col("rank_fp"), col("outdeg")).as("c"))
      val agg = msgs.groupBy("node").agg(sum(col("c")).as("m"))
      ranks = nodes.join(agg, Seq("node"), "left")
        .select(col("node"),
          (when(isSeed, lit(teleport)).otherwise(lit(0L)) +
            call_function("div",
              lit(dampNum) * coalesce(col("m"), lit(0L)), lit(dampDen)))
            .as("rank_fp"))
      // linear lineage — cadence checkpoint only (see pageRankFp)
      if (it % 4 == 0 && it < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Host-side sequential twin of [[pprFp]] (spec cross-check only). */
  def referencePprFp(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int,
                     scale: Long = 1000000000000L, dampNum: Long = 85L,
                     dampDen: Long = 100L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val base = scale / seeds.size
    val teleport = ((dampDen - dampNum) * base) / dampDen
    val seedSet = seeds.toSet
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(v => v -> (if (seedSet(v)) base else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v => v ->
        ((if (seedSet(v)) teleport else 0L) +
          dampNum * in.getOrElse(v, 0L) / dampDen)).toMap
    }
    r
  }

  /** Replays [[pageRankFp]]'s integer recurrence host-side for a SMALL
    * in-memory graph — the spec cross-check surface (never a query path):
    * the distributed result must equal this sequential fold exactly,
    * because both are the same integer arithmetic. */
  def referenceFp(edges: Seq[(Long, Long)], iters: Int,
                  scale: Long = 1000000000000L, dampNum: Long = 85L,
                  dampDen: Long = 100L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val base = scale / n
    val teleport = ((dampDen - dampNum) * base) / dampDen
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v => v -> (teleport + dampNum * in.getOrElse(v, 0L) / dampDen)).toMap
    }
    r
  }
}
