package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural graph metrics over the committed similarity/co-occurrence
  * graphs — the descriptive complement to [[PageRank]]'s rank walks:
  * triangle counts + local clustering coefficients (how CLIQUISH a
  * node's neighbourhood is — over a kNN graph, a high-LCC region is a
  * tight near-duplicate/topic cluster, a low-LCC high-degree node is a
  * hub stitching unrelated content) and synchronous label propagation
  * (cheap community detection — the consolidation primitive that turns
  * pairwise near-dup edges into "keep one per community" curation
  * decisions without the components machinery's exactness cost).
  *
  * Hash-verifiability: triangle counts and degrees are exact integers;
  * the clustering coefficient is reported in 1e-6 fixed point via exact
  * integer division ((2·tri·1e6) div (deg·(deg−1))) — same discipline as
  * [[PageRank]], so every row replays bit-identically in any engine.
  * Label propagation is synchronous with a TOTAL deterministic order on
  * updates (max neighbour-label frequency, ties to the smallest label,
  * fixed round count) — no async scheduling nondeterminism.
  *
  * Scale design (the 100 TB story):
  *  - Triangles use the degree-ordered orientation of the classic
  *    MapReduce formulation (Suri & Vassilvitskii's "curse of the last
  *    reducer" fix): every undirected edge is oriented from its
  *    (degree, id)-smaller endpoint, which caps a node's oriented
  *    out-degree at O(√|E|), so wedge generation is O(|E|^{3/2}) total
  *    instead of Σ deg² — a single skewed hub cannot blow up one
  *    reducer. The pipeline is three shuffles: degree agg, wedge
  *    self-join on the pivot, closing-edge semi-join against the edge
  *    set. No driver state; nothing collects.
  *  - Label propagation is per round one |2E| equi-join (shuffle on
  *    src) + one (node, label) hash aggregation + one argmax
  *    aggregation — the Pregel lowering, same as [[PageRank.damped]],
  *    with linear lineage and a cadence checkpoint for high round
  *    counts.
  *
  * Block lifetime: checkpointed blocks are referenced only by the
  * returned frame's lineage (nothing memo-pinned), so harness loops that
  * unpersist between queries release them immediately — the r12
  * sourceEntropy-leak precedent.
  */
object GraphMetrics {

  /** Canonical undirected distinct edge set (u < v) from a directed edge
    * list; self-loops dropped (they cannot participate in a triangle and
    * would corrupt degrees). */
  private def undirect(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Per-node (node, deg, tri, lcc_fp) over the UNDIRECTED version of
    * `edges` (src, dst): `tri` = number of triangles through the node,
    * `lcc_fp` = local clustering coefficient in 1e-6 fixed point
    * (0 for deg < 2, by convention). Exactly one output row per node
    * with at least one edge.
    *
    * Each triangle {a,b,c} is enumerated exactly ONCE — at its
    * (degree, id)-minimal vertex, as an ordered wedge closed by a
    * semi-join — then credited to all three corners. The oracle may
    * enumerate in plain id order (simpler SQL); the triangle SET is
    * orientation-independent, so counts agree. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = undirect(edges).localCheckpoint()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    // orient from the (deg, id)-smaller endpoint: bounds oriented
    // out-degree at O(√|E|) (object scaladoc)
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint()
    // wedges at pivot a, leaf pair id-ordered so each candidate triangle
    // appears once; closed iff the id-ordered leaf pair is an edge
    val tri = oriented.as("o1")
      .join(oriented.as("o2"),
        col("o1.a") === col("o2.a") && col("o1.b") < col("o2.b"))
      .select(col("o1.a").as("x"), col("o1.b").as("y"), col("o2.b").as("z"))
      .join(und, col("y") === col("u") && col("z") === col("v"), "left_semi")
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") >= 2,
          call_function("div",
            lit(2000000L) * coalesce(col("tri"), lit(0L)),
            col("deg") * (col("deg") - 1)))
          .otherwise(lit(0L)).as("lcc_fp"))
  }

  /** Synchronous label propagation over the UNDIRECTED version of
    * `edges`, exactly `iters` rounds from the identity labelling
    * (label = node id). Per round every node adopts its neighbours'
    * most frequent previous-round label, ties broken to the SMALLEST
    * label — a total order, so the fixed-round run is deterministic and
    * replayable (synchronous LPA can oscillate on bipartite structure;
    * fixed rounds ARE the contract, as with [[PageRank.pageRankFp]]).
    * Isolated nodes cannot occur (every node comes from an edge).
    * Returns (node, label). */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16, got $iters")
    val und = undirect(edges)
    // both directions: a message crosses every undirected edge both ways
    val sym = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct().localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (it <- 1 to iters) {
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(sym("dst").as("node"), col("label"))
      val counts = msgs.groupBy("node", "label").agg(count(lit(1)).as("c"))
      // argmax as ONE hash aggregation (no window): struct max orders by
      // (count, -label), so the winner is max count, then smallest label
      val best = counts.groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      labels = nodes.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      // linear lineage — cadence checkpoint only (PageRank precedent)
      if (it % 4 == 0 && it < iters) labels = labels.localCheckpoint()
    }
    labels
  }

  /** Synchronous k-core peeling over the UNDIRECTED version of `edges`,
    * exactly `rounds` rounds: each round computes degrees in the current
    * subgraph and removes ALL nodes of degree < k simultaneously (and
    * their edges). Peeling is monotone, so once the k-core is reached the
    * remaining rounds are no-ops — fixed rounds make the run replayable
    * without a convergence test (the [[PageRank.pageRankFp]] contract),
    * and an unconverged R-round peel is a well-defined SUPERSET of the
    * k-core, stated rather than hidden. Returns (node, deg): the
    * surviving nodes that still carry at least one edge, with their
    * degree in the surviving subgraph.
    *
    * Scale: per round one |E| degree aggregation + two semi-joins of the
    * edge set against the keep set — all key-partitioned shuffles, no
    * driver state; lineage is linear per round with a cadence checkpoint
    * (two joins per round grow plans faster than the rank walks' one). */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"2 <= k <= 64, got $k")
    require(rounds >= 1 && rounds <= 16, s"1 <= rounds <= 16, got $rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var e = undirect(edges).localCheckpoint()
    for (it <- 1 to rounds) {
      val keep = degrees(e).where(col("deg") >= k).select("node")
      e = e
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
      if (it % 2 == 0 && it < rounds) e = e.localCheckpoint()
    }
    degrees(e)
  }

  /** Sentinel distance for not-yet-reached nodes in [[bfsHops]]: any
    * value strictly greater than the maximum round count (16) works —
    * relaxation only ever compares/increments it, and 1000+16 is nowhere
    * near overflow. Shared with the oracle SQL as a literal. */
  val BfsInf = 1000L

  /** Multi-source BFS over the UNDIRECTED version of `edges`: exactly
    * `rounds` synchronous relaxation rounds (dist_i(v) = min(dist_{i-1}
    * (v), 1 + min over neighbours u of dist_{i-1}(u)), seeds at 0) — the
    * Bellman-Ford lowering, deterministic because min is order-free, so
    * the run replays exactly with unrolled CTEs. Returns (node, hops)
    * for EVERY node, [[BfsInf]] marking nodes unreached within `rounds`
    * hops. Over a similarity graph this is the "how far from the curated
    * seed panel" curation feature. Seeds absent from the graph
    * contribute nothing (no node row exists for them).
    *
    * Scale: per round one |2E| equi-join + one |V| min-aggregation +
    * one |V| left join — the [[PageRank.damped]] shape; linear lineage,
    * cadence checkpoint. */
  def bfsHops(edges: DataFrame, seeds: Seq[Long], rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"1 <= rounds <= 16, got $rounds")
    require(seeds.nonEmpty && seeds.size <= 1024,
      s"seed panel must be 1..1024 literals, got ${seeds.size}")
    require(seeds.distinct.size == seeds.size, "duplicate seeds")
    val und = undirect(edges)
    val sym = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct().localCheckpoint()
    var dist = nodes.select(col("node"),
      when(col("node").isin(seeds: _*), lit(0L)).otherwise(lit(BfsInf))
        .as("hops"))
    for (it <- 1 to rounds) {
      val msgs = sym.join(dist, sym("src") === dist("node"))
        .select(sym("dst").as("node"), (col("hops") + 1).as("h"))
      val inc = msgs.groupBy("node").agg(min(col("h")).as("mh"))
      dist = dist.join(inc, Seq("node"), "left")
        .select(col("node"),
          least(col("hops"), coalesce(col("mh"), lit(BfsInf))).as("hops"))
      // linear lineage — cadence checkpoint only (PageRank precedent)
      if (it % 4 == 0 && it < rounds) dist = dist.localCheckpoint()
    }
    dist
  }

  /** Host-side sequential twin of [[bfsHops]] (spec cross-check only). */
  def referenceBfsHops(edges: Seq[(Long, Long)], seeds: Seq[Long],
                       rounds: Int): Map[Long, Long] = {
    val und = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter { case (u, v) => u != v }.distinct
    val sym = und ++ und.map { case (u, v) => (v, u) }
    val nbrs = sym.groupBy(_._2).map { case (n, xs) => n -> xs.map(_._1) }
    val nodes = sym.map(_._1).distinct
    val seedSet = seeds.toSet
    var dist = nodes.map(n => n -> (if (seedSet(n)) 0L else BfsInf)).toMap
    for (_ <- 1 to rounds) {
      dist = nodes.map { n =>
        val in = nbrs.getOrElse(n, Seq.empty).map(u => dist(u) + 1)
        n -> math.min(dist(n), if (in.isEmpty) BfsInf else in.min)
      }.toMap
    }
    dist
  }

  /** Host-side sequential twin of [[triangleStats]] (spec cross-check
    * only): (node → (deg, tri, lcc_fp)) by brute-force id-ordered
    * triangle enumeration. */
  def referenceTriangleStats(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long)] = {
    val und = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter { case (u, v) => u != v }.distinct
    val undSet = und.toSet
    val deg = (und.map(_._1) ++ und.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val adj = (und ++ und.map { case (u, v) => (v, u) })
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- und; w <- adj(u) if w > v && undSet((v, w))) {
      triPerNode(u) += 1; triPerNode(v) += 1; triPerNode(w) += 1
    }
    deg.map { case (n, d) =>
      val t = triPerNode(n)
      n -> (d, t, if (d >= 2) 2000000L * t / (d * (d - 1)) else 0L)
    }
  }

  /** Host-side sequential twin of [[kCore]] (spec cross-check only). */
  def referenceKCore(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, Long] = {
    var e = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter { case (u, v) => u != v }.distinct
    def degrees(es: Seq[(Long, Long)]): Map[Long, Long] =
      (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size.toLong }
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(_._2 >= k).keySet
      e = e.filter { case (u, v) => keep(u) && keep(v) }
    }
    degrees(e)
  }

  /** Host-side sequential twin of [[labelPropagation]] (spec cross-check
    * only). */
  def referenceLabelPropagation(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val und = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter { case (u, v) => u != v }.distinct
    val sym = und ++ und.map { case (u, v) => (v, u) }
    val nbrs = sym.groupBy(_._2).map { case (n, xs) => n -> xs.map(_._1) }
    val nodes = sym.map(_._1).distinct
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = nodes.map { n =>
        val freq = nbrs.getOrElse(n, Seq.empty).map(labels)
          .groupBy(identity).map { case (l, xs) => l -> xs.size }
        n -> (if (freq.isEmpty) labels(n)
              else freq.toSeq.maxBy { case (l, c) => (c, -l) }._1)
      }.toMap
    }
    labels
  }
}
