package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components
  * ([[Components]]): PageRank over a weighted edge list — the
  * centrality measure a corpus pipeline runs over its similarity /
  * citation / co-occurrence graphs to pick canonical cluster
  * representatives and to weight sources (the "quality by linkage"
  * signal of web-corpus curation).
  *
  * Scale shape (100 TB): the canonical distributed formulation — per
  * iteration, the node-sized rank frame joins the out-weight-normalized
  * edge frame on the source key (one shuffle keyed by src) and the
  * contributions partial-aggregate onto the destination key (one
  * shuffle keyed by dst, combined map-side so a hub's million
  * in-edges collapse per-partition before moving). Nothing is ever
  * edge² and no per-node state leaves the executors. On a cluster,
  * bucket the edge table by src to delete the join shuffle entirely;
  * AQE's skew splitting handles hub destinations. The fixed-iteration
  * contract (no convergence test) keeps the run deterministic and
  * replayable on any engine — the battery oracle unrolls the same
  * iterations in SQL.
  */
object Graph {

  /** Weighted PageRank with `iterations` fixed power-iteration steps
    * and teleport factor `1 - damping`:
    *
    *   r₀(v)    = 1/N
    *   rᵢ₊₁(v)  = (1−damping)/N + damping · Σ_{u→v} rᵢ(u) · w(u,v)/outw(u)
    *
    * Edges are directed; pass both orientations for an undirected
    * graph. Multi-edges are summed into one weight. The node set is
    * every id appearing as src or dst. CONVENTION: a dangling node (no
    * out-edges) simply loses its mass — ranks then sum to < 1, the
    * standard simplification; on a symmetric (undirected) edge list
    * there are no dangling nodes and ranks sum to 1.
    *
    * Output: (node, rank) — exact doubles; round at the consumption
    * site. The whole `iterations`-deep program executes as ONE job at
    * the eager materialization; the edge and node frames are persisted
    * across their `iterations` reuses and released before returning.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.groupBy(col(srcCol).as("_s"), col(dstCol).as("_t"))
      .agg(sum(col(weightCol)).as("_w"))
      .persist()  // read 3x below (outw, en, nodes) — and its upstream
                  // (the caller's pair generation) is the expensive part
    val outw = e.groupBy("_s").agg(sum(col("_w")).as("_ow"))
    val en = e.join(outw, Seq("_s"))
      .select(col("_s"), col("_t"),
        (col("_w").cast("double") / col("_ow")).as("_f"))
      .persist()
    val nodes = e.select(col("_s").as("_v"))
      .union(e.select(col("_t").as("_v")))
      .distinct().persist()
    // Materialize the two frames the iteration chain reads `iterations`
    // times BEFORE building it — otherwise the first execution's
    // concurrent stages each recompute the un-cached edge pipeline.
    // nodes.count() doubles as N: a scalar aggregate action (never row
    // data on the driver), which lets the teleport/seed terms be plain
    // literals instead of a per-iteration one-row broadcast join.
    en.count()
    val n = nodes.count().toDouble
    e.unpersist(blocking = false)
    val r0 = nodes.select(col("_v"), lit(1.0 / n).as("_r"))
    // One shuffle per iteration, not two: the teleport term rides as a
    // one-row-per-node union leg INTO the contribution aggregate, so
    // the old nodes ⟕ contrib join (an extra broadcast + AQE stage
    // every iteration, ~2 scheduler jobs × iterations on small data)
    // disappears. Every node appears in the teleport leg, so node
    // coverage is unchanged; a node with no in-edges sums to exactly
    // the teleport term. Numerically this multiplies damping per edge
    // term instead of once per sum — an ulp-level reassociation far
    // below the 6-dp rounding every consumer applies.
    val teleport = nodes.select(col("_v"),
      lit((1.0 - damping) / n).as("_p"))
    val ranks = (1 to iterations).foldLeft(r0) { (r, _) =>
      // No broadcast hint on either side: forcing the node-sized rank
      // frame broadcast was measured ~1.7x SLOWER here (the broadcast
      // of r serializes each iteration on a driver collect round-trip,
      // while AQE's own choice overlaps stage materialization); let
      // AQE pick per stage.
      r.withColumnRenamed("_v", "_s")
        .join(en, Seq("_s"))
        .select(col("_t").as("_v"),
          (lit(damping) * col("_r") * col("_f")).as("_p"))
        .union(teleport)
        .groupBy("_v").agg(sum(col("_p")).as("_r"))
    }
    // eager materialization BEFORE releasing the persisted inputs the
    // plan reads `iterations` times (the LangModel.dsirWeights rule);
    // the checkpoint blocks are freed by the caller's session hygiene
    // (getPersistentRDDs covers localCheckpoint RDDs) or Components
    // .release-style cleanup.
    val out = ranks
      .select(col("_v").as("node"), col("_r").as("rank"))
      .localCheckpoint(true)
    Seq(en, nodes).foreach(_.unpersist(blocking = false))
    out
  }

  /** Per-node triangle counts + degree over an undirected simple graph
    * (pass any edge list; it is canonicalized to u < v and deduped).
    * Returns (node, degree, n_triangles) for every node that appears
    * in an edge.
    *
    * Algorithm: degree-ordered wedge closing (Suri & Vassilvitskii,
    * "Counting Triangles and the Curse of the Last Reducer", WWW 2011).
    * Each edge is oriented from its lower-(degree, id) endpoint to the
    * higher; every triangle then has exactly one apex with two
    * out-edges (its minimum-rank vertex), so wedges are enumerated
    * only at apexes and closed by one semi-ish join against the
    * canonical edge set — each triangle materializes exactly once.
    * The orientation is THE scale move: a celebrity node with 10⁶
    * neighbors is never a wedge apex (its rank is maximal), so no
    * reducer sees its Θ(deg²) wedge set; wedge volume is bounded by
    * Σ out-deg² with out-degrees capped at O(√m) by the ordering.
    * Three shuffles total (degree agg, wedge self-join on apex,
    * closure join on the wedge's far pair) — all equi-joins on ids,
    * AQE-splittable. */
  /** Link prediction over an undirected edge list: for every NON-edge
    * node pair sharing at least one neighbor, the common-neighbor
    * count and the Adamic–Adar score Σ_c 1/ln(deg(c)) over the shared
    * neighbors c — the classic "people you may know" / related-item
    * candidate generator run over co-occurrence graphs.
    *
    * Shape: adjacency (both orientations) → wedge self-join keyed by
    * the center c (each unordered endpoint pair enumerated once via
    * n₁ < n₂) → per-(u,v) partial aggregate → left-anti join against
    * the canonical edge set (a predicted link must not already exist).
    * Three id-keyed equi-shuffles, map-side-combined aggregate.
    *
    * Scale note: wedge volume is Σ_c C(deg(c), 2) — quadratic in HUB
    * degree, the same curse g2's triangle orientation dodges. It is
    * irreducible here (a non-edge pair has no canonical apex), so at
    * scale the standard move is capping or sampling super-hub centers
    * BEFORE this operator; Adamic–Adar already assigns them ~zero
    * weight (1/ln d), so a deg ≤ 10⁴-style cap changes scores only in
    * the noise. Callers pass a pre-thresholded substrate (here w ≥ 2
    * co-purchases) for exactly that reason.
    *
    * Every center in a wedge has deg ≥ 2, so ln(deg) ≥ ln 2 > 0 —
    * the Adamic–Adar division is always defined. */
  def linkPredict(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()  // read 3x: two adjacency orientations + the anti join
    val adj = e.select(col("u").as("c"), col("v").as("n"))
      .union(e.select(col("v").as("c"), col("u").as("n")))
    val deg = adj.groupBy("c").agg(count(lit(1)).as("d"))
    val wedges = adj
      .join(adj.select(col("c"), col("n").as("n2")), Seq("c"))
      .filter(col("n") < col("n2"))
    val scored = wedges.join(deg, Seq("c"))
      .select(col("n").as("u"), col("n2").as("v"), col("d"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("common"),
        sum(lit(1.0) / log(col("d"))).as("aa"))
    val out = scored.join(e, Seq("u", "v"), "left_anti")
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    out
  }

  /** Deterministic synchronous label propagation (community
    * detection): every node starts labeled with its own id; each round
    * all nodes simultaneously adopt the most frequent label among
    * their neighbors, ties broken by the smaller label. A fixed round
    * count (no convergence test) keeps the run deterministic and
    * replayable on any engine — the battery oracle unrolls the same
    * rounds as SQL CTEs, exactly the PageRank contract.
    *
    * CONTRACT: node ids must be NUMERIC (the smaller-label tie-break
    * is encoded as `max_by(struct(count, -label))`, which needs a
    * negatable id) — same contract as [[Components]]' large-star
    * ordering; hash string ids to longs first.
    *
    * Scale shape: per round, one shuffle keyed by the neighbor id
    * (labels ⋈ adjacency) and one map-side-combined aggregate keyed by
    * (node, label) whose argmax folds into the same pass — a hub's
    * million identical neighbor votes collapse per-partition before
    * moving. Nothing is ever edge² and no per-node state leaves the
    * executors; on a cluster, bucket the adjacency by neighbor id to
    * delete the join shuffle (the PageRank note).
    *
    * Unlike min-label flooding (= connected components), frequency
    * voting partitions dense regions: bridges lose the vote against
    * intra-community edges, so two cliques joined by one edge keep
    * distinct labels. */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val adj = e.select(col("u").as("c"), col("v").as("n"))
      .union(e.select(col("v").as("c"), col("u").as("n")))
      .persist()  // read `rounds` times by the iteration chain
    adj.count()   // materialize BEFORE building the chain (pageRank rule)
    val l0 = adj.select(col("c").as("_v")).distinct()
      .select(col("_v"), col("_v").as("_l"))
    val labels = (1 to rounds).foldLeft(l0) { (l, _) =>
      adj.join(l.select(col("_v").as("n"), col("_l")), Seq("n"))
        .groupBy(col("c"), col("_l"))
        .agg(count(lit(1)).as("_cnt"))
        .groupBy(col("c"))
        .agg(max_by(col("_l"), struct(col("_cnt"), -col("_l"))).as("_l"))
        .withColumnRenamed("c", "_v")
    }
    val out = labels
      .select(col("_v").as("node"), col("_l").as("label"))
      .localCheckpoint(true)
    adj.unpersist(blocking = false)
    out
  }

  /** Multi-source breadth-first search: shortest hop distance from any
    * seed node, out to `maxHops`. Returns (node, dist) for every node
    * reached — seeds at 0, unreached nodes absent.
    *
    * Delta-frontier formulation — THE property that makes distributed
    * BFS viable: round i joins the adjacency against only the nodes
    * FIRST discovered in round i−1 (not the whole reached set, and
    * never re-relaxing settled nodes), so total work is Σ_i
    * |frontier_i-adjacent edges| ≈ one pass over the reachable
    * edge set across all rounds, not rounds × edges. Each round is
    * one id-keyed equi-join + an anti join against the settled set;
    * frontiers are localCheckpointed (the [[Components]] idiom) so
    * round i+1's plan doesn't recompute rounds 1..i.
    *
    * Hop distances are integers — engine-exact, no rounding anywhere;
    * the battery oracle unrolls the same rounds as CTEs. */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val adj2 = e.select(col("u").as("c"), col("v").as("n"))
      .union(e.select(col("v").as("c"), col("u").as("n")))
      .persist()  // read once per round
    adj2.count()
    val s0 = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint(true)
    var settled = s0
    var frontier = s0
    (1 to maxHops).foreach { i =>
      val discovered = adj2
        .join(frontier.select(col("node").as("n")), Seq("n"))
        .select(col("c").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .withColumn("dist", lit(i))
        .localCheckpoint(true)
      settled = settled.union(discovered).localCheckpoint(true)
      frontier = discovered
    }
    adj2.unpersist(blocking = false)
    settled
  }

  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()  // read 4x: degree agg, orientation join, closure, node union
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .persist()
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("_du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("_dv")), Seq("v"))
      .select(
        when(col("_du") < col("_dv") ||
            (col("_du") === col("_dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("_o"))
      .select(col("_o.a").as("a"), col("_o.b").as("b"))
    val wedges = oriented
      .join(oriented.select(col("a"), col("b").as("c")), Seq("a"))
      .filter(col("b") < col("c"))
    val tris = wedges.join(e,
        least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_triangles"))
    val out = deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .localCheckpoint(true)
    Seq(e, deg).foreach(_.unpersist(blocking = false))
    out
  }
}
