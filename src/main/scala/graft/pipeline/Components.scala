package graft.pipeline

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair graphs — the step
  * that turns pairwise dedup output (d2/d3/d4/d5) into disjoint
  * clusters with one kept representative per cluster.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * shape that survives 100 TB. Each round is a constant number of
  * groupBy/join shuffles on dense integer keys (AQE-splittable, skew
  * bounded by the highest-degree node), and the round count is
  * O(log n) with rapid edge-set shrinkage in practice — unlike naive
  * label propagation, whose round count is the graph DIAMETER
  * (a 10⁶-doc duplicate chain would need 10⁶ shuffles). No GraphX: the
  * edge list stays a DataFrame end to end.
  */
object Components {

  /** (u, v) with u ≠ v, both directions present. */
  private def symmetrize(e: DataFrame): DataFrame =
    e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u") =!= col("v"))

  /** Large-star: every neighbor v > u re-attaches to m = min(Γ(u)∪{u}).
    * Strictly decreases large-neighbor edges; keeps components intact. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nb = symmetrize(e)
    val mins = nb.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
    nb.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Small-star: orient edges downward (u > v); u and all its smaller
    * neighbors re-attach to their minimum m. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = or.groupBy("u").agg(min(col("v")).as("m"))
    val reattached = or.join(mins, Seq("u"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    val center = mins.select(col("u").as("src"), col("m").as("dst"))
    reattached.union(center).distinct()
  }

  /** Storage blocks created by `localCheckpoint()` live on the wrapped
    * RDD (the `LogicalRDD` leaf's `rdd`), NOT in the CacheManager —
    * `Dataset.unpersist()` is a no-op for them and they otherwise wait
    * for GC + ContextCleaner. Unpersist the backing RDDs directly so a
    * long-lived session doesn't accumulate one block set per CC round. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Free the checkpoint blocks backing a frame returned by
    * [[connectedComponents]]/[[dedupClusters]] once the caller has
    * consumed (or persisted) the result. After this the frame can no
    * longer be recomputed. */
  def release(df: DataFrame): Unit = freeCheckpoint(df)

  /** Single-threaded min-label union-find over longs — shared by the
    * executor-side [[localUnionFind]] finisher and [[updateClusters]]'
    * driver fast path (one implementation, used both sides of the
    * serialization boundary; instantiate inside a closure to avoid
    * capture). `find` is iterative with full path compression: a
    * recursive find would recurse once per chain link, and a
    * degenerate million-edge chain overflows the calling thread's
    * stack. The smaller root always wins, so labels are
    * iteration-order-independent. */
  private[pipeline] final class MinUnionFind {
    private val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (c != r) { val nxt = parent.getOrElse(c, c); parent.update(c, r); c = nxt }
      parent.update(r, r)
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.update(math.max(ra, rb), math.min(ra, rb))
    }
    /** (member, root) for every id `find`/`union` ever touched. */
    def labeled: Iterator[(Long, Long)] =
      parent.keysIterator.toArray.iterator.map(k => (k, find(k)))
  }

  /** Exact min-label union-find over an edge frame, in ONE task.
    * The finishing move of the hybrid: once the (contracted) edge set
    * fits a single executor task, each further distributed star round
    * costs several shuffle/job round-trips to move a few thousand rows
    * — a single mapPartitions pass with path compression labels the
    * remainder in milliseconds. Executor-side, not a driver collect;
    * memory is bounded by the caller's edge-count threshold. */
  private def localUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.select(col("src"), col("dst")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val uf = new MinUnionFind
        it.foreach { case (a, b) => uf.union(a, b) }
        uf.labeled
      }
      .toDF("node", "component")
  }

  /** Connected components of the undirected graph given as an edge
    * list. Returns (node, component) for every node that appears in an
    * edge, where component = the minimum node id of its component.
    *
    * CONTRACT: `srcCol`/`dstCol` must be (castable to) integral ids —
    * labels are component-minimum under numeric total order, and under
    * Spark 4 ANSI mode a non-numeric string id throws
    * CAST_INVALID_INPUT at runtime. Hash non-numeric ids to longs
    * upstream (cf. `Dedup.withShingles`' id contract).
    *
    * HYBRID: distributed large-star/small-star rounds contract the
    * graph while it is big; as soon as the current edge count (free —
    * it rides the convergence signature) drops to
    * `localFinishEdges` or below, the remainder is labeled exactly by
    * [[localUnionFind]] in one task. A billion-edge pair graph runs
    * a few star rounds (each shrinks edges superlinearly) and finishes
    * locally instead of paying O(log n) more multi-shuffle rounds on a
    * vanishing edge set; a graph already under the threshold skips the
    * loop entirely. Set `localFinishEdges = 0` to force pure star
    * rounds (the spec does, to exercise both paths).
    *
    * Convergence of the star loop is detected by an order-insensitive
    * edge-set signature (count + XOR of per-edge hashes) — one cheap
    * aggregate per round instead of a full `except` anti-join — then
    * confirmed ONCE by an exact `except` when the signature first
    * repeats, so even a 2⁻⁶⁴ hash collision between different edge
    * sets cannot end the loop early. `maxIter` is a safety bound; the
    * alternation provably converges in O(log² n) rounds (O(log n) in
    * practice) and the require() makes a silent partial result
    * impossible.
    *
    * The returned frame is backed by checkpoint blocks; call
    * [[release]] when done with it (every superseded round's blocks
    * are freed eagerly inside the loop). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, localFinishEdges: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    // localCheckpoint (eager), NOT persist: persist caches rows but the
    // logical plan still nests — each round references the previous
    // plan from both the groupBy and the join side, so the plan tree
    // DOUBLES per round and analysis/explain blows up exponentially
    // after ~10 rounds. Checkpointing truncates lineage to the
    // materialized data. (On a cluster where executor loss matters,
    // set spark.checkpoint.dir and swap localCheckpoint → checkpoint:
    // same contract, storage-backed.)
    var e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()

    // bit_xor, not sum: a sum of uniform 64-bit hashes overflows, which
    // ANSI mode (Spark 4 default) turns into a runtime error; XOR is
    // order-insensitive and overflow-free, and both rounds' edge sets
    // are distinct() so multiset cancellation can't produce a false match
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(e)
    // star rounds preserve both connectivity and node presence (every
    // non-min node keeps an edge toward a smaller neighbor; component
    // minima appear as dst), so finishing locally at ANY round boundary
    // labels the same node set with the same component minima.
    def finishLocally(edges0: DataFrame): DataFrame = {
      val out = localUnionFind(edges0).localCheckpoint()
      freeCheckpoint(edges0)
      out
    }
    if (sig._1 <= localFinishEdges) return finishLocally(e)

    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      if (nextSig._1 <= localFinishEdges) { freeCheckpoint(e); return finishLocally(next) }
      // exact confirmation runs at most once per convergence (both
      // sides are distinct() sets of equal count, so one-directional
      // except-is-empty ⇒ set equality); e's blocks are freed only
      // AFTER the except that reads them (lineage is truncated)
      converged = nextSig == sig && next.except(e).isEmpty
      freeCheckpoint(e)
      e = next
      sig = nextSig
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // fixpoint edges are stars (node → component min); the centers
    // themselves appear only as dst, so union them back as self-labels.
    // Eagerly checkpointed, so freeing e's blocks below is safe.
    val out = e.select(col("src").as("node"), col("dst").as("component"))
      .union(e.select(col("dst").as("node"), col("dst").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
      .localCheckpoint()
    freeCheckpoint(e)
    out
  }

  /** Incrementally fold a batch of NEW pairs into an existing
    * (id, cluster) map — live duplicate clusters for an appending or
    * streaming corpus, without re-running CC over every pair ever seen.
    *
    * Correctness: a cluster map IS the contraction of the processed
    * graph (one star edge per member), and contraction preserves
    * connectivity — so CC over (touched stars ∪ new pairs) equals CC
    * over the full history restricted to touched clusters, and
    * untouched clusters pass through byte-identical (ComponentsSpec
    * pins the differential against full recomputation). Cluster labels
    * stay component minima, so a merge relabels to the smaller id.
    *
    * Cost shape: the touched-cluster id set is bounded by the batch's
    * pair endpoints — so the previous map is filtered map-side, never
    * shuffled. Up to `inSetMax` endpoints (gated FIRST, on an
    * endpoints-only collect — distinct pairs can be quadratic in
    * endpoints, so nothing pair-shaped crosses to the driver before
    * this gate passes) the whole MERGE STRUCTURE is computed
    * driver-side: the batch's connectivity is contracted to cluster
    * LABELS executor-side (same-cluster pairs collapse to dropped
    * self-loops; per-partition dedup + a 4×inSetMax per-partition cap
    * with an overflow sentinel bound the transfer), a union-find over
    * those labels yields the relabel map (min-label wins — identical
    * convention to [[connectedComponents]]' localUnionFind over
    * member ids, because every label is the min of its members), and
    * the output is three scan-side legs: clusters whose label is
    * unchanged pass through under an isin() complement, changed
    * members relabel through a literal-map `element_at` projection,
    * and never-seen endpoints append as a driver-literal frame. No
    * distributed CC, no checkpoints, no join — per fold that deletes
    * the subgraph-CC's signature/checkpoint/union-find jobs (~5 jobs +
    * their plan-analysis latency). Beyond the endpoint gate (or on
    * sentinel overflow) the touched set goes through broadcast
    * semi/anti joins + the distributed CC loop on touched stars ∪ new
    * pairs (graceful at any size).
    * At 100 TB, bucket the persisted map by cluster so the semi-join
    * prunes files too. Same numeric-id contract as
    * [[connectedComponents]]; [[release]] the result when consumed. */
  def updateClusters(prev: DataFrame, idCol: String, clusterCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String,
      inSetMax: Int = 32768): DataFrame = {
    val spark = prev.sparkSession
    import spark.implicits._
    // self-pairs carry no connectivity but would mark their node's
    // cluster touched while contributing only filtered-out self-loop
    // edges — a lone singleton would be anti-joined away and never
    // re-emitted. Drop them before computing the touched set.
    val realPairs = pairs
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .filter(col("src") =!= col("dst"))
    // the touched endpoints, driver-side: micro-batch sized BY
    // CONTRACT, gathered as ONE shuffle-free single-stage job.
    // Per-partition dedup ahead of the collect (the temperatureMix
    // idiom): a match-heavy batch can emit many pairs per endpoint,
    // so what crosses to the driver is bounded by distinct endpoints
    // × partitions, not by the pair count. Collected BEFORE anything
    // pair-shaped: distinct pairs can be quadratic in endpoints, so
    // the endpoint count is the gate that decides whether pairs may
    // come to the driver at all.
    val endIds: Array[Long] = {
      val seen = new java.util.HashSet[Long]()
      realPairs.select(col("src"), col("dst")).as[(Long, Long)]
        .mapPartitions { it =>
          val s = new java.util.HashSet[Long]()
          it.foreach { case (a, b) => s.add(a); s.add(b): Unit }
          s.iterator().asScala
        }.collect().foreach(id => seen.add(id): Unit)
      val out = new Array[Long](seen.size)
      val it = seen.iterator(); var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    if (endIds.isEmpty)
      // no real pairs: every cluster passes through untouched
      return prev.select(col(idCol).cast("long").as(idCol),
        col(clusterCol).cast("long").as(clusterCol))
    // beyond `inSetMax` endpoints, literal In-lists and map literals
    // stop being a sane plan (analysis cost grows with the literal
    // count) and the fold goes back through the broadcast-join +
    // distributed-CC spelling, which degrades gracefully at any size —
    // the driver fast path is a micro-batch optimization, not a new
    // bound (the spec runs the differential on both paths via
    // inSetMax = 0)
    val prevT = prev.select(col(idCol).cast("long").as("id"),
      col(clusterCol).cast("long").as("_c"))
    val fast: Option[DataFrame] = if (endIds.length > inSetMax) None else {
      val endClusters = prev
        .filter(col(idCol).cast("long").isin(endIds.map(Long.box).toSeq: _*))
        .select(col(idCol).cast("long"), col(clusterCol).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the batch's connectivity, contracted to cluster LABELS before
      // it ever crosses to the driver: pairs inside one existing
      // cluster collapse to self-loops and are dropped executor-side,
      // so a template-heavy batch (k² near-identical docs already
      // sharing a cluster) ships ~nothing. Per-partition dedup + a
      // per-partition cap bound the transfer at partitions × cap even
      // adversarially; a capped partition emits a (-1,-1) sentinel
      // (impossible as a real label pair: equal-label pairs are
      // dropped before emit, so no emitted pair has la == lb) and the
      // fold falls back to the distributed leg instead of trusting a
      // truncated edge set.
      val cap = 4 * inSetMax
      val labelEdges: Array[(Long, Long)] =
        realPairs.select(col("src"), col("dst")).as[(Long, Long)]
          .mapPartitions { it =>
            val s = new java.util.LinkedHashSet[(Long, Long)]()
            var overflow = false
            it.foreach { case (a, b) =>
              if (!overflow) {
                val la = endClusters.getOrElse(a, a)
                val lb = endClusters.getOrElse(b, b)
                if (la != lb) {
                  val p = if (la < lb) (la, lb) else (lb, la)
                  if (s.contains(p) || s.size < cap) s.add(p): Unit
                  else overflow = true
                }
              }
            }
            (if (overflow) Iterator((-1L, -1L)) else Iterator.empty) ++
              s.iterator().asScala
          }.collect().distinct
      if (labelEdges.contains((-1L, -1L)) || labelEdges.length > cap) None
      else {
        // union-find over cluster labels, min-label-wins — the same
        // convention localUnionFind applies to member ids; equal
        // because each label is the min of its members, so min over
        // merged labels = min over merged members
        val uf = new MinUnionFind
        labelEdges.foreach { case (a, b) => uf.union(a, b) }
        def lbl(x: Long): Long = endClusters.getOrElse(x, x)
        // old label → merged label, for the labels that actually move
        val changed: Map[Long, Long] = endIds.iterator.map(lbl).toArray
          .distinct.iterator.map(l => l -> uf.find(l))
          .filter { case (o, n) => n != o }.toMap
        // endpoints never seen before appear as new map rows
        val newRows: Seq[(Long, Long)] = endIds.iterator
          .filterNot(endClusters.contains).map(id => (id, uf.find(id))).toVector
        val kept =
          if (changed.isEmpty) prevT
          else {
            val changedKeys: Seq[Any] = changed.keys.map(Long.box).toSeq
            // null-safe complement (a null cluster — which the map
            // invariant forbids anyway — must pass through, matching
            // the fallback leg's left_anti null semantics)
            prevT.filter(col("_c").isNull || !col("_c").isin(changedKeys: _*))
              .union(prevT.filter(col("_c").isin(changedKeys: _*))
                .select(col("id"),
                  element_at(typedLit(changed), col("_c")).as("_c")))
          }
        Some(kept.union(newRows.toDF("id", "_c"))
          .withColumnRenamed("id", idCol)
          .withColumnRenamed("_c", clusterCol))
      }
    }
    fast.getOrElse {
      val ends = realPairs.select(col("src").as("_id"))
        .union(realPairs.select(col("dst").as("_id"))).distinct()
      val touchedIds = ends.join(
          prev.select(col(idCol).cast("long").as("_id"),
            col(clusterCol).cast("long").as("_c")), Seq("_id"), "left")
        .select(coalesce(col("_c"), col("_id")).as("_c")).distinct()
        .localCheckpoint()
      val touched = prevT.join(broadcast(touchedIds), Seq("_c"), "left_semi")
        .select(col("id"), col("_c"))
      val untouched = prevT.join(broadcast(touchedIds), Seq("_c"), "left_anti")
        .select(col("id"), col("_c"))
      val edges = touched.select(col("id").as("src"), col("_c").as("dst"))
        .union(realPairs)
      val sub = connectedComponents(edges, "src", "dst")
      untouched.select(col("id"), col("_c").as("cluster"))
        .union(sub.select(col("node").as("id"), col("component").as("cluster")))
        .withColumnRenamed("id", idCol)
        .withColumnRenamed("cluster", clusterCol)
    }
  }

  /** Cluster assignment for a document table given near-dup pairs:
    * every doc gets a `cluster` (min doc id of its duplicate group;
    * singletons cluster as themselves) and `is_rep` marks the one row
    * per cluster a dedup pipeline keeps.
    *
    * CONTRACT (same as [[connectedComponents]]): `idCol` and the two
    * pair columns must be (castable to) integral ids — cluster labels
    * are group minima under numeric total order, and under Spark 4
    * ANSI mode a non-numeric string id throws CAST_INVALID_INPUT at
    * runtime. Hash non-numeric ids to longs upstream (cf.
    * `Dedup.withShingles`' id contract).
    *
    * The result references its checkpointed component map —
    * [[release]] it after the output is consumed or persisted. */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
      .withColumnRenamed("node", idCol)
    docs.select(col(idCol)).join(comp, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
      .withColumn("is_rep", col(idCol) === col("cluster"))
      .select(col(idCol), col("cluster"), col("is_rep"))
  }

  /** [[dedupClusters]] with the kept representative chosen by RANK
    * instead of min id: within each cluster the row with the greatest
    * `rankCol` wins, lowest id breaking ties — what a production
    * pipeline actually wants (keep the highest-QUALITY member of a
    * duplicate group, not whichever happened to get the smallest id).
    * Cluster LABELS stay min-id (stable identity, unchanged from
    * [[dedupClusters]]); only `is_rep` moves. `docs` must carry
    * `rankCol` non-null; the argmax is a map-side-combinable
    * `max_by(id, struct(rank, -id))` on the cluster key — one extra
    * shuffle at cluster cardinality, nothing corpus-sized.
    * Same id-castability contract and checkpoint lifetime as
    * [[dedupClusters]]. */
  def dedupClustersBy(docs: DataFrame, idCol: String, rankCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
      .withColumnRenamed("node", idCol)
    val labeled = docs.select(col(idCol), col(rankCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
    val reps = labeled.groupBy("cluster")
      .agg(max_by(col(idCol),
        struct(col(rankCol), (-col(idCol)).as("_negid"))).as("_rep"))
    labeled.join(reps, Seq("cluster"))
      .withColumn("is_rep", col(idCol) === col("_rep"))
      .select(col(idCol), col("cluster"), col(rankCol), col("is_rep"))
  }
}
