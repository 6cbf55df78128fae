package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Components

/** Connected components (large-star/small-star) differential-tested
  * against a naive union-find, including the adversarial shapes: long
  * chains (diameter >> round count), merged cliques, and singletons. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Both execution paths of the hybrid: localFinishEdges = 0 forces
    * pure distributed star rounds; the default threshold routes these
    * small graphs through the single-task union-find finish. */
  private def runBoth(edges: Seq[(Long, Long)]): Seq[Map[Long, Long]] =
    Seq(0L, 1000000L).map { thr =>
      Components.connectedComponents(edges.toDF("src", "dst"), "src", "dst",
          localFinishEdges = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

  test("chain of 60 nodes collapses to one component (diameter >> rounds)") {
    val chain = (0L until 59L).map(i => (i, i + 1))
    for (got <- runBoth(chain))
      assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("two cliques plus a bridge merge; disjoint cliques stay apart") {
    val cliqueA = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val cliqueC = for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)
    for (got <- runBoth(cliqueA ++ cliqueB ++ cliqueC ++ Seq((4L, 10L)))) {
      assert(((0L to 4L) ++ (10L to 14L)).forall(n => got(n) == 0L))
      assert((20L to 24L).forall(n => got(n) == 20L))
    }
  }

  test("random graphs match naive union-find on both paths") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = naive(edges)
      for ((got, path) <- runBoth(edges).zip(Seq("star", "local")))
        assert(got == want, s"trial $trial ($path): diff=${
          (got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    }
  }

  test("mid-loop local finish (one star round, then threshold hit) is exact") {
    // 150 random edges contract below 120 after round 1 but not at entry,
    // so the loop runs at least one distributed round and then switches.
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(150)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val got = Components.connectedComponents(edges.toDF("src", "dst"),
        "src", "dst", localFinishEdges = edges.distinct.size - 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive(edges))
  }

  test("no checkpoint storage blocks survive dedupClusters + release") {
    // localCheckpoint registers its RDD in sc.persistentRdds;
    // Dataset.unpersist() would NOT remove it (CacheManager only).
    // The loop must free each superseded round and release() the rest.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = (1L to 40L).toDF("doc_id")
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Components.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
    assert(out.count() == 40)          // consume the result first
    Components.release(out)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDDs: $leaked")
    // and the pure star-round path frees every superseded round too
    val out2 = Components.connectedComponents(
      pairs.toDF("src", "dst"), "src", "dst", localFinishEdges = 0L)
    assert(out2.count() == 20)
    Components.release(out2)
    val leaked2 = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked2.isEmpty, s"leaked persistent RDDs (star path): $leaked2")
  }

  test("updateClusters folds batches incrementally, equal to full recomputation") {
    val rng = new scala.util.Random(17)
    // random pair stream over 120 nodes, delivered in 3 batches —
    // includes merges of previously-separate clusters by construction
    val allPairs = Seq.fill(90)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val batches = allPairs.grouped((allPairs.size + 2) / 3).toSeq
    var map = Seq.empty[(Long, Long)].toDF("id", "cluster")
    var seen = Seq.empty[(Long, Long)]
    batches.foreach { batch =>
      seen = seen ++ batch
      map = Components.updateClusters(map, "id", "cluster",
        batch.toDF("id_a", "id_b"), "id_a", "id_b")
      val got = map.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = Components.connectedComponents(
          seen.toDF("src", "dst"), "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"after ${seen.size} pairs")
    }
  }

  test("updateClusters: broadcast-join fallback (inSetMax = 0) equals the isin fast path") {
    // same differential as above but with the In-list threshold forced
    // to 0, so every fold takes the large-endpoint-set broadcast path
    val rng = new scala.util.Random(29)
    val allPairs = Seq.fill(90)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val batches = allPairs.grouped((allPairs.size + 2) / 3).toSeq
    var map = Seq.empty[(Long, Long)].toDF("id", "cluster")
    var seen = Seq.empty[(Long, Long)]
    batches.foreach { batch =>
      seen = seen ++ batch
      map = Components.updateClusters(map, "id", "cluster",
        batch.toDF("id_a", "id_b"), "id_a", "id_b", inSetMax = 0)
      val got = map.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = Components.connectedComponents(
          seen.toDF("src", "dst"), "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"after ${seen.size} pairs (fallback path)")
    }
  }

  test("updateClusters: untouched clusters pass through; merges relabel to the min") {
    val prev = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (50L, 50L), (51L, 50L)).toDF("id", "cluster")
    // one pair bridges clusters 1 and 10; cluster 50 is untouched
    val next = Components.updateClusters(prev, "id", "cluster",
      Seq((2L, 11L)).toDF("id_a", "id_b"), "id_a", "id_b")
    val got = next.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      50L -> 50L, 51L -> 50L))
    Components.release(next)
  }

  test("updateClusters: self-pairs and null endpoints are no-ops, not deletions") {
    val prev = Seq((7L, 7L), (8L, 8L), (9L, 8L)).toDF("id", "cluster")
    val got = Components.updateClusters(prev, "id", "cluster",
        Seq((Some(7L), Some(7L)), (Some(8L), Option.empty[Long]))
          .toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(7L -> 7L, 8L -> 8L, 9L -> 8L))
  }

  test("empty edge list yields empty labels; dedupClusters makes singletons") {
    assert(runBoth(Seq.empty).forall(_.isEmpty))
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val got = Components.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true), (3L, 1L, false), (4L, 4L, true)))
  }

  test("dedupClustersBy keeps the best-ranked member, min id on ties; labels stay min-id") {
    // cluster {1,3,5}: quality peaks at 3 → rep moves off the min id;
    // cluster {2,4}: tied quality → min id 2 wins; 6 is a singleton
    val docs = Seq(
      (1L, 0.2), (3L, 0.9), (5L, 0.4),
      (2L, 0.7), (4L, 0.7),
      (6L, 0.1)).toDF("doc_id", "quality")
    val pairs = Seq((1L, 3L), (3L, 5L), (2L, 4L)).toDF("id_a", "id_b")
    val got = Components.dedupClustersBy(docs, "doc_id", "quality",
        pairs, "id_a", "id_b")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got == Map(
      1L -> (1L, false), 3L -> (1L, true), 5L -> (1L, false),
      2L -> (2L, true), 4L -> (2L, false),
      6L -> (6L, true)))
    // partitioning-invariant (argmax is a deterministic total order)
    val again = Components.dedupClustersBy(docs.repartition(7), "doc_id",
        "quality", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(again == got)
  }
}
