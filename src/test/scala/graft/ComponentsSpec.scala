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

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain of 60 nodes collapses to one component (diameter >> rounds)") {
    val chain = (0L until 59L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("two cliques plus a bridge merge; disjoint cliques stay apart") {
    val cliqueA = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val cliqueC = for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)
    val got = run(cliqueA ++ cliqueB ++ cliqueC ++ Seq((4L, 10L)))
    assert(((0L to 4L) ++ (10L to 14L)).forall(n => got(n) == 0L))
    assert((20L to 24L).forall(n => got(n) == 20L))
  }

  test("random graphs match naive union-find") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = run(edges)
      val want = naive(edges)
      assert(got == want, s"trial $trial: diff=${
        (got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    }
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
  }

  test("empty edge list yields empty labels; dedupClusters makes singletons") {
    assert(run(Seq.empty).isEmpty)
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val got = Components.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true), (3L, 1L, false), (4L, 4L, true)))
  }
}
