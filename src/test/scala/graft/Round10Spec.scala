package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Graph, SnapshotDiff, TextAnalysis}
import graft.query.Temporal

/** Specs for the round-10 operator additions: top session paths (ev6),
  * PageRank (g1), SCD-2 time-travel diff (d14), TF-IDF keywords (t24).
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- ev6: top session paths --------------------------------------

  test("topPaths equals the brute-force session-path computation") {
    val rng = new scala.util.Random(7)
    val types = Vector("view", "click", "buy", "search")
    val evs = (0L until 400L).map { i =>
      (rng.nextInt(12).toLong, rng.nextInt(5000).toLong * 1000L, i,
        types(rng.nextInt(types.size)))
    }
    val gap = 300000L
    val df = evs.toDF("u", "ts", "eid", "ty")
    val got = Temporal.topPaths(df, "u", "ty", "ts", "eid",
        gapUs = gap, maxSteps = 3, k = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // brute force: per user sort by (ts, eid), split on gap, first 3
    val paths = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev != Long.MinValue && e._2 - prev > gap)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += e._4
        prev = e._2
      }
      sessions.map(_.take(3).mkString(">"))
    }
    val expect = paths.groupBy(identity).map { case (p, ps) => (p, ps.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }
      .zipWithIndex.map { case ((p, n), i) => (p, n, i + 1L) }
    assert(got.sortBy(_._3).toSeq == expect)
  }

  test("topPaths truncates to maxSteps and ranks ties by path text") {
    val df = Seq(
      (1L, 0L, 0L, "a"), (1L, 1L, 1L, "b"), (1L, 2L, 2L, "c"),
      (2L, 0L, 3L, "b"), (3L, 0L, 4L, "a"), (3L, 1L, 5L, "b"))
      .toDF("u", "ts", "eid", "ty")
    val got = Temporal.topPaths(df, "u", "ty", "ts", "eid",
        gapUs = 10L, maxSteps = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._3)
    // "a>b" twice; "b" once — tie-free here, but user 1's path is cut
    // at 2 steps
    assert(got == Seq(("a>b", 2L, 1L), ("b", 1L, 2L)))
  }

  test("topPaths on an empty frame returns no rows") {
    val empty = Seq.empty[(Long, Long, Long, String)].toDF("u", "ts", "eid", "ty")
    assert(Temporal.topPaths(empty, "u", "ty", "ts", "eid", 10L).count() == 0)
  }

  // ---- g1: PageRank -------------------------------------------------

  /** Dense reference power iteration (same conventions: fixed steps,
    * dangling mass lost). */
  private def densePr(edges: Seq[(Long, Long, Double)], iters: Int,
      d: Double): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val w = edges.groupBy(e => (e._1, e._2))
      .map { case (k, es) => k -> es.map(_._3).sum }
    val outw = w.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    var r = nodes.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map
        .empty[Long, Double].withDefaultValue(0.0)
      w.foreach { case ((s, t), wt) => contrib(t) += r(s) * wt / outw(s) }
      r = nodes.map(v => v -> ((1 - d) / n + d * contrib(v))).toMap
    }
    r
  }

  test("pageRank matches dense power iteration on a random directed graph") {
    val rng = new scala.util.Random(11)
    val edges = (0 until 150).map { _ =>
      (rng.nextInt(20).toLong, rng.nextInt(25).toLong,
        (1 + rng.nextInt(4)).toDouble)
    }.filter(e => e._1 != e._2)
    val got = Graph.pageRank(edges.toDF("s", "t", "w"), "s", "t", "w",
        iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = densePr(edges, 4, 0.85)
    assert(got.keySet == expect.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - expect(v)) < 1e-9,
      s"node $v: $r vs ${expect(v)}") }
  }

  test("pageRank on a symmetric graph conserves mass; hub outranks leaves") {
    // star: hub 0 — leaves 1..6, undirected unit weights
    val star = (1L to 6L).flatMap(l => Seq((0L, l, 1.0), (l, 0L, 1.0)))
    val got = Graph.pageRank(star.toDF("s", "t", "w"), "s", "t", "w",
        iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert((1L to 6L).forall(l => got(0L) > got(l)))
    // dangling convention: drop the leaf->hub back-edges and mass leaks
    val directed = (1L to 6L).map(l => (0L, l, 1.0))
    val sum2 = Graph.pageRank(directed.toDF("s", "t", "w"), "s", "t", "w",
        iterations = 3)
      .collect().map(_.getDouble(1)).sum
    assert(sum2 < 1.0 - 1e-6)
  }

  // ---- d14: SCD-2 time-travel diff ----------------------------------

  test("asOfDiff over a history equals diff over the raw snapshots") {
    // keys 0..59: v2 edits %7, drops %9; v3 edits %5, re-adds
    def text(k: Long, v: Int): Option[String] = v match {
      case 1 => Some(s"base $k")
      case 2 => if (k % 9 == 0) None
        else Some(if (k % 7 == 0) s"base $k r2" else s"base $k")
      case _ => Some(if (k % 5 == 0) s"base $k r3"
        else if (k % 7 == 0) s"base $k r2" else s"base $k")
    }
    def snap(v: Int) = (0L until 60L).flatMap(k => text(k, v).map(t => (k, t)))
    val stack = (1 to 3).flatMap(v => snap(v).map { case (k, t) => (k, v.toLong, t) })
      .toDF("id", "version", "t")
      .select(col("id"), col("version"), md5(col("t")).as("digest"))
    val hist = SnapshotDiff.scdHistory(stack, "id", "version", "digest")

    for ((vo, vn) <- Seq((1L, 2L), (2L, 3L), (1L, 3L))) {
      val got = SnapshotDiff.asOfDiff(hist, "id", "digest", vo, vn)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = SnapshotDiff.diff(
          snap(vo.toInt).toDF("id", "t"), snap(vn.toInt).toDF("id", "t"),
          "id", "t")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"v$vo -> v$vn")
    }
    // the 1->2 audit must contain the removed leg (%9 drops)
    val d12 = SnapshotDiff.asOfDiff(hist, "id", "digest", 1L, 2L)
      .filter(col("status") === "removed").collect().map(_.getLong(0)).sorted
    assert(d12.toSeq == (0L until 60L).filter(_ % 9 == 0))
  }

  // ---- t24: TF-IDF keywords ------------------------------------------

  test("tfidfKeywords hand-computed on a tiny corpus") {
    val docs = Seq(1L -> "a b a", 2L -> "a c", 3L -> "c d")
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .sortBy(t => (t._1, t._6))
    def ln(x: Double) = math.log(x)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // N=3; df: a=2 b=1 c=2 d=1
    val expect = Seq(
      (1L, "b", 1L, 1L, r6(ln(3.0)), 1L),
      (1L, "a", 2L, 2L, r6(2 * ln(1.5)), 2L),
      (2L, "a", 1L, 2L, r6(ln(1.5)), 1L),   // a/c tie at 6 dp -> term order
      (2L, "c", 1L, 2L, r6(ln(1.5)), 2L),
      (3L, "d", 1L, 1L, r6(ln(3.0)), 1L),
      (3L, "c", 1L, 2L, r6(ln(1.5)), 2L))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
        g._4 == e._4 && g._6 == e._6, s"$g vs $e")
      assert(math.abs(g._5 - e._5) < 1e-9, s"$g vs $e")
    }
  }

  test("tfidfKeywords keeps at most k terms per doc and skips empty docs") {
    val docs = Seq(1L -> "w1 w2 w3 w4 w5", 2L -> "   ", 3L -> "")
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect()
    assert(got.map(_.getLong(0)).distinct.toSeq == Seq(1L))
    assert(got.length == 2)
  }
}
