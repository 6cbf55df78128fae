package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Graph
import graft.query.Temporal

/** Specs for the round-12 operator additions: link prediction (g3)
  * and the daily trending leaderboard (ev9). a18's von Neumann η is
  * plain lag-window + groupBy arithmetic pinned by the double-SF
  * oracle hash (the a17 precedent).
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- g3: link prediction -----------------------------------------

  /** Brute-force common-neighbor / Adamic–Adar scores over canonical
    * u<v edges: every non-edge pair with ≥1 shared neighbor. */
  private def bruteLinkPredict(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Double)] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val eset = e.toSet
    val nbrs = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val nodes = nbrs.keys.toSeq.sorted
    (for {
      u <- nodes; v <- nodes if u < v && !eset((u, v))
      shared = nbrs(u).intersect(nbrs(v)) if shared.nonEmpty
    } yield (u, v) ->
      (shared.size.toLong, shared.toSeq.map(c => 1.0 / math.log(nbrs(c).size)).sum)
    ).toMap
  }

  test("linkPredict equals brute force on a random graph") {
    val rng = new scala.util.Random(29)
    val edges = (0 until 90).map { _ =>
      (rng.nextInt(16).toLong, rng.nextInt(16).toLong)
    }.filter { case (a, b) => a != b }
    val got = Graph.linkPredict(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val want = bruteLinkPredict(edges)
    assert(got.keySet == want.keySet)
    for ((k, (c, aa)) <- want) {
      assert(got(k)._1 == c, s"common mismatch at $k")
      assert(math.abs(got(k)._2 - aa) < 1e-9, s"aa mismatch at $k")
    }
  }

  test("linkPredict known graphs: path endpoint pair, square diagonals") {
    // path 1-2-3: the only prediction is (1,3) through center 2 (deg 2)
    val path = Seq((1L, 2L), (2L, 3L))
    val gotPath = Graph.linkPredict(path.toDF("a", "b"), "a", "b").collect()
    assert(gotPath.length == 1)
    assert((gotPath(0).getLong(0), gotPath(0).getLong(1), gotPath(0).getLong(2)) == (1L, 3L, 1L))
    assert(math.abs(gotPath(0).getDouble(3) - 1.0 / math.log(2.0)) < 1e-12)
    // square 1-2-3-4-1: both diagonals share 2 centers of degree 2;
    // existing edges must NOT appear
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val gotSq = Graph.linkPredict(sq.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(gotSq.toSeq == Seq((1L, 3L, 2L), (2L, 4L, 2L)))
  }

  // ---- ev9: trending leaderboard ------------------------------------

  test("trendingTypes: deltas, new-entrant nulls, ties, truncation") {
    val day = 86400000000L
    // day 0: a×3, b×2, c×1, d×1; day 1: a×1, b×3, e×2; day 3: a×2
    val ev = Seq.tabulate(3)(i => ("a", i * 100L))                ++
      Seq.tabulate(2)(i => ("b", 1000L + i))                     ++
      Seq(("c", 2000L), ("d", 3000L))                            ++
      Seq(("a", day + 1), ("e", day + 2), ("e", day + 3))        ++
      Seq.tabulate(3)(i => ("b", day + 100L + i))                ++
      Seq(("a", 3 * day + 1), ("a", 3 * day + 2))
    val got = Temporal.trendingTypes(ev.toDF("event_type", "ts_us"),
        "event_type", "ts_us", k = 3)
      .orderBy("day", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq == Seq(
      // day 0: ties c/d at n=1 break by name; only top-3 → d dropped
      (0L, 1L, "a", 3L, None), (0L, 2L, "b", 2L, None), (0L, 3L, "c", 1L, None),
      // day 1: b up by 1, e is a NEW ENTRANT (null delta), a down by 2
      (1L, 1L, "b", 3L, Some(1L)), (1L, 2L, "e", 2L, None),
      (1L, 3L, "a", 1L, Some(-2L)),
      // day 3: gap from day 1 → no delta even though a has history
      (3L, 1L, "a", 2L, None)))
  }

  test("trendingTypes: empty input degrades to empty output") {
    val empty = Seq.empty[(String, Long)].toDF("event_type", "ts_us")
    assert(Temporal.trendingTypes(empty, "event_type", "ts_us", 3).count() == 0)
  }

  // ---- r9: proximity ranking ----------------------------------------

  /** Brute-force proximity scores: every (pa, pb) occurrence pair with
    * |pa − pb| ≤ window. */
  private def bruteProximity(docs: Seq[(String, String)], ta: String,
      tb: String, window: Int): Map[String, (Long, Long)] =
    docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val pas = toks.zipWithIndex.collect { case (t, i) if t == ta => i }
      val pbs = toks.zipWithIndex.collect { case (t, i) if t == tb => i }
      val dists = for { a <- pas; b <- pbs; d = math.abs(a - b) if d <= window }
        yield d
      if (dists.isEmpty) None
      else Some(id -> (dists.length.toLong, dists.min.toLong))
    }.toMap

  test("proximityRank equals brute force incl. bucket boundaries") {
    // distances straddle the window (5) and its bucket edges: pos 4→5
    // (dist 1, adjacent buckets), 0→5 (dist exactly window), 0→6
    // (dist 6, excluded), repeated occurrences multiply pairs
    val docs = Seq(
      ("d1", "hash x x x join hash x x x x join"),
      ("d2", "hash x x x x join"),
      ("d3", "hash x x x x x join"),
      ("d4", "join x hash x join"),
      ("d5", "hash x x hash"),
      ("d6", ""))
    val q = Seq((1L, "hash", "join")).toDF("query_id", "term_a", "term_b")
    val got = graft.pipeline.Retrieval.proximityRank(
        docs.toDF("doc_id", "text"), "doc_id", "text", q,
        "query_id", "term_a", "term_b", window = 5, k = 10)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == bruteProximity(docs, "hash", "join", 5))
    // spot-check the straddle doc: pairs (0,4)=4, (0,9)... d1 positions:
    // hash@0,5? recompute: tokens: hash x x x join hash x x x x join
    // hash@{0,5}, join@{4,10}; dists: |0-4|=4 ok, |0-10|=10 no,
    // |5-4|=1 ok, |5-10|=5 ok (exactly window) → 3 pairs, min 1
    assert(got("d1") == (3L, 1L))
    assert(!got.contains("d3")) // dist 6 > window
    assert(!got.contains("d5")) // no second term
  }

  test("proximityRank: rank ties and truncation") {
    val docs = Seq(
      ("a", "p q"), ("b", "p q"), ("c", "p x q"), ("d", "p q p q"))
    val q = Seq((7L, "p", "q")).toDF("query_id", "term_a", "term_b")
    val got = graft.pipeline.Retrieval.proximityRank(
        docs.toDF("doc_id", "text"), "doc_id", "text", q,
        "query_id", "term_a", "term_b", window = 5, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // d has 4 pairs (p@0,2 × q@1,3 all within 5) → rank 1; a/b tie on
    // (1 pair, dist 1) → doc_id order; c (dist 2) cut by k=3
    assert(got.toSeq == Seq(("d", 4L, 1L, 1L), ("a", 1L, 1L, 2L),
      ("b", 1L, 1L, 3L)))
  }

  // ---- t26 / d15 helpers --------------------------------------------

  test("normalizeText collapses case, punctuation and spacing variants") {
    val got = Seq("Hello,  World!", "hello world", "HELLO-WORLD", " hello?world ",
        "hello  world2")
      .toDF("t")
      .select(graft.pipeline.TextAnalysis.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(got.take(4).forall(_ == "hello world"))
    assert(got(4) == "hello world2")
  }

  // ---- s12: deterministic IVF ---------------------------------------

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def sqd(a: Seq[Double], b: Seq[Double]): Double =
    r6(a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) })

  /** Sequential replay of the whole DetIvf contract: Lloyd (same
    * seeds/rounding/tiebreaks/carryover as Round11Spec's denseKmeans),
    * nprobe-cell probes, exact re-rank. */
  private def seqDetIvf(vs: Seq[(Long, Seq[Double])], qids: Set[Long],
      k: Int, iters: Int, nprobe: Int, topK: Int)
      : Seq[(Long, Long, Double, Long)] = {
    var cents = vs.sortBy(_._1).take(k)
    def assignAll = vs.map { case (id, v) =>
      val (c, d) = cents.map { case (c, cv) => (c, sqd(v, cv)) }
        .minBy { case (c, d) => (d, c) }
      (id, c, d)
    }
    for (_ <- 1 to iters) {
      val byC = assignAll.groupBy(_._2)
      cents = cents.map { case (c, cv) =>
        byC.get(c) match {
          case Some(members) =>
            val mv = members.map(m => vs.find(_._1 == m._1).get._2)
            c -> cv.indices.map(i => r6(mv.map(_(i)).sum / mv.size))
          case None => c -> cv
        }
      }
    }
    val cellOf = assignAll.map(a => a._1 -> a._2).toMap
    vs.filter(v => qids(v._1)).sortBy(_._1).flatMap { case (qid, qv) =>
      val probed = cents.map { case (c, cv) => (c, sqd(qv, cv)) }
        .sortBy { case (c, d) => (d, c) }.take(nprobe).map(_._1).toSet
      vs.filter { case (id, _) => id != qid && probed(cellOf(id)) }
        .map { case (id, v) => (id, sqd(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(topK).zipWithIndex
        .map { case ((id, d), i) => (qid, id, d, i + 1L) }
    }
  }

  test("DetIvf.topK equals the sequential IVF replay") {
    val rng = new scala.util.Random(41)
    val vs = (0L until 90L).map(i => i -> Seq.fill(5)(rng.nextDouble() * 2 - 1))
    val qids = Set(3L, 17L, 42L)
    val q = vs.filter(v => qids(v._1))
      .toDF("id", "v").select(col("id").as("qid"), col("v").as("qv"))
    val got = graft.pipeline.DetIvf.topK(vs.toDF("id", "v"), "id", "v",
        q, "qid", "qv", kCells = 6, iterations = 2, nprobe = 2, topK = 4)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val want = seqDetIvf(vs, qids, k = 6, iters = 2, nprobe = 2, topK = 4)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._4 == w._4, s"$g vs $w")
      assert(math.abs(g._3 - w._3) < 1e-9, s"$g vs $w")
    }
  }

  test("DetIvf with nprobe = kCells equals exact search") {
    val rng = new scala.util.Random(43)
    val vs = (0L until 60L).map(i => i -> Seq.fill(4)(rng.nextDouble()))
    val qids = Set(5L, 30L)
    val q = vs.filter(v => qids(v._1))
      .toDF("id", "v").select(col("id").as("qid"), col("v").as("qv"))
    val got = graft.pipeline.DetIvf.topK(vs.toDF("id", "v"), "id", "v",
        q, "qid", "qv", kCells = 5, iterations = 2, nprobe = 5, topK = 3)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val brute = qids.toSeq.sorted.flatMap { qid =>
      val qv = vs.find(_._1 == qid).get._2
      vs.filter(_._1 != qid).map { case (id, v) => (id, sqd(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(3).zipWithIndex
        .map { case ((id, _), i) => (qid, id, i + 1L) }
    }
    assert(got.toSeq == brute)
  }

  test("readability counts: hand-computed words/sentences/syllables") {
    import graft.pipeline.TextAnalysis._
    val r = Seq("The quick brown fox. It jumps! Over 12 lazy dogs? xyz crwth")
      .toDF("t")
      .select(letterWordCount(col("t")).as("w"), sentenceCount(col("t")).as("s"),
        syllableCount(col("t")).as("y"))
      .head()
    // words: The quick brown fox It jumps Over lazy dogs xyz crwth = 11
    // (digits don't count); sentences: . ! ? = 3; vowel runs: e, ui,
    // o, o, i, u, o+e, a+y, o, y = 12 ("xyz"→y counts, "crwth"→0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (11L, 3L, 12L))
    // unterminated text → 1 sentence; empty text → zero counts
    val r2 = Seq(("no terminator here", ""), ("", "")).toDF("t", "u")
      .select(sentenceCount(col("t")).as("s"), letterWordCount(col("u")).as("w"))
      .collect()
    assert(r2(0).getLong(0) == 1L)
    assert(r2.map(_.getLong(1)).sum == 0L)
  }
}
