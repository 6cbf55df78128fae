package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.{Graph, Retrieval, Sharding, TextAnalysis}

/** Specs for the round-13 operator additions: deterministic label
  * propagation (g4), Dirichlet query likelihood (r10), the two-phase
  * distributed globalRank behind ev10's RFM quintiles, and pairwise
  * Jensen–Shannon divergence (t27). w7/w8 (pivot/melt) are Spark
  * built-ins pinned by the double-SF oracle hash alone.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- g4: label propagation ---------------------------------------

  /** Sequential replay of synchronous frequency-vote label propagation
    * with the (count desc, label asc) tie-break. */
  private def bruteLabelProp(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val nbrs = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var labels = nbrs.keys.map(v => v -> v).toMap
    (1 to rounds).foreach { _ =>
      labels = nbrs.map { case (v, ns) =>
        val votes = ns.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        v -> votes.toSeq.maxBy { case (l, c) => (c.toLong, -l) }._1
      }
    }
    labels
  }

  test("labelPropagate equals sequential replay on a random graph") {
    val rng = new scala.util.Random(31)
    val edges = (0 until 120).map { _ =>
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong)
    }.filter { case (a, b) => a != b }
    for (rounds <- Seq(1, 3)) {
      val got = Graph.labelPropagate(edges.toDF("a", "b"), "a", "b", rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteLabelProp(edges, rounds), s"rounds=$rounds")
    }
  }

  test("labelPropagate keeps two bridged triangles in distinct communities") {
    // triangles {1,2,3} and {10,11,12} joined by bridge 3-10: frequency
    // voting must NOT flood one triangle's label across the bridge
    // (min-label flooding — connected components — would merge them)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val got = Graph.labelPropagate(edges.toDF("a", "b"), "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(10L, 11L, 12L).map(got)
    assert(left.intersect(right).isEmpty,
      s"bridge flooded a label across communities: $got")
    assert(got == bruteLabelProp(edges, 3))
  }

  // ---- g5: multi-source BFS ------------------------------------------

  /** Sequential multi-source BFS reference. */
  private def bruteBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      maxHops: Int): Map[Long, Int] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val nbrs = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    (1 to maxHops).foreach { i =>
      val next = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> i)
      frontier = next
    }
    dist
  }

  test("bfs equals sequential multi-source BFS on a random graph") {
    val rng = new scala.util.Random(43)
    val edges = (0 until 150).map { _ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong)
    }.filter { case (a, b) => a != b }
    val seeds = Set(0L, 7L)
    val got = Graph.bfs(edges.toDF("a", "b"), "a", "b",
        seeds.toSeq.toDF("node"), "node", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == bruteBfs(edges, seeds, 3))
  }

  test("bfs on a path graph: hop ring truncates at maxHops") {
    // path 1-2-3-4-5-6 seeded at 1: dist = position - 1, cut at 2 hops
    val edges = (1L to 5L).map(i => (i, i + 1))
    val got = Graph.bfs(edges.toDF("a", "b"), "a", "b",
        Seq(1L).toDF("node"), "node", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  // ---- ev11: growth accounting ----------------------------------------

  test("growth accounting: class counts tie out against DAU identities") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
    val got = graft.queries.Relational.ev11GrowthAccounting(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val dau = ev.select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every active day: new + retained + resurrected = DAU
    for ((day, n) <- dau)
      assert(got(day)._1 + got(day)._2 + got(day)._3 == n, s"day $day")
    // churned(d) = DAU(d-1) - retained(d): everyone active yesterday
    // either came back (retained) or churned
    for ((day, (_, ret, _, _)) <- got if dau.contains(day - 1))
      assert(got(day)._4 == dau(day - 1) - ret, s"churn at $day")
  }

  // ---- ev12: sweep-line peak concurrency -------------------------------

  test("peak concurrency equals a sequential sweep over the same sessions") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.ev12PeakConcurrency(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sequential reference: rebuild the same sessions then sweep in
    // (t, end-before-start, user) order, tracking the running max per day
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val ts = xs.map(_._2).sorted
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head; var last = ts.head
      ts.tail.foreach { t =>
        if (t - last > 1800000000L) { bounds += ((start, last)); start = t }
        last = t
      }
      bounds += ((start, last))
      bounds.map { case (s0, l0) => (u, s0, l0 + 1800000000L) }
    }
    val sweep = sessions.flatMap { case (u, s0, e0) =>
      Seq((e0, 0, u, -1L), (s0, 1, u, 1L))
    }.sortBy { case (t, tag, u, _) => (t, tag, u) }
    var conc = 0L
    val want = scala.collection.mutable.Map.empty[Long, Long]
    sweep.foreach { case (t, _, _, d0) =>
      conc += d0
      val day = t / 86400000000L
      want(day) = math.max(want.getOrElse(day, Long.MinValue), conc)
    }
    assert(got == want.toMap)
  }

  // ---- r10: Dirichlet query likelihood ------------------------------

  test("queryLikelihood matches the hand formula on a tiny corpus") {
    val docs = Seq(
      (1L, "a b a c"),   // dl=4, tf(a)=2
      (2L, "b b d"),     // dl=3
      (3L, "a d d e")    // dl=4, tf(a)=1
    ).toDF("id", "text")
    val qs = Seq((7L, "a"), (7L, "d")).toDF("qid", "term")
    val mu = 10.0
    val got = Retrieval.queryLikelihood(docs, "id", "text", qs, "qid", "term", mu)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // collection: total=11, cf(a)=3, cf(d)=3
    val total = 11.0; val cfA = 3.0; val cfD = 3.0
    def score(tfA: Double, tfD: Double, dl: Double): Double = {
      val s = (if (tfA > 0) math.log(1.0 + tfA * total / (mu * cfA)) else 0.0) +
        (if (tfD > 0) math.log(1.0 + tfD * total / (mu * cfD)) else 0.0)
      s + 2.0 * math.log(mu / (dl + mu))
    }
    assert(got.keySet == Set(1L, 2L, 3L)) // all share ≥1 query term
    assert(math.abs(got(1L) - score(2, 0, 4)) < 1e-12)
    assert(math.abs(got(2L) - score(0, 1, 3)) < 1e-12)
    assert(math.abs(got(3L) - score(1, 2, 4)) < 1e-12)
  }

  // ---- ev10 substrate: two-phase global rank -------------------------

  test("globalRank equals a single-partition row_number") {
    val rng = new scala.util.Random(37)
    val rows = (1L to 500L).map(i => (i, rng.nextInt(40))) // heavy ties
    val df = rows.toDF("id", "m").repartition(13)
    val got = Sharding.globalRank(df,
        Seq(col("m").desc, col("id").asc), "rk")
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = rows.sortBy { case (id, m) => (-m, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  // ---- t27: Jensen–Shannon divergence --------------------------------

  /** Direct full-union JSD (no intersection decomposition) — the
    * definition the operator's algebra must reproduce. */
  private def bruteJsd(a: Seq[String], b: Seq[String]): Double = {
    def dist(xs: Seq[String]) = {
      val c = xs.groupBy(identity).map { case (t, g) => t -> g.size.toDouble }
      val n = xs.size.toDouble
      c.map { case (t, x) => t -> x / n }
    }
    val (p, q) = (dist(a), dist(b))
    (p.keySet ++ q.keySet).toSeq.map { t =>
      val (pa, pb) = (p.getOrElse(t, 0.0), q.getOrElse(t, 0.0))
      val m = (pa + pb) / 2.0
      (if (pa > 0) 0.5 * pa * math.log(pa / m) else 0.0) +
        (if (pb > 0) 0.5 * pb * math.log(pb / m) else 0.0)
    }.sum
  }

  test("jsDivergence equals the direct full-union formula") {
    val rng = new scala.util.Random(41)
    val vocab = ('a' to 'p').map(_.toString)
    def corpus(n: Int) = (0 until n).map(_ => vocab(rng.nextInt(vocab.size)))
    val (ca, cb) = (corpus(300), corpus(200))
    val docs = (ca.grouped(30).map(ws => ("ga", ws.mkString(" "))) ++
      cb.grouped(25).map(ws => ("gb", ws.mkString(" ")))).toSeq
      .toDF("g", "text")
    val got = TextAnalysis.jsDivergence(docs, "g", "text").collect()
    assert(got.length == 1)
    assert(math.abs(got(0).getDouble(3) - bruteJsd(ca, cb)) < 1e-12)
    assert(got(0).getDouble(3) >= 0.0 && got(0).getDouble(3) <= math.log(2.0) + 1e-12)
  }

  test("jsDivergence: identical groups diverge by 0; disjoint vocab emits no pair") {
    val same = Seq(("x", "a b c a"), ("y", "a b c a")).toDF("g", "text")
    val gotSame = TextAnalysis.jsDivergence(same, "g", "text").collect()
    assert(gotSame.length == 1 && math.abs(gotSame(0).getDouble(3)) < 1e-15)
    // no shared token → no intersection row; the pair is absent (its
    // JSD would be the ln 2 ceiling) — documented operator contract
    val disj = Seq(("x", "a b"), ("y", "c d")).toDF("g", "text")
    assert(TextAnalysis.jsDivergence(disj, "g", "text").count() == 0)
  }
}
