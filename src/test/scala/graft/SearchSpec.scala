package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Retrieval

/** BM25 retrieval + chunking semantics, pinned against driver-side
  * reference computations, plus the st1 battery entry's stream≡batch
  * identity. */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "spark join spark filter"),          // tf(spark)=2, dl=4
    (2L, "spark merge sort sort sort merge"), // tf(spark)=1, dl=6
    (3L, "filter scan scan"),                 // no 'spark'
    (4L, ""),                                 // empty doc
    (5L, "spark")                             // dl=1
  ).toDF("doc_id", "text")

  test("bm25 equals a driver-side reference computation") {
    val qs = Seq((1L, "spark"), (1L, "filter"), (2L, "sort")).toDF("qid", "term")
    val got = Retrieval.bm25(docs, "doc_id", "text", qs, "qid", "term")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // reference: same formula by hand over the 5-doc corpus
    val corpus = Map(1L -> "spark join spark filter", 2L -> "spark merge sort sort sort merge",
      3L -> "filter scan scan", 4L -> "", 5L -> "spark")
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val (k1, b) = (1.2, 0.75)
    def score(qid: Long, terms: Seq[String]): Map[(Long, Long), Double] =
      toks.flatMap { case (id, tk) =>
        val s = terms.distinct.map { term =>
          val tf = tk.count(_ == term).toDouble
          val df = toks.values.count(_.contains(term)).toDouble
          if (tf == 0) 0.0
          else math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * tk.size / avgdl))
        }.sum
        if (s > 0) Some((qid, id) -> s) else None
      }
    val want = score(1L, Seq("spark", "filter")) ++ score(2L, Seq("sort"))
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, s"$k") }
    // doc 3 has no 'spark'/'sort' but has 'filter' → appears only for q1
    assert(got.contains((1L, 3L)) && !got.contains((2L, 3L)))
    // empty doc never scores
    assert(!got.keys.exists(_._2 == 4L))
  }

  test("bm25 duplicate query terms count once") {
    val qs = Seq((1L, "spark"), (1L, "spark")).toDF("qid", "term")
    val once = Retrieval.bm25(docs, "doc_id", "text",
      Seq((1L, "spark")).toDF("qid", "term"), "qid", "term")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val twice = Retrieval.bm25(docs, "doc_id", "text", qs, "qid", "term")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(once == twice)
  }

  test("chunk covers every token with the configured overlap and clips the tail") {
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val ch = Retrieval.chunk(d, "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk_text").collect()
    // n=10, size=4, stride=3 → last = ceil((10-4)/3) = 2 → 3 chunks
    assert(ch.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(ch.map(_.getString(2)).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(ch.map(_.getLong(1)).toSeq == Seq(4L, 4L, 4L))
    // tail clipping: 11 tokens → 4th chunk holds the 2 leftovers
    val d11 = Seq((1L, (1 to 11).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val last = Retrieval.chunk(d11, "doc_id", "text", 4, 3)
      .orderBy(desc("chunk_idx")).limit(1)
      .select("chunk_text", "n_chunk_tokens").collect().head
    assert(last.getString(0) == "w10 w11" && last.getLong(1) == 2L)
  }

  test("chunk edge cases: empty doc, short doc, no-overlap stride reassembles the doc") {
    val d = Seq((1L, ""), (2L, "only three words")).toDF("doc_id", "text")
    val ch = Retrieval.chunk(d, "doc_id", "text", 8, 8).collect()
    // empty → nothing; short → one whole-doc chunk
    assert(ch.length == 1 && ch.head.getLong(0) == 2L &&
      ch.head.getString(3) == "only three words")
    // stride == chunkTokens → concatenating chunks rebuilds the doc
    val long = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val parts = Retrieval.chunk(long, "doc_id", "text", 6, 6)
      .orderBy("chunk_idx").select("chunk_text").collect().map(_.getString(0))
    assert(parts.mkString(" ") == (1 to 20).map(i => s"t$i").mkString(" "))
  }

  test("evalMetrics: hand-computed recall/MRR, miss and empty-gold edges") {
    // ranked lists: q1 hits gold at ranks 2 and 5 of 3 gold docs;
    // q2 retrieves nothing relevant; q3 has no gold at all
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 5L),
      (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L)
    ).toDF("query_id", "doc_id", "rank")
    val gold = Seq(
      (1L, 11L), (1L, 13L), (1L, 99L),  // 99 never retrieved
      (2L, 77L)
    ).toDF("query_id", "doc_id")
    val got = Retrieval.evalMetrics(ranked, gold, "query_id", "doc_id", k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((3L, 2L, 0.6667, 0.5)))   // first hit at rank 2
    assert(got(2L) == ((1L, 0L, 0.0, 0.0)))
    assert(!got.contains(3L), "no gold → no denominator → no row")
    // k cutoff: at k=1 q1's rank-2 hit no longer counts
    val k1 = Retrieval.evalMetrics(ranked, gold, "query_id", "doc_id", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(k1(1L) == ((0L, 0.0)))
  }

  test("mmrRerank: diversity flips a redundant runner-up, hand-computed") {
    import spark.implicits._
    // query 1: doc 11 is most relevant; doc 12 is nearly its duplicate
    // (sim 0.95) while doc 13 is dissimilar (sim 0.10) — pure relevance
    // would rank 12 second, MMR must pick 13:
    //   rank2(12) = 0.7*0.80 - 0.3*0.95 = 0.275
    //   rank2(13) = 0.7*0.70 - 0.3*0.10 = 0.460 → 13 wins
    //   rank3(12) = 0.7*0.80 - 0.3*max(0.95, 0.20) = 0.275
    val cands = Seq(
      (1L, 11L, 0.90), (1L, 12L, 0.80), (1L, 13L, 0.70),
      (2L, 21L, 0.50), (2L, 22L, 0.50)  // rel tie → smaller id first
    ).toDF("query_id", "doc_id", "rel")
    val sims = Seq(
      (1L, 11L, 12L, 0.95), (1L, 12L, 11L, 0.95),
      (1L, 11L, 13L, 0.10), (1L, 13L, 11L, 0.10),
      (1L, 12L, 13L, 0.20), (1L, 13L, 12L, 0.20),
      (2L, 21L, 22L, 0.00), (2L, 22L, 21L, 0.00)
    ).toDF("query_id", "id_a", "id_b", "sim")
    val got = Retrieval.mmrRerank(cands, sims, "query_id", "doc_id", "rel",
        k = 3, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got((1L, 1L)) == ((11L, 0.63)))
    assert(got((1L, 2L)) == ((13L, 0.46)), "diversity must promote the dissimilar doc")
    assert(got((1L, 3L)) == ((12L, 0.275)))
    // relevance tie at rank 1 breaks to the smaller id; a query with
    // fewer candidates than k just stops early
    assert(got((2L, 1L))._1 == 21L)
    assert(got((2L, 2L))._1 == 22L)
    assert(!got.contains((2L, 3L)))
    // every doc selected at most once per query
    val perQuery = got.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._1)).toMap
    perQuery.values.foreach(ds => assert(ds.distinct.size == ds.size))
  }

  test("st1 streaming battery entry equals the batch group-by") {
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.Relational.st1StreamWindows(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val batch = Tables.events(spark, d)
      .groupBy((floor(unix_micros(col("ts")) / 300000000L) * 300000000L)
        .as("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == batch)
  }
}
