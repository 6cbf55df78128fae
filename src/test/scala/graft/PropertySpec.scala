package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.pipeline.{Bpe, SpanDedup, TextAnalysis}

/** Property-based invariants for the corpus operators — randomized
  * corpora catch the shapes fixtures don't (token boundaries, window
  * overlaps, merge-order ties). Spark jobs are expensive per-case, so
  * each property batches many generated docs into ONE DataFrame and
  * checks the invariant row-wise.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wordGen = Gen.oneOf("aa", "ab", "ba", "b", "ccc", "x")
  private val docGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, wordGen))
    .map(_.mkString(" "))

  test("span dedup invariants: accounting exact, clean text is a subsequence") {
    val docs = Gen.listOfN(120, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val texts = docs.toMap
    out.foreach { case (id, (nTok, nRem, clean)) =>
      val words = texts(id).trim.split("\\s+").filter(_.nonEmpty)
      assert(nTok == words.length, s"doc $id token accounting")
      assert(nRem >= 0 && nRem <= nTok)
      val cleanWords = clean.split(" ").filter(_.nonEmpty)
      assert(cleanWords.length == nTok - nRem, s"doc $id clean length")
      // clean text is a subsequence of the original tokens
      var j = 0
      cleanWords.foreach { w =>
        while (j < words.length && words(j) != w) j += 1
        assert(j < words.length, s"doc $id: '$w' out of order in cleaned text")
        j += 1
      }
    }
    // docs with at least one token all have a row
    assert(out.keySet == texts.filter(_._2.trim.nonEmpty).keySet)
  }

  test("BPE round-trip and memo safety on random corpora") {
    val docs = Gen.listOfN(80, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .filter(_._2.nonEmpty)
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 20)
    val enc = Bpe.encodeCorpus(df.repartition(5), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.foreach { case (id, t) =>
      val words = t.trim.split("\\s+").filter(_.nonEmpty)
      assert(enc(id).mkString == words.mkString, s"round trip for doc $id")
    }
  }

  test("canonicalizeUrl is idempotent and host extraction is stable") {
    val hostGen = Gen.oneOf("Example.COM", "a.b.c", "X.org", "ads.net")
    val urlGen = for {
      scheme <- Gen.oneOf("https://", "http://", "//", "")
      host <- hostGen
      path <- Gen.oneOf("", "/P1", "/a/B", "/x/")
      tail <- Gen.oneOf("", "?q=1", "#f", "?utm=x#y")
    } yield s"$scheme$host$path$tail"
    val urls = Gen.listOfN(200, urlGen).sample.get.distinct
    val df = urls.toDF("u")
      .select(col("u"), TextAnalysis.canonicalizeUrl(col("u")).as("c"),
        TextAnalysis.urlHost(col("u")).as("h"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // idempotence: canonicalizing a canonical URL changes nothing
    val canonAgain = rows.map(_._2).toSeq.toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u"))).collect().map(_.getString(0))
    rows.map(_._2).zip(canonAgain).foreach { case (c1, c2) =>
      assert(c1 == c2, s"canonicalize not idempotent: '$c1' -> '$c2'")
    }
    rows.foreach { case (u, c, h) =>
      assert(h == h.toLowerCase, s"host must be lowercase for $u")
      assert(!c.contains("?") && !c.contains("#"), s"query/fragment must drop for $u")
      assert(h.isEmpty || c.contains(h), s"canonical '$c' must contain host '$h'")
    }
  }

  test("LM scores: probabilities stay in (0,1); bigram accounting exact") {
    val docs = Gen.listOfN(60, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val scored = graft.pipeline.LangModel
      .bigramScores(df, "doc_id", "text", df, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    docs.foreach { case (id, t) =>
      val n = t.trim.split("\\s+").count(_.nonEmpty)
      if (n >= 2) {
        val (nb, lp) = scored(id)
        assert(nb == n - 1, s"doc $id bigram count")
        // with V >= 2 every smoothed probability is < 1, so log < 0
        assert(lp < 0.0, s"doc $id avg log prob must be negative, got $lp")
      } else assert(!scored.contains(id), s"doc $id has no bigram evidence")
    }
  }

  test("incremental minhash equals full recomputation on random corpus/batch splits") {
    import graft.pipeline.Dedup
    val rng = new scala.util.Random(41)
    def doc() = Seq.fill(8 + rng.nextInt(20))(s"t${rng.nextInt(120)}").mkString(" ")
    (0 until 3).foreach { trial =>
      // docs with planted mutations so near-dup pairs exist both within
      // and across the split
      val base = (0L until 40L).map(i => (i, doc()))
      val mutated = base.filter(_._1 % 4 == 0)
        .map { case (id, t) => (id + 100L, t + " mut") }
      val all = rng.shuffle(base ++ mutated)
      val (corpusRows, batchRows) = all.splitAt(all.size * 2 / 3)
      // ids must be disjoint by construction (they are: base ∪ +100)
      val corpus = corpusRows.toDF("doc_id", "text")
      val batch = batchRows.toDF("doc_id", "text")
      val inc = Dedup.incrementalMinhash(batch, "doc_id", "text",
          Dedup.minhashIndex(corpus, "doc_id", "text"), threshold = 0.3)
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
      val batchIds = batchRows.map(_._1).toSet
      val full = Dedup.minhashNearDups(corpus.unionAll(batch), "doc_id", "text",
          threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (a, b, _) => batchIds(a) || batchIds(b) }.toSet
      assert(inc == full, s"trial $trial: inc ${inc.size} vs full ${full.size}")
      spark.catalog.clearCache()
    }
  }

  test("asofJoin equals brute force on random keyed event histories") {
    // few keys + a coarse time grid force collisions: many rows per
    // key, left/right rows at identical instants (equality must
    // match), keys with only one side present.
    val rng = new scala.util.Random(7)
    def side(n: Int, idBase: Long) = (0 until n).map { i =>
      (rng.nextInt(6).toLong, idBase + i,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
          rng.nextInt(40) * 60000L)
    }
    val lRows = side(120, 1000)
    val rRows = side(90, 5000)
    val l = lRows.map { case (k, id, t) => (k, id, new java.sql.Timestamp(t)) }
      .toDF("k", "lid", "lt")
    val r = rRows.map { case (k, id, t) => (k, id, new java.sql.Timestamp(t)) }
      .toDF("k", "rid", "rt")
    val got = graft.query.Temporal
      .asofJoin(l, r, "k", "lt", "rt", tieBreak = Seq("rid"))
      .collect().map(rr => rr.getLong(1) ->
        (if (rr.isNullAt(3)) -1L else rr.getLong(3))).toMap
    // brute force: max rt <= lt, ties by max rid
    lRows.foreach { case (k, lid, lt) =>
      val want = rRows.filter(x => x._1 == k && x._3 <= lt)
        .sortBy(x => (x._3, x._2)).lastOption.map(_._2).getOrElse(-1L)
      assert(got(lid) == want, s"left $lid (key $k)")
    }
  }

  test("exact-k sampling equals naive on random strata/k/margin combinations") {
    import graft.pipeline.Sharding
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(seed: Long, id: Long) = {
      md.reset()
      md.digest(s"$seed:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val rng = new scala.util.Random(17)
    // random stratum sizes incl. singletons; sparse non-contiguous ids
    (0 until 3).foreach { round =>
      val strata = (0 until 2 + rng.nextInt(4)).map(i => s"s$i" ->
        (1 + rng.nextInt(80)))
      var next = rng.nextInt(1000).toLong
      val rows = strata.flatMap { case (s, n) =>
        (0 until n).map { _ => next += 1 + rng.nextInt(7); (next, s) }
      }
      val df = rows.toDF("doc_id", "lang").repartition(1 + rng.nextInt(9))
      val k = 1 + rng.nextInt(30)
      val seed = rng.nextLong()
      val margin = Seq(0.0, 1.0, 3.0)(rng.nextInt(3)) // incl. fallback-forcing
      val got = Sharding.stratifiedExactK(df, "lang", "doc_id", k, seed, margin)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
      val want = rows.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
        rs.map(_._1).sortBy(id => (key(seed, id), id)).take(k)
          .zipWithIndex.map { case (id, i) => (s, id, i + 1) }
      }.toSet
      assert(got == want, s"round $round (k=$k margin=$margin)")
    }
  }

  test("deterministic shuffle is the exact md5 permutation on random sparse ids") {
    import graft.pipeline.Sharding
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(seed: Long, id: Long) = {
      md.reset()
      md.digest(s"$seed:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val rng = new scala.util.Random(23)
    (0 until 3).foreach { round =>
      var next = -500L // negative ids too
      val ids = (0 until 1 + rng.nextInt(400)).map { _ =>
        next += 1 + rng.nextInt(1000); next }
      val seed = rng.nextLong()
      val df = ids.map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartition(1 + rng.nextInt(9))
      val got = Sharding.deterministicShuffle(df, "doc_id", seed)
        .select("doc_id", "shuffle_pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ids.sortBy(id => (key(seed, id), id)).zipWithIndex
        .map { case (id, i) => id -> i.toLong }.toMap
      assert(got == want, s"round $round")
    }
  }
}
