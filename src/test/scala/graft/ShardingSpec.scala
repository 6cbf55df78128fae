package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.{Sharding, TextAnalysis}

/** Shard packing, hash splits, top-n-grams, and PII redaction — the
  * corpus-export surface behind p2/p3/t7/t8. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 300 docs with irregular token masses: some zero-token, one far
    * larger than the budget, ids deliberately sparse/unsorted on
    * arrival so the range repartition has real work to do. */
  lazy val docs = {
    val rng = new scala.util.Random(11)
    val rows = (0L until 300L).map { i =>
      val id = i * 7 % 2099                      // sparse, shuffled ids
      val n = if (i % 50 == 13) 0 else if (i == 123) 900 else rng.nextInt(60) + 1
      (id, Seq.fill(n)("w" + rng.nextInt(40)).mkString(" "))
    }
    rows.toDF("doc_id", "text").repartition(7)
  }

  test("two-phase shard packing equals the naive global-window prefix sum") {
    val budget = 500L
    val got = Sharding.packByTokenBudget(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), budget)
      .select("doc_id", "n_tokens", "cum_tokens", "shard")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // naive reference: one global-order window (the single-task shape
    // packByTokenBudget exists to avoid)
    val wAll = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    val want = docs
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      .withColumn("cum", sum("tok").over(wAll))
      .collect().map { r =>
        val (id, tok, cum) = (r.getLong(0), r.getLong(1), r.getLong(2))
        id -> ((tok, cum, (cum - tok) / budget))
      }.toMap
    assert(got == want)
  }

  test("stratified packing in one pass equals per-stratum packing") {
    val budget = 500L
    val strat = docs.withColumn("split",
      when(col("doc_id") % 3 === 0, "a").when(col("doc_id") % 3 === 1, "b")
        .otherwise("c"))
    val oneShot = Sharding.packByTokenBudgetStratified(strat, "doc_id",
        TextAnalysis.tokenCount(col("text")), budget, strata = Seq("split"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val perStratum = Seq("a", "b", "c").flatMap { sp =>
      Sharding.packByTokenBudget(strat.filter(col("split") === sp), "doc_id",
          TextAnalysis.tokenCount(col("text")), budget)
        .collect()
        .map(r => (sp, r.getLong(0)) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(oneShot == perStratum)
  }

  test("shards are contiguous id-intervals and fill to the budget") {
    val budget = 500L
    val out = Sharding.packByTokenBudget(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), budget)
      .orderBy("doc_id").collect()
    val shards = out.map(_.getLong(3))
    // monotone nondecreasing shard along id order = contiguous intervals
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b })
    // every shard's first doc starts inside the shard's token window
    out.groupBy(_.getLong(3)).foreach { case (s, rows) =>
      val first = rows.minBy(_.getLong(0))
      val cumBefore = first.getLong(2) - first.getLong(1)
      assert(cumBefore >= s * budget && cumBefore < (s + 1) * budget)
    }
  }

  test("hash split is deterministic, pure, and roughly 75/12.5/12.5") {
    val ids = (0L until 4000L).toDF("id")
    val a = ids.select(col("id"), Sharding.hashSplit(col("id")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = ids.repartition(13).select(col("id"), Sharding.hashSplit(col("id")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)                               // partitioning-invariant
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 4000.0).toMap
    assert(frac("train") > 0.70 && frac("train") < 0.80)
    assert(frac("val") > 0.08 && frac("val") < 0.17)
    assert(frac("test") > 0.08 && frac("test") < 0.17)
  }

  test("deterministic shuffle: exact md5-rank permutation, partition-invariant, seed-independent") {
    import graft.pipeline.Sharding
    def positions(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Sharding.deterministicShuffle(df, "doc_id", seed)
        .select("doc_id", "shuffle_pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = positions(docs, 42L)
    val n = docs.count()
    // a permutation of 0..n-1
    assert(got.values.toSeq.sorted == (0L until n))
    // equals the naive single-window rank under the same key
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = {
      md.reset()
      md.digest(s"42:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val want = got.keys.toSeq.sortBy(id => (key(id), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got == want)
    // invariant under input partitioning; a new seed permutes differently
    assert(positions(docs.repartition(13), 42L) == got)
    assert(positions(docs, 43L) != got)
  }

  test("exact-k stratified sample: naive-window equality, fallback path, edges") {
    import graft.pipeline.Sharding
    // three strata of very different sizes (one smaller than k for the
    // min(k, n) edge) plus null-stratum rows that must be excluded
    val strat = (0L until 730L).map { i =>
      val lang = if (i < 500) "en" else if (i < 725) "de" else "tiny"
      (i * 13 % 9973, lang)
    }.toDF("doc_id", "lang")
      .union(Seq((999983L, null: String)).toDF("doc_id", "lang"))
      .repartition(7)
    def naive(k: Int, seed: Long): Set[(String, Long, Int)] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def key(id: Long) = {
        md.reset()
        md.digest(s"$seed:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      strat.filter(col("lang").isNotNull).collect()
        .map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          rows.sortBy { case (_, id) => (key(id), id) }.take(k)
            .zipWithIndex.map { case ((l, id), i) => (l, id, i + 1) }
        }.toSet
    }
    def got(df: org.apache.spark.sql.DataFrame) = df
      .select("lang", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val k7 = got(Sharding.stratifiedExactK(strat, "lang", "doc_id", 7, 11L))
    assert(k7 == naive(7, 11L))
    assert(!k7.exists(_._1 == null), "null stratum excluded")
    // margin 0 starves the pre-cut below k (rate 24/n on the 500-row
    // stratum keeps ~24 < 40): the exactness audit must trigger the
    // unfiltered rerun and STILL produce the exact answer
    val starved = got(Sharding.stratifiedExactK(
      strat, "lang", "doc_id", 40, 11L, margin = 0.0))
    assert(starved == naive(40, 11L))
    // partition invariance; k beyond every stratum keeps everything
    assert(got(Sharding.stratifiedExactK(
      strat.repartition(13), "lang", "doc_id", 7, 11L)) == k7)
    val all = Sharding.stratifiedExactK(strat, "lang", "doc_id", 100000, 1L)
    assert(all.count() == strat.count() - 1) // all but the null-lang row
  }

  test("weightedSample: A-ES reference equality, partition invariance, weight guards") {
    val weighted = docs
      .withColumn("w", TextAnalysis.tokenCount(col("text")).cast("long"))
    // brute-force A-ES reference: same md5-prefix uniform, same key
    // formula, evaluated sequentially on the driver
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = weighted.select("doc_id", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val v = java.lang.Long.parseLong(md5hex(s"9:$id").take(12), 16)
        val u = (v.toDouble + 0.5) / 281474976710656.0
        val key = BigDecimal(-math.log(u) / w)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (key, id)
      }.sorted.take(20).zipWithIndex
      .map { case ((key, id), i) => (id, key, i + 1L) }.toSeq
    val got = Sharding.weightedSample(weighted, "doc_id", col("w"), k = 20, seed = 9L)
      .select("doc_id", "draw_key", "sample_rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      .sortBy(_._3)
    assert(got == want)
    // partition invariance: a different physical layout draws the
    // identical sample in the identical order
    val re = Sharding.weightedSample(weighted.repartition(13), "doc_id",
        col("w"), k = 20, seed = 9L)
      .select("doc_id", "draw_key", "sample_rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      .sortBy(_._3)
    assert(re == got)
    // zero/negative/null weights can never be drawn; k >= n returns
    // every drawable row
    val guarded = weighted.withColumn("w",
      when(col("doc_id") % 5 === 0, lit(0L))
        .when(col("doc_id") % 5 === 1, lit(-3L))
        .when(col("doc_id") % 5 === 2, lit(null: java.lang.Long))
        .otherwise(col("w")))
    val drawable = guarded.filter(col("w").isNotNull && col("w") > 0).count()
    val all = Sharding.weightedSample(guarded, "doc_id", col("w"),
      k = 100000, seed = 9L)
    assert(all.count() == drawable)
    assert(all.filter(col("w").isNull || col("w") <= 0).count() == 0)
  }

  test("topNgrams ranks by exact count with deterministic tie order") {
    val tiny = Seq(
      (1L, "en", "a b a b c"),                   // "a b"×2, "b a"×1, "b c"×1
      (2L, "en", "a b"),                         // "a b"×1
      (3L, "de", "x y")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.topNgrams(tiny, "doc_id", "lang", "text", k = 2)
      .orderBy("lang", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("de", "x y", 1L, 1L),
      ("en", "a b", 3L, 1L),
      ("en", "b a", 1L, 2L)))                    // tie with "b c" broken by gram asc
  }

  test("PII redaction removes every planted email and phone") {
    val planted = Seq(
      (1L, "write to alice.smith+x@sub.example.org today"),
      (2L, "call 555-0199 or 555-0200 now"),
      (3L, "bob@ex.co and 555-1234 together"),
      (4L, "no pii here at all")
    ).toDF("id", "t")
    val out = planted.select(
        TextAnalysis.emailCount(col("t")).as("e"),
        TextAnalysis.phoneCount(col("t")).as("p"),
        TextAnalysis.redactPii(col("t")).as("r"))
      .orderBy(col("e").desc, col("p").desc)
      .collect()
    val counts = out.map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(counts == Set((1, 0), (0, 2), (1, 1), (0, 0)))
    out.foreach { r =>
      val red = r.getString(2)
      assert(TextAnalysis.EmailPattern.r.findFirstIn(red).isEmpty)
      assert(TextAnalysis.PhonePattern.r.findFirstIn(red).isEmpty)
    }
  }

  test("packSequences tiles every sequence edge-to-edge and reconstructs docs") {
    val L = 500L
    val out = Sharding.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalTok = out.map(_._4).sum
    // sequences tile [0, totalTok): each full sequence's spans cover
    // exactly [0, L) contiguously, the last covers [0, tail)
    val lastSeq = out.map(_._1).max
    out.groupBy(_._1).foreach { case (seq, spans) =>
      val sorted = spans.sortBy(_._5)
      assert(sorted.head._5 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 + a._4 == b._5); case _ =>
      }
      val covered = sorted.map(_._4).sum
      if (seq < lastSeq) assert(covered == L)
      else assert(covered == totalTok - lastSeq * L)
    }
    // every doc's spans reconstruct it: tok_starts contiguous from 0
    // and summing to the doc's token count
    val toks = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    out.groupBy(_._2).foreach { case (id, spans) =>
      val sorted = spans.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3); case _ =>
      }
      assert(sorted.map(_._4).sum == toks(id))
    }
    // zero-token docs emit no span
    assert(out.map(_._2).toSet == toks.filter(_._2 > 0).keySet)
  }

  test("assembleSequences materializes the exact packed token stream") {
    val L = 7L
    // token arrays of irregular lengths, incl. empty and > L
    val rng = new scala.util.Random(5)
    val rows = (0L until 40L).map { i =>
      val id = i * 13 % 997
      val n = if (i % 9 == 4) 0 else rng.nextInt(20)
      (id, (0 until n).map(j => s"t${id}_$j"))
    }
    val df = rows.toDF("doc_id", "toks").repartition(5)
    val got = Sharding.assembleSequences(df, "doc_id", "toks", L)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // the concatenation of sequences in seq_id order IS the
    // concatenation of documents in doc_id order
    val flat = rows.sortBy(_._1).flatMap(_._2)
    assert(got.flatMap(_._2).toSeq == flat)
    // every sequence but the last is exactly L; ids are dense from 0
    assert(got.map(_._1).toSeq == got.indices.map(_.toLong))
    got.dropRight(1).foreach { case (_, toks, _, n) =>
      assert(toks.length == L && n == L)
    }
    assert(got.last._2.length == (flat.size % L match {
      case 0 => L.toInt case t => t }))
    // n_docs counts the spans feeding the sequence
    got.foreach { case (_, toks, nd, _) =>
      assert(nd >= 1 && nd <= toks.length)
    }
  }

  test("e4 composition: BPE encode then assemble reconstructs the encoded corpus") {
    val texts = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the mat sat on the cat and the cat sat"),
      (3L, ""),
      (4L, "a b a b a b a b the the the"))
    val docs = texts.toDF("doc_id", "text")
    val merges = graft.pipeline.Bpe.train(docs, "text", numMerges = 16)
    val enc = graft.pipeline.Bpe.encodeCorpus(docs, "doc_id", "text", merges)
    val encLocal = enc.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    val seqs = Sharding.assembleSequences(enc, "doc_id", "bpe_tokens", 5L)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    assert(seqs.flatMap(_._2).toSeq == encLocal.flatMap(_._2).toSeq)
    // and every token round-trips: concatenating a doc's tokens
    // reproduces its whitespace-normalized text
    encLocal.foreach { case (id, toks) =>
      val want = texts.find(_._1 == id).get._2
        .trim.split("\\s+").filter(_.nonEmpty).mkString("")
      assert(toks.mkString("") == want)
    }
  }

  test("temperatureMix fills sqrt-proportional quotas with hash-min members") {
    val skewed = (0L until 900L).map { i =>
      (i, if (i < 640) "en" else if (i < 800) "fr" else "de")
    }.toDF("doc_id", "lang").repartition(9)
    val got = Sharding.temperatureMix(skewed, "doc_id", "lang", targetN = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // quotas: w = floor(sqrt(n)) → en 25, fr 12, de 10, tot 47
    // k = (100 * w) div 47 → en 53, fr 25, de 21
    val counts = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts == Map("en" -> 53, "fr" -> 25, "de" -> 21))
    // membership = the k smallest md5(id) per stratum (naive reference)
    val ids = skewed.select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val want = ids.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(_._3).take(counts(lang)).zipWithIndex
        .map { case (r, i) => (lang, r._2, i + 1L) }.toSeq
    }.toSet
    assert(got.toSet == want)
    // partitioning-invariant (the pre-prune must not change membership)
    val again = Sharding.temperatureMix(skewed.repartition(2), "doc_id",
        "lang", targetN = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == want)
  }

  test("a doc larger than the budget owns its shards without skipping docs") {
    val big = Seq((1L, 10L), (2L, 2000L), (3L, 10L))
      .toDF("doc_id", "tok")
    val got = Sharding.packByTokenBudget(big, "doc_id", col("tok"), 500L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // doc2 starts in shard 0 (cum_before=10); doc3 lands at floor(2010/500)=4
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 4L)))
  }

  test("stratifiedSample: deterministic, monotone in rate, absent strata drop") {
    import graft.pipeline.Sharding
    // threshold edges
    assert(Sharding.sampleThreshold(1.0) == "g")
    assert(Sharding.sampleThreshold(0.0) == "000000000000")
    assert(Sharding.sampleThreshold(0.5) == "800000000000")
    assert(Sharding.sampleThreshold(0.25) == "400000000000")
    // a rate an ulp under 1.0 must stay 12 nibbles (not roll to 2^48)
    assert(Sharding.sampleThreshold(math.nextDown(1.0)) == "ffffffffffff")

    val docs = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "stratum")
    def ids(rates: Map[String, Double]): Set[Long] =
      Sharding.stratifiedSample(docs, "doc_id", "stratum", rates)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = ids(Map("a" -> 0.5, "b" -> 1.0))
    // rate 1 keeps every member; partition-invariant and rerun-stable
    assert((1L until 400L by 2).forall(half.contains))
    assert(ids(Map("a" -> 0.5, "b" -> 1.0)) == half)
    assert(Sharding.stratifiedSample(docs.repartition(7), "doc_id", "stratum",
        Map("a" -> 0.5, "b" -> 1.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet == half)
    // monotone: the quarter sample is a SUBSET of the half sample
    val quarter = ids(Map("a" -> 0.25, "b" -> 1.0))
    assert((quarter -- half).isEmpty)
    assert(quarter.size < half.size)
    // stratum missing from the map → dropped entirely
    assert(ids(Map("a" -> 1.0)).forall(_ % 2 == 0))
    // roughly the asked-for fraction survives (binomial, wide bound)
    val aHalf = half.count(_ % 2 == 0)
    assert(aHalf > 60 && aHalf < 140, s"~100 of 200 expected, got $aHalf")
  }
}
