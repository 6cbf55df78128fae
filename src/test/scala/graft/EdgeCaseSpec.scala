package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.query.{Ltcv, ObjectSearch}
import graft.pipeline.Dedup

/** Degenerate-input behavior: empty tables, unknown keys, windows with
  * no data — the engine must return empty results, never throw. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val cat = FixtureWorld.catalog(spark)
  import spark.implicits._

  test("unknown procver id yields empty photometry, not an error") {
    // no links for this procver → priorities empty → inner join drops all
    assert(Ltcv.sources(cat, "pvid-nope").count() == 0)
    assert(Ltcv.objectLtcvs(cat, "pvid-nope").count() == 0)
  }

  test("rows from a base procver outside the chain are excluded") {
    // pv3's chain is [bpv3]; bpv1/bpv2 photometry must not leak in
    val bpvs = Ltcv.sources(cat, "pvid-pv3")
      .select("base_procver_id").distinct().collect().map(_.getString(0)).toSet
    assert(bpvs == Set(FixtureWorld.bpvId("bpv3", "diasource")))
  }

  test("expandObjids with unknown ids is empty") {
    assert(Ltcv.expandObjids(cat, "pvid-pv1", diaobjectids = Seq(999999L)).count() == 0)
    assert(Ltcv.expandObjids(cat, "pvid-pv1", rootids = Seq("root-none")).count() == 0)
  }

  test("patch join with one empty side keeps the other, flags correct") {
    val src = Ltcv.sources(cat, "pvid-pv3")
    val empty = src.filter(lit(false))
    val onlyDet = Ltcv.patchJoin(empty, src)
    assert(onlyDet.count() == src.count())
    assert(onlyDet.filter(!col("ispatch") || !col("isdet")).count() == 0)
    val onlyForced = Ltcv.patchJoin(Ltcv.forced(cat, "pvid-pv3"), empty)
    assert(onlyForced.filter(col("isdet") || col("ispatch")).count() == 0)
  }

  test("hot window before any data is empty; stats of empty input are empty") {
    assert(Ltcv.hotLtcvs(cat, "pvid-pv3", mjdNow = 1000.0).count() == 0)
    val empty = Ltcv.sources(cat, "pvid-pv3").filter(lit(false))
    assert(Ltcv.objStats(empty).count() == 0)
    assert(Ltcv.objStatsComb(empty).count() == 0)
    assert(Ltcv.weightedPositions(empty).count() == 0)
  }

  test("dedup operators tolerate empty and single-doc corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactDedup(empty, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.minhashNearDups(empty, "doc_id", "text").count() == 0)
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(one, "doc_id", "text", 3, 0.1).count() == 0)
    // docs shorter than the shingle width are skipped, not crashed
    val short = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(short, "doc_id", "text").count() == 0)
  }

  test("incremental/assembly ops tolerate empty inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val some = Seq((1L, "a few words of text here ok then"),
      (2L, "a few words of text here ok now")).toDF("doc_id", "text")
    // empty batch vs real index; real batch vs empty-corpus index
    val ix = Dedup.minhashIndex(some, "doc_id", "text")
    assert(Dedup.incrementalMinhash(empty, "doc_id", "text", ix).count() == 0)
    val emptyIx = Dedup.minhashIndex(empty, "doc_id", "text")
    assert(Dedup.incrementalMinhash(some, "doc_id", "text", emptyIx,
      threshold = 0.5).collect().forall(_.getString(3) == "batch"))
    // same tolerances for the simhash variant
    val six = Dedup.simhashIndex(some, "doc_id", "text")
    assert(Dedup.incrementalSimhash(empty, "doc_id", "text", six).count() == 0)
    val emptySix = Dedup.simhashIndex(empty, "doc_id", "text")
    assert(Dedup.incrementalSimhash(some, "doc_id", "text", emptySix,
      threshold = 0.5).collect().forall(_.getString(4) == "batch"))
    // empty prev + empty pairs; empty pairs over a real map
    import graft.pipeline.Components
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val noMap = Seq.empty[(Long, Long)].toDF("id", "cluster")
    assert(Components.updateClusters(noMap, "id", "cluster",
      noPairs, "id_a", "id_b").count() == 0)
    val map = Seq((3L, 3L), (4L, 3L)).toDF("id", "cluster")
    assert(Components.updateClusters(map, "id", "cluster",
        noPairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(3L -> 3L, 4L -> 3L))
    // sequence assembly of an empty / all-empty-token corpus
    import graft.pipeline.Sharding
    val noToks = Seq.empty[(Long, Seq[String])].toDF("doc_id", "toks")
    assert(Sharding.assembleSequences(noToks, "doc_id", "toks", 5L).count() == 0)
    val emptyToks = Seq((1L, Seq.empty[String])).toDF("doc_id", "toks")
    assert(Sharding.assembleSequences(emptyToks, "doc_id", "toks", 5L).count() == 0)
  }

  test("export/eval operators degrade to empty results on empty inputs") {
    import graft.pipeline.{LangModel, Retrieval, Sharding, SnapshotDiff}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noStrata = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Sharding.deterministicShuffle(noDocs, "doc_id", 1L).count() == 0)
    assert(Sharding.stratifiedExactK(noStrata, "lang", "doc_id", 5, 1L).count() == 0)
    assert(LangModel.scoreBuckets(
      Seq.empty[(String, Double)].toDF("lang", "score"), "lang", "score")
      .count() == 0)
    // diff against an empty old snapshot: everything is 'added'
    val v2 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val d = SnapshotDiff.diff(noDocs, v2, "doc_id", "text")
      .collect().map(r => r.getString(1)).toSet
    assert(d == Set("added"))
    assert(SnapshotDiff.diff(noDocs, noDocs, "doc_id", "text").count() == 0)
    // metrics with empty ranked lists: zero rows hit, gold still counted
    val gold = Seq((1L, 5L)).toDF("query_id", "doc_id")
    val noRank = Seq.empty[(Long, Long, Long)].toDF("query_id", "doc_id", "rank")
    val m = Retrieval.evalMetrics(noRank, gold, "query_id", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(m.toSeq == Seq((1L, 0L, 0.0, 0.0)))
  }

  test("IVF-PQ tolerates a corpus smaller than the codebook width") {
    import graft.pipeline.PqAnn
    // 10 vectors, ksub = 16: codebook init can only seed 10 codewords
    // per subspace; the rest stay at the zero vector and must neither
    // crash training nor encoding nor the probe
    val rng = new scala.util.Random(3)
    val tiny = (0L until 10L)
      .map(i => (i, Array.fill(8)(rng.nextFloat())))
      .toDF("vec_id", "embedding")
    val (index, assigned) = PqAnn.buildIndexWithAssigned(
      tiny, "vec_id", "embedding", dim = 8, nlist = 2, m = 4, ksub = 16)
    assert(index.codes.count() == 10)
    val q = tiny.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val top = PqAnn.topK(index, tiny, q, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(top.length == 3 && top.forall(_._1 != 0L))
    // frozen re-encode of the same corpus is still a no-op
    val re = PqAnn.encodeNew(index.model, tiny, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val orig = index.codes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(re == orig)
    assigned.unpersist()
  }

  test("tableSignature: stable on unchanged data, changes on regeneration") {
    val d = java.nio.file.Files.createTempDirectory("sig").toString
    Seq((1, 2)).toDF("a", "b").write.parquet(s"$d/lineitem.parquet")
    val s1 = Tables.tableSignature(d, "lineitem")
    assert(s1 == Tables.tableSignature(d, "lineitem"), "signature must be stable")
    assert(s1.nonEmpty && Tables.tableSignature(d, "absent") != s1)
    // a regenerated table (same path, new mtime) must change the
    // signature — this is what keeps scratch artifacts from going stale
    val part = new java.io.File(s"$d/lineitem.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(part.setLastModified(part.lastModified() + 60000))
    assert(Tables.tableSignature(d, "lineitem") != s1,
      "mtime change must change the signature")
  }

  test("round-6 quality ops tolerate degenerate corpora") {
    import graft.pipeline.{Dedup, LangModel, SpanDedup}
    // docs shorter than the window never produce spans, never lose tokens
    val tiny = Seq((1L, "only three words"), (2L, "x"), (3L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val spans = SpanDedup.removeDuplicateSpans(tiny, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(spans == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))

    // identical short docs below window length: no span removal either
    val dupTiny = Seq((1L, "same short text"), (2L, "same short text"))
      .toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpans(dupTiny, "doc_id", "text", 8).count() == 0)

    // LM scoring over a corpus with no bigrams at all → empty result
    val singles = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    assert(LangModel.bigramScores(singles, "doc_id", "text",
      singles, "text").count() == 0)

    // incremental dedup of an empty batch / against an empty index
    val corpus = Seq((1L, "abc")).toDF("doc_id", "text")
    val emptyB = corpus.filter(col("doc_id") < 0)
    assert(Dedup.incrementalExact(emptyB, "doc_id", "text",
      Dedup.digestIndex(corpus, "text")).count() == 0)
    val vsEmpty = Dedup.incrementalExact(corpus, "doc_id", "text",
        Dedup.digestIndex(emptyB, "text"))
      .select("decision").collect().map(_.getString(0))
    assert(vsEmpty.sameElements(Array("kept")))
  }

  test("decoders tolerate degenerate payloads: tiny, empty, truncated") {
    import graft.pipeline.{Multimodal, TextAnalysis, Components}
    // 1×1 image round-trips exactly
    val one = {
      val img = new java.awt.image.BufferedImage(1, 1,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      img.getRaster.setSample(0, 0, 0, 200)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val st = Multimodal.imageStats(one).get
    assert(st.width == 1 && st.height == 1 && st.sums(0) == 200L)
    // empty payloads: None, no throw
    assert(Multimodal.imageStats(Array.empty[Byte]).isEmpty)
    assert(Multimodal.audioStats(Array.empty[Byte]).isEmpty)
    assert(Multimodal.splitPngFrames(Array.empty[Byte]).isEmpty)
    // truncated WAV (header only, no samples): decodes to zero frames
    val wav = Multimodal.syntheticWav(1L)
    val headerOnly = java.util.Arrays.copyOfRange(wav, 0, 44)
    assert(Multimodal.audioStats(headerOnly).forall(_.nFrames == 0L))
    // truncated PNG: the reader throws internally → None, no crash
    assert(Multimodal.imageStats(
      java.util.Arrays.copyOfRange(Multimodal.syntheticPng(1L), 0, 20)).isEmpty)
    // video container with trailing garbage: frames before it still decode
    val vidPlus = Multimodal.syntheticVideo(3L, 2) ++ "garbage".getBytes
    assert(Multimodal.decodeVideo(vidPlus, 9).isDefined)
    // repetition stats on an empty corpus / whitespace-only doc: no rows
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.repetitionStats(empty, "doc_id", "text").count() == 0)
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(TextAnalysis.repetitionStats(blank, "doc_id", "text").count() == 0)
    // dedupClusters with empty docs AND empty pairs: empty, converged
    val noDocs = Seq.empty[Long].toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.dedupClusters(noDocs, "doc_id", noPairs, "id_a", "id_b").count() == 0)
    // filter bank on empty / whitespace-only corpora: no rows, no throw
    assert(TextAnalysis.filterBank(empty, "doc_id", "text").count() == 0)
    assert(TextAnalysis.filterBank(blank, "doc_id", "text").count() == 0)
    // weighted sample of an empty / all-undrawable corpus: empty
    import graft.pipeline.Sharding
    assert(Sharding.weightedSample(empty, "doc_id", lit(1L), 5, 1L).count() == 0)
    assert(Sharding.weightedSample(
      Seq((1L, 0L), (2L, -1L)).toDF("doc_id", "w"), "doc_id", col("w"),
      5, 1L).count() == 0)
  }

  test("round-9 operators degrade to empty results on empty inputs") {
    import graft.pipeline.{LangModel, Retrieval, ScalarQuant, Similarity}
    import graft.query.Temporal
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.containmentPairs(emptyDocs, "doc_id", "text").count() == 0)
    // trigram KN: empty training corpus AND empty scored corpus
    assert(LangModel.knTrigramScores(emptyDocs, "doc_id", "text",
      emptyDocs, "text").count() == 0)
    // too-short docs (< 3 tokens) emit no trigram rows either
    val short = Seq((1L, "one two")).toDF("doc_id", "text")
    assert(LangModel.knTrigramScores(short, "doc_id", "text",
      short, "text").count() == 0)
    // SQ: empty embedding table → no bounds, no codes, no throw
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(ScalarQuant.quantize(emptyEmb, "vec_id", "embedding").count() == 0)
    // NDCG with empty graded table: no judged queries → empty metrics
    val ranked = Seq((1L, 10L, 1L)).toDF("query_id", "doc_id", "rank")
    val noGraded = Seq.empty[(Long, Long, Long)].toDF("query_id", "doc_id", "rel")
    assert(Retrieval.ndcg(ranked, noGraded, "query_id", "doc_id", "rel").count() == 0)
    // PRF over an empty corpus: both rounds empty, no throw
    val qs = Seq((1L, "alpha")).toDF("query_id", "term")
    assert(Retrieval.prfSearch(emptyDocs, "doc_id", "text", qs,
      "query_id", "term").count() == 0)
    // MIPS with empty query side / empty corpus
    val emb = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val noQ = Seq.empty[(Long, Array[Float])].toDF("q_vec_id", "q_embedding")
    assert(Similarity.mipsTopK(emb, noQ, k = 3).count() == 0)
    assert(Similarity.mipsTopK(emptyEmb, noQ, k = 3).count() == 0)
    // event analytics on an empty stream: funnel keeps its step rows
    // (all zero — a dashboard shows the empty funnel), matrix ops empty
    val noEv = Seq.empty[(String, String, Long)]
      .toDF("user_id", "event_type", "ts_us")
    val fn = Temporal.funnel(noEv, "user_id", "event_type", "ts_us",
      Seq("view", "click"))
    assert(fn.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, 0L), (2L, 0L)))
    val noAct = Seq.empty[(String, Long)].toDF("user_id", "ts_us")
    assert(Temporal.retention(noAct, "user_id", "ts_us").count() == 0)
    assert(Temporal.activeUsers(noAct, "user_id", "ts_us").count() == 0)
  }

  test("round-14 operators degrade to empty results on empty inputs") {
    import graft.pipeline.{Retrieval, TextAnalysis}
    import graft.query.Temporal
    // MAD outliers: empty frame, and a single-row group (mad = 0)
    val noVals = Seq.empty[(String, Double)].toDF("g", "x")
    assert(TextAnalysis.madOutliers(noVals, "g", "x").count() == 0)
    assert(TextAnalysis.madOutliers(
      Seq(("a", 5.0)).toDF("g", "x"), "g", "x").count() == 0)
    // hard negatives: empty ranked list / empty gold → no triplets
    val ranked = Seq((1L, "d1", 1L)).toDF("query_id", "doc_id", "rank")
    val noRanked = Seq.empty[(Long, String, Long)]
      .toDF("query_id", "doc_id", "rank")
    val noGold = Seq.empty[(Long, String)].toDF("query_id", "doc_id")
    assert(Retrieval.hardNegatives(noRanked, noGold, "query_id",
      "doc_id").count() == 0)
    assert(Retrieval.hardNegatives(ranked, noGold, "query_id",
      "doc_id").count() == 0)
    // as-of with tolerance on an empty right side: left rows survive
    // unmatched (the ev13 'direct' path)
    val left = Seq((1L, 10L)).toDF("k", "t")
    val noRight = Seq.empty[(Long, Long)].toDF("k", "rt")
    val asof = Temporal.asofJoin(left, noRight, "k", "t", "rt",
      tolerance = Some(lit(5L)))
    assert(asof.count() == 1 && asof.select("rt").head.isNullAt(0))
  }

  test("search with cone + predicates composes; empty stats yields empty search") {
    val stats = Ltcv.objStatsComb(Ltcv.sources(cat, "pvid-pv1"))
      .join(Ltcv.weightedPositions(Ltcv.sources(cat, "pvid-pv1")), Seq("rootid"))
    val got = ObjectSearch.search(stats, Map("ndets_min" -> 1),
      cone = Some((42.0, 13.0, 15.0)))
    assert(got.count() > 0)
    val none = ObjectSearch.search(stats, Map("ndets_min" -> 99999),
      cone = Some((42.0, 13.0, 15.0)))
    assert(none.count() == 0)
  }

  test("unimaxSample degenerate inputs") {
    import graft.pipeline.Sharding
    val docs = (0L until 10L).map(i => (i, if (i < 7) "a" else "b"))
      .toDF("doc_id", "lang")
    // budget exceeding the whole corpus: every doc kept, nothing throws
    val all = Sharding.unimaxSample(docs, "doc_id", "lang", budget = 1000L)
    assert(all.count() == 10L)
    // empty corpus: empty result
    assert(Sharding.unimaxSample(docs.filter(col("doc_id") < 0),
      "doc_id", "lang", budget = 10L).count() == 0)
    // invalid budget refuses loudly
    intercept[IllegalArgumentException] {
      Sharding.unimaxSample(docs, "doc_id", "lang", budget = 0L)
    }
  }

  test("portableProfile degenerate inputs") {
    import graft.pipeline.TextAnalysis
    // single doc: m = 1, both quantile ranks resolve to row 1
    val one = Seq((1L, "g", "three token text")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.portableProfile(one, "doc_id", "lang", "text").collect().head
    assert(r.getAs[Long]("n_docs") == 1L)
    assert(r.getAs[Long]("kmv_distinct_est") == 1L)
    assert(r.getAs[Long]("p50_tokens_est") == 3L)
    assert(r.getAs[Long]("p95_tokens_est") == 3L)
    // empty corpus: empty profile, never a division by zero
    assert(TextAnalysis.portableProfile(one.filter(col("doc_id") < 0),
      "doc_id", "lang", "text").count() == 0)
    // k below the sketch minimum refuses loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.portableProfile(one, "doc_id", "lang", "text", k = 1)
    }
  }
}
