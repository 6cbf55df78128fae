package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval + chunking for training-data / RAG pipelines.
  *
  * BM25 is the standard lexical ranking function (Robertson/Spärck
  * Jones; the Lucene-style `ln(1 + (N-df+0.5)/(df+0.5))` idf variant,
  * which is non-negative for every df). Chunking materializes the
  * overlapping fixed-token windows an embedding/RAG indexer consumes.
  *
  * Scale shape: the query-term table is tiny and broadcast, so the
  * corpus-side token stream is filtered to query terms BEFORE any
  * aggregation — the only shuffles are over (doc, term) rows that
  * matched a query term, never the full token stream. Document length
  * and corpus statistics ride along as a broadcast one-row frame.
  * Chunking is a pure per-row codegen projection (tokens → sequence →
  * explode → slice): no shuffle at all.
  */
object Retrieval {

  /** BM25 score per (query, document) over whitespace tokens: one row
    * for every document sharing ≥1 term with the query (absent pairs
    * score an implicit 0 — standard sparse-retrieval semantics).
    *
    * `queries` is a small (queryIdCol, termCol) table — one row per
    * query term; duplicate terms within a query are counted once
    * (distinct applied). idf uses the corpus document count N and
    * per-term document frequency df; tf normalization uses document
    * length over mean document length (k1, b as usual).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Core(tokenStream(docs, idCol, "_term", textCol),
      docLengthsAndStats(docs, idCol, textCol),
      queries, idCol, queryIdCol, termCol, k1, b)

  /** Dirichlet-smoothed query-likelihood score per (query, document) —
    * the language-modeling retrieval family next to [[bm25]]'s
    * probabilistic one (Zhai & Lafferty 2001):
    *
    *   score(q,d) = Σ_{t∈q∩d} ln(1 + tf(t,d)/(μ·P(t|C)))
    *              + |q| · ln(μ/(|d| + μ))
    *
    * with collection model P(t|C) = cf(t)/totalTokens. The first sum
    * runs only over matched terms (sparse, join-friendly); the second
    * is a per-document constant, so documents sharing ≥1 query term
    * get a full exact score and absent pairs are omitted (their score
    * would be the constant-only floor — standard top-k semantics).
    *
    * Scale shape mirrors bm25Core: the token stream is filtered to
    * query terms by a broadcast semi join IN THE SCAN STAGE, so the
    * only corpus-sized shuffle carries matching (doc, term) rows;
    * collection frequencies aggregate map-side and broadcast back.
    * Every arithmetic step (integer counts, one division, ln) is a
    * correctly-rounded IEEE op on identical inputs in any engine, so
    * a 4-dp rounding of the summed score is engine-stable. */
  def queryLikelihood(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      mu: Double = 300.0): DataFrame = {
    val tok = tokenStream(docs, idCol, "_term", textCol)
    val dl = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("_dl"))
    val total = dl.agg(sum("_dl").as("_total"))
    val qt = queries.select(col(queryIdCol), col(termCol).as("_term")).distinct()
    val qterms = qt.select("_term").distinct()
    val qlen = qt.groupBy(queryIdCol).agg(count(lit(1)).as("_qlen"))
    // collection frequency of the query terms only — the corpus-wide
    // term count table never materializes
    val matched = tok.join(broadcast(qterms), Seq("_term"))
    val cf = matched.groupBy("_term")
      .agg(count(lit(1)).cast("double").as("_cf"))
    val tf = matched.groupBy(col(idCol), col("_term"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val termSum = tf
      .join(broadcast(cf), Seq("_term"))
      .crossJoin(broadcast(total))
      .join(broadcast(qt), Seq("_term"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(log(lit(1.0) +
        col("_tf") * col("_total") / (lit(mu) * col("_cf")))).as("_s"))
    termSum
      .join(dl, Seq(idCol))
      .join(broadcast(qlen), Seq(queryIdCol))
      .select(col(queryIdCol), col(idCol),
        (col("_s") + col("_qlen") * log(lit(mu) / (col("_dl") + mu)))
          .as("score"))
  }

  /** The corpus token stream (idCol, _term) — one row per token
    * occurrence, generated in the scan stage. Factored out so callers
    * that need the stream more than once (PRF's two rounds + feedback
    * join) can persist ONE frame instead of re-tokenizing per pass. */
  def tokenStream(docs: DataFrame, idCol: String, termCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
      .as(termCol))

  /** Per-doc lengths + the one-row corpus stats frame bm25 broadcasts. */
  private def docLengthsAndStats(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val dl = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("_dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("_n_docs"),
      avg(TextAnalysis.tokenCount(col(textCol))).as("_avgdl"))
    (dl, stats)
  }

  /** BM25 over a pre-built token stream (see [[bm25]] for semantics). */
  private def bm25Core(tok: DataFrame, dlStats: (DataFrame, DataFrame),
      queries: DataFrame, idCol: String, queryIdCol: String,
      termCol: String, k1: Double, b: Double): DataFrame = {
    val (dl, stats) = dlStats
    val qt = queries.select(col(queryIdCol), col(termCol).as("_term")).distinct()
    val qterms = qt.select("_term").distinct()

    // corpus-side: filter the token stream to query terms FIRST (the
    // broadcast semi join runs in the scan stage), then count tf —
    // the (doc, term) shuffle carries only matching rows
    val tf = tok.join(broadcast(qterms), Seq("_term"))
      .groupBy(col(idCol), col("_term"))
      .agg(count(lit(1)).as("_tf"))

    // df per query term: tf is already distinct per (doc, term)
    val df = tf.groupBy("_term").agg(count(lit(1)).cast("double").as("_df"))

    val contrib = tf
      .join(dl, Seq(idCol))
      .join(broadcast(df), Seq("_term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qt), Seq("_term"))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n_docs") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_c",
        col("_idf") * col("_tf") * (k1 + 1.0) /
          (col("_tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl"))))

    contrib.groupBy(col(queryIdCol), col(idCol))
      .agg(sum("_c").as("score"))
  }

  /** Overlapping fixed-size token chunks: windows of `chunkTokens`
    * whitespace tokens every `stride` tokens, the last chunk clipped
    * to the document end (and emitted even when shorter). Documents
    * with no tokens produce no chunks. Output: (idCol, chunk_idx,
    * n_chunk_tokens, chunk_text).
    *
    * Pure scan-stage projection — sequence + explode + slice are all
    * codegen'd; chunk count per doc is 1 + ceil(max(n−chunkTokens,0) /
    * stride) computed in exact integer arithmetic.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens and stride must be positive (got $chunkTokens, $stride)")
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .filter(col("_n") > 0)
      // ceil((n - chunkTokens) / stride) for n > chunkTokens, else 0,
      // as floor((n - chunkTokens + stride - 1) / stride); the double
      // division is exact-then-truncated (token counts ≪ 2^53)
      .withColumn("_last",
        when(col("_n") > chunkTokens,
          floor((col("_n") - chunkTokens + (stride - 1)).divide(stride)))
          .otherwise(lit(0L)))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("_last"))))
      .withColumn("_ct",
        slice(col("_toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)))
      .select(col(idCol), col("chunk_idx"),
        size(col("_ct")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("_ct")).as("chunk_text"))
  }

  /** Exact phrase search over positional postings — the operator a
    * lexical index serves for quoted queries, and the verbatim-overlap
    * primitive decontamination sweeps build on. Phrases are
    * whitespace-tokenized like the corpus ([[TextAnalysis.tokens]]);
    * a document matches at `anchor` when token `anchor + i` equals
    * phrase token `i` for every i — the classic positional-postings
    * intersection by anchor alignment: each corpus token matching a
    * phrase term votes for the anchor `pos − qpos`, and an anchor with
    * all `n` phrase positions voting is an occurrence.
    *
    * Scale shape: the phrase-term table is tiny and BROADCAST, so the
    * corpus token stream is cut to matching tokens map-side in the
    * scan stage; the only shuffle carries (query, doc, anchor) votes
    * for matching tokens — df-bounded like bm25's tf stream, never
    * corpus-sized. Overlapping occurrences all report (a phrase of n
    * identical tokens over a run of m reports m−n+1 anchors).
    *
    * Output: (queryIdCol, idCol, n_occurrences, first_pos) for
    * documents with ≥ 1 occurrence; positions are 0-based. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame, queryIdCol: String, phraseCol: String): DataFrame = {
    val pt = phrases
      .select(col(queryIdCol), TextAnalysis.tokens(col(phraseCol)).as("_pt"))
      .withColumn("_n", size(col("_pt")).cast("long"))
      .filter(col("_n") > 0)
      .select(col(queryIdCol), col("_n"),
        posexplode(col("_pt")).as(Seq("_qpos", "_term")))
    val tok = docs
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("_pos", "_term")))
    // within one (query, doc, anchor) group each matched qpos appears
    // exactly once (pos = anchor + qpos is injective in qpos), so
    // count(*) counts matched phrase positions
    val anchors = tok.join(broadcast(pt), Seq("_term"))
      .withColumn("_anchor", col("_pos") - col("_qpos"))
      .filter(col("_anchor") >= 0)
      .groupBy(col(queryIdCol), col(idCol), col("_anchor"))
      .agg(count(lit(1)).as("_hits"), max(col("_n")).as("_need"))
      .filter(col("_hits") === col("_need"))
    anchors.groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("_anchor")).cast("long").as("first_pos"))
  }

  /** Proximity ranking for two-term queries: documents where both
    * terms occur within `window` token positions of each other,
    * scored by the number of such position pairs and the minimum
    * distance, top-`k` per query — the "terms near each other"
    * operator between [[bm25]]'s bag-of-words and [[phraseSearch]]'s
    * exact adjacency.
    *
    * Scale shape: the per-doc position-pair join is quadratic in
    * occurrence counts if keyed by doc alone (a 10⁶-token doc with
    * frequent terms explodes); adding the position bucket ⌊pos/window⌋
    * to the equi key bounds candidates by bucket occupancy instead —
    * the a-side explodes to its own and both adjacent buckets, the
    * b-side keys its own, so every |Δpos| ≤ window pair is found
    * exactly once (buckets of width `window` can differ by at most 1)
    * and nothing outside ±1 bucket is ever paired. The query-term
    * frames broadcast; the only corpus-sized shuffle carries matched
    * occurrences. The final rank window runs per query over the
    * df-bounded candidate frame, never the corpus. */
  def proximityRank(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, queryIdCol: String, termACol: String,
      termBCol: String, window: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("_pos", "_term")))
    def side(termCol: String, posName: String) = tok
      .join(broadcast(pairs.select(col(queryIdCol), col(termCol).as("_term"))),
        Seq("_term"))
      .select(col(queryIdCol), col(idCol), col("_pos").as(posName))
    val pa = side(termACol, "_pa")
      .withColumn("_bkt", explode(array(
        expr(s"_pa div $window") - 1, expr(s"_pa div $window"),
        expr(s"_pa div $window") + 1)))
    val pb = side(termBCol, "_pb")
      .withColumn("_bkt", expr(s"_pb div $window"))
    val scored = pa.join(pb, Seq(queryIdCol, idCol, "_bkt"))
      .filter(abs(col("_pa") - col("_pb")) <= window)
      .groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("_pa") - col("_pb"))).cast("long").as("min_dist"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("n_pairs").desc, col("min_dist"), col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** NDCG@k with graded relevance — the ranking-quality metric that
    * credits partially-relevant results where [[evalMetrics]]' binary
    * recall/MRR cannot. `graded` carries (query, doc, rel ≥ 0);
    * DCG@k = Σ_{i≤k} rel_i / (ln(i+1)/ln 2) over the ranking (missing
    * docs count rel 0), IDCG@k the same sum over the k best graded
    * rows (rel desc, id asc tiebreak), NDCG their ratio. The log2
    * discount is spelled ln(i+1)/ln(2) in BOTH engines (the BM25 ln
    * precedent — identical libm doubles), sums have ≤ k terms, and
    * all three emit at 4 dp, so the metric table replays exactly.
    *
    * Conventions (mirroring [[evalMetrics]]' gold-driven base): the
    * metric table has one row per query PRESENT IN `graded` — a query
    * with no judgments has no ideal ordering, so NDCG is undefined and
    * the query emits no row. A judged query whose relevances are all
    * zero has IDCG 0; its NDCG reports 0 (not NaN) — nothing relevant
    * existed to rank.
    *
    * Scale shape: two small per-query aggregates over broadcast-sized
    * metric inputs (rankings are already top-k per query); the graded
    * table broadcasts into the ranking join. */
  def ndcg(ranked: DataFrame, graded: DataFrame, queryIdCol: String,
      idCol: String, relCol: String, rankCol: String = "rank",
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ln2 = math.log(2.0)
    val dcg = ranked.filter(col(rankCol) <= k)
      .join(broadcast(graded.select(col(queryIdCol), col(idCol), col(relCol))),
        Seq(queryIdCol, idCol), "left")
      .groupBy(queryIdCol)
      .agg(sum(coalesce(col(relCol), lit(0L)).cast("double") /
        (log(col(rankCol) + 1.0) / ln2)).as("_dcg"))
    val wi = Window.partitionBy(queryIdCol)
      .orderBy(desc(relCol), col(idCol))
    val idcg = graded
      .withColumn("_ir", row_number().over(wi).cast("long"))
      .filter(col("_ir") <= k)
      .groupBy(queryIdCol)
      .agg(sum(col(relCol).cast("double") /
        (log(col("_ir") + 1.0) / ln2)).as("_idcg"))
    idcg.join(dcg, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        round(coalesce(col("_dcg"), lit(0.0)), 4).as("dcg_at_k"),
        round(col("_idcg"), 4).as("idcg_at_k"),
        round(when(col("_idcg") > 0.0,
            coalesce(col("_dcg"), lit(0.0)) / col("_idcg"))
          .otherwise(lit(0.0)), 4).as("ndcg_at_k"))
  }

  /** Pseudo-relevance-feedback retrieval (Rocchio/RM-style PRF): BM25
    * round 1 with the original terms, the top `feedbackDocs` results
    * per query are presumed relevant, their `expandTerms` most
    * frequent terms (total tf across the feedback docs, original terms
    * excluded, term-string tiebreak) join the query, and round 2
    * re-ranks with the expanded set. Output: (query, doc, score_r,
    * rank ≤ k) from round 2. Exact counting + the 4-dp-round ranking
    * idiom at every decision point → engine-replayable end to end.
    *
    * Scale shape: round 1 is [[bm25]] (already top-k'd per query), the
    * feedback token join touches feedbackDocs·queries docs, round 2 is
    * [[bm25]] with a slightly larger broadcast term set — no shuffle
    * class beyond BM25 itself. */
  /** Corpus-size policy for [[prfSearch]]'s token-stream reuse: the
    * three consumers (both BM25 rounds + the feedback join) can either
    * re-derive the scan-stage tokenize per pass or share one PERSISTED
    * stream. Measured at sf0.1 (5 k docs): re-tokenizing wins (~2.6 s
    * vs ~4.0 s — the cache round-trip of the full token stream costs
    * more than three cheap scans); above it, corpus decode dominates
    * and one materialization beats three re-reads — the same
    * size-crossover logic as [[Dedup.usePrefixFilter]]. Output is
    * identical on either path (purely a cost decision). */
  def reuseTokenStream(nDocs: Long): Boolean = nDocs >= 50000L

  def prfSearch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      feedbackDocs: Int = 3, expandTerms: Int = 2, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // token-stream reuse by corpus size (see [[reuseTokenStream]]):
    // persisted and shared across the three consumers at scale,
    // re-derived per pass below the crossover
    val reuse = reuseTokenStream(docs.count())
    val tokBase = tokenStream(docs, idCol, "_term", textCol)
    val tok = if (reuse) tokBase.persist() else tokBase
    val dlStats = docLengthsAndStats(docs, idCol, textCol)
    val wRank = Window.partitionBy(queryIdCol).orderBy(desc("score_r"), col(idCol))
    val top = bm25Core(tok, dlStats, queries, idCol, queryIdCol, termCol, 1.2, 0.75)
      .withColumn("score_r", round(col("score"), 4))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= feedbackDocs)
      .select(queryIdCol, idCol)
    val wExp = Window.partitionBy(queryIdCol).orderBy(desc("_tf"), col("_term"))
    val expansion = top
      .join(tok, Seq(idCol))
      .join(queries.select(col(queryIdCol), col(termCol).as("_term")),
        Seq(queryIdCol, "_term"), "left_anti")
      .groupBy(col(queryIdCol), col("_term")).agg(count(lit(1)).as("_tf"))
      .withColumn("_rn", row_number().over(wExp))
      .filter(col("_rn") <= expandTerms)
      .select(col(queryIdCol), col("_term").as(termCol))
    val expanded = queries.select(col(queryIdCol), col(termCol))
      .unionByName(expansion)
    val out = bm25Core(tok, dlStats, expanded, idCol, queryIdCol, termCol, 1.2, 0.75)
      .withColumn("score_r", round(col("score"), 4))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("score_r"), col("rank"))
    if (reuse) {
      // materialize eagerly so the cache can be released here rather
      // than leak until the caller's next clearCache
      val mat = out.localCheckpoint(true)
      tok.unpersist(blocking = false)
      mat
    } else out
  }

  /** Ranking-quality evaluation — the rollup every retrieval pipeline
    * reports: per query, `n_gold`, `n_hits` (gold docs retrieved at
    * rank ≤ k), `recall_at_k`, and `mrr_at_k` (1 / rank of the first
    * relevant result, 0 when none lands in the top k). Queries with an
    * empty gold set have no denominator and emit no row.
    *
    * Purely relational — two (query, doc) equi-joins and a per-query
    * aggregate; `gold` (an eval set) is tiny and broadcast. Rank
    * reciprocals are exact IEEE on every engine, so the metric table
    * is oracle-able end to end. */
  def evalMetrics(ranked: DataFrame, gold: DataFrame, queryIdCol: String,
      idCol: String, rankCol: String = "rank", k: Int = 10): DataFrame = {
    val g = gold.select(col(queryIdCol), col(idCol)).distinct()
    val nGold = g.groupBy(queryIdCol).agg(count(lit(1)).as("n_gold"))
    val hits = ranked.filter(col(rankCol) <= k)
      .join(broadcast(g), Seq(queryIdCol, idCol))
      .groupBy(queryIdCol)
      .agg(count(lit(1)).as("_h"), min(col(rankCol)).as("_first"))
    nGold.join(hits, Seq(queryIdCol), "left")
      .select(col(queryIdCol), col("n_gold"),
        coalesce(col("_h"), lit(0L)).as("n_hits"),
        round(coalesce(col("_h"), lit(0L)) / col("n_gold"), 4).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("_first"), lit(0.0)), 4).as("mrr_at_k"))
  }

  /** Hard-negative mining for contrastive / reranker training — the
    * step that turns a retrieval corpus into (query, positive,
    * negative) triplets: for each query, every gold-relevant document
    * pairs with the `nNeg` HIGHEST-ranked non-gold documents from the
    * retriever's list. Top-ranked non-relevant hits are the "hard"
    * negatives — lexically close enough to fool the retriever — which
    * train far stronger embedders than random negatives (the DPR /
    * sentence-transformers recipe).
    *
    * Plan shape: the ranked list anti-joins gold (broadcast — gold is
    * labels, not corpus), a per-query window re-ranks the survivors
    * (rank cardinality ≤ the retriever's k, never corpus-sized), and
    * the positive×negative pairing is a per-query join bounded by
    * |gold(q)| · nNeg. Output: (query, pos_<id>, neg_<id>, neg_rank,
    * plus the negative's retrieval score columns). */
  def hardNegatives(ranked: DataFrame, gold: DataFrame, queryIdCol: String,
      idCol: String, rankCol: String = "rank", nNeg: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = gold.select(col(queryIdCol), col(idCol)).distinct()
    // id tie-break: a retriever may emit duplicate ranks (score ties
    // re-ranked downstream, or fused lists); row_number over rank
    // alone would then be partition-order-dependent
    val w = Window.partitionBy(queryIdCol).orderBy(col(rankCol), col(idCol))
    val negs = ranked.join(broadcast(g), Seq(queryIdCol, idCol), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= nNeg)
      .withColumnRenamed(idCol, s"neg_$idCol")
      .drop(rankCol)
    g.withColumnRenamed(idCol, s"pos_$idCol")
      .join(negs, Seq(queryIdCol))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two ranked
    * retrieval lists — the standard way to combine lexical (BM25) and
    * dense (embedding) retrieval without score calibration:
    * rrf(q, d) = Σ_lists 1 / (kRrf + rank_list(q, d)), where a list
    * that didn't retrieve the document contributes 0 (full outer
    * join). Rank-based, so it composes any two retrievers whose score
    * scales are incomparable; kRrf = 60 is the paper's constant.
    *
    * Purely relational — one full-outer join on (query, doc) — and
    * deterministic given deterministic input ranks, so the fused
    * ranking is DuckDB-oracle-able end to end. Output: (queryIdCol,
    * idCol, rrf) one row per (query, doc) retrieved by EITHER list;
    * callers rank/truncate downstream. */
  def rrfFuse(a: DataFrame, b: DataFrame, queryIdCol: String, idCol: String,
      rankCol: String = "rank", kRrf: Int = 60): DataFrame = {
    val aa = a.select(col(queryIdCol), col(idCol), col(rankCol).as("_ra"))
    val bb = b.select(col(queryIdCol), col(idCol), col(rankCol).as("_rb"))
    aa.join(bb, Seq(queryIdCol, idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("_rb")), lit(0.0)))
      .drop("_ra", "_rb")
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998) — the standard diversity pass after retrieval: pick
    * greedily, each step taking the candidate maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), so near-duplicates
    * of already-selected results are pushed down. The RAG answer to
    * "my top-10 is ten copies of the same page".
    *
    * `cands` holds each query's shortlist (queryIdCol, idCol, relCol)
    * — relevance ROUNDED by the caller (the s1/r1 idiom) so the greedy
    * argmax is deterministic with the id tiebreak. `pairSims` carries
    * (queryIdCol, "id_a", "id_b", "sim"), pre-rounded; an ABSENT pair
    * row counts as sim 0 (sparse-retrieval semantics — a thresholded
    * similarity table works, its pruned near-zero pairs contribute no
    * penalty), so candidates are never silently dropped. Greedy
    * selection is inherently sequential in k, so the plan is k
    * bounded rounds — but each round is one distributed join+window
    * over ALL queries at once: the scale axis (query count) stays
    * parallel, and per-query state is O(m). The shortlist, pair-sim,
    * running-max, and remaining frames are pinned with localCheckpoint
    * as the rounds go, so round t reuses round t−1's materialization
    * instead of re-deriving the whole prefix (the shortlist is often a
    * window over an expensive similarity join — without pinning it
    * would re-run ~k times and the max-sim chain would cost O(k²)
    * joins). Selection and scores are deterministic →
    * DuckDB-replayable with a recursive CTE.
    *
    * Output: (queryIdCol, idCol, mmr, rank) for rank 1..k; mmr at
    * rank 1 carries no diversity penalty (empty selected set). */
  def mmrRerank(cands: DataFrame, pairSims: DataFrame, queryIdCol: String,
      idCol: String, relCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val c = cands.select(col(queryIdCol).as("_q"), col(idCol).as("_d"),
      col(relCol).cast("double").as("_rel"))
      .localCheckpoint()
    val ps = pairSims.select(col(queryIdCol).as("_q"), col("id_a").as("_da"),
      col("id_b").as("_db"), col("sim").cast("double").as("_s"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_q").orderBy(desc("_mmr"), col("_d"))

    // rank 1: pure relevance argmax (ties → smaller id). Each pick
    // frame is one row per query — localCheckpoint pins it so later
    // rounds don't recompute the whole prefix of the greedy chain.
    var picks = c.withColumn("_mmr", round(lit(lambda) * col("_rel"), 6))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("_q"), col("_d"), col("_mmr"), lit(1L).as("rank"))
      .localCheckpoint()
    var selected = picks
    var remaining = c.join(picks.select("_q", "_d"), Seq("_q", "_d"), "left_anti")
      .localCheckpoint()
    // running max-sim-to-selected per remaining candidate, seeded from
    // the rank-1 pick and folded with greatest() each round — O(Q·m)
    // state, never a growing set scan. Absent pair rows are sim 0.
    def simTo(p: DataFrame): DataFrame =
      ps.join(p.select(col("_q"), col("_d").as("_db")), Seq("_q", "_db"))
        .select(col("_q"), col("_da").as("_d"), col("_s"))
    var ms = remaining.select(col("_q"), col("_d"))
      .join(simTo(picks), Seq("_q", "_d"), "left")
      .select(col("_q"), col("_d"),
        coalesce(col("_s"), lit(0.0)).as("_ms_cur"))
      .localCheckpoint()
    for (t <- 2 to k) {
      val pick = remaining.join(ms, Seq("_q", "_d"))
        .withColumn("_mmr", round(lit(lambda) * col("_rel") -
          lit(1.0 - lambda) * col("_ms_cur"), 6))
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1)
        .select(col("_q"), col("_d"), col("_mmr"), lit(t.toLong).as("rank"))
        .localCheckpoint()
      selected = selected.unionByName(pick)
      remaining = remaining
        .join(pick.select("_q", "_d"), Seq("_q", "_d"), "left_anti")
        .localCheckpoint()
      ms = ms.join(simTo(pick).withColumnRenamed("_s", "_s_new"),
          Seq("_q", "_d"), "left")
        .select(col("_q"), col("_d"),
          greatest(col("_ms_cur"), coalesce(col("_s_new"), col("_ms_cur")))
            .as("_ms_cur"))
        .localCheckpoint()
    }
    selected.select(col("_q").as(queryIdCol), col("_d").as(idCol),
      col("_mmr").as("mmr"), col("rank"))
  }
}
