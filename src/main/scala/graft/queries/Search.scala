package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.pipeline.Retrieval

/** Lexical retrieval + chunking battery entries — the search-side
  * complement of the embedding ANN family (s1–s3): BM25 ranking and
  * RAG-style overlapping chunk materialization, both deterministic →
  * DuckDB-oracled.
  */
object Search {

  /** Three fixed keyword queries ranked by BM25, top-10 each. Ranking
    * is on the 4-dp-rounded score with doc_id tiebreak so both engines
    * order identically despite last-ulp float differences (the s1
    * idiom). */
  def r1Bm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "join"),
      (2L, "spark"), (2L, "stream"), (2L, "window"),
      (3L, "slow"), (3L, "query")).toDF("query_id", "term")
    val w = Window.partitionBy("query_id").orderBy(desc("score_r"), col("doc_id"))
    Retrieval.bm25(documents(s, d), "doc_id", "text", qs, "query_id", "term")
      .withColumn("score_r", round(col("score"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("doc_id"), col("score_r"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val r1Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |    (1, 'vector'), (1, 'hash'), (1, 'join'),
      |    (2, 'spark'), (2, 'stream'), (2, 'window'),
      |    (3, 'slow'), (3, 'query')),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split(trim(text), ' '), t -> t != '')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id,
      |    len(list_filter(string_split(trim(text), ' '), t -> t != '')) AS dl
      |  FROM documents),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |         AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |tf AS (SELECT t.doc_id, t.term, COUNT(*) AS tf
      |       FROM tok t WHERE t.term IN (SELECT term FROM q)
      |       GROUP BY t.doc_id, t.term),
      |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |sc AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * 2.2
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  JOIN q ON q.term = tf.term, st
      |  GROUP BY q.query_id, tf.doc_id),
      |r AS (SELECT query_id, doc_id, ROUND(score, 4) AS score_r,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |      FROM sc)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_r,
      |  CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** RAG-style chunking: 40-token windows every 30 tokens (10-token
    * overlap), last chunk clipped. The chunk text rides as an md5 so
    * the compared artifact stays narrow while still pinning every
    * byte of every chunk. */
  def r2Chunk(s: SparkSession, d: String): DataFrame =
    Retrieval.chunk(documents(s, d), "doc_id", "text",
        chunkTokens = 40, stride = 30)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  val r2Sql: String =
    """WITH w AS (SELECT doc_id,
      |    list_filter(string_split(trim(text), ' '), t -> t != '') AS wd
      |  FROM documents),
      |n AS (SELECT doc_id, wd, len(wd) AS n FROM w WHERE len(wd) > 0),
      |c AS (SELECT doc_id, wd, n,
      |    unnest(generate_series(0,
      |      CASE WHEN n > 40 THEN (n - 40 + 29) // 30 ELSE 0 END)) AS ci
      |  FROM n),
      |ch AS (SELECT doc_id, ci, wd[ci * 30 + 1 : ci * 30 + 40] AS ct FROM c)
      |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
      |  CAST(len(ct) AS BIGINT) AS n_chunk_tokens,
      |  md5(array_to_string(ct, ' ')) AS chunk_md5
      |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  /** Hybrid retrieval: the r1 BM25 lexical ranking fused with a dense
    * cosine ranking by reciprocal-rank fusion
    * ([[Retrieval.rrfFuse]]) — the standard two-tower RAG retrieval
    * stack as one relational program. The dense side embeds each query
    * as the embeddings-table vector sharing its id (a stand-in for a
    * query encoder; the FUSION is what's under test). Both input
    * rankings use the 4-dp-rounded-score + id-tiebreak idiom (s1/r1),
    * so the fused ranking is deterministic and fully DuckDB-oracled —
    * rank arithmetic 1/(60+r) is exact-identical IEEE on both
    * engines. */
  def r3HybridRrf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "join"),
      (2L, "spark"), (2L, "stream"), (2L, "window"),
      (3L, "slow"), (3L, "query")).toDF("query_id", "term")
    val wl = Window.partitionBy("query_id").orderBy(desc("score_r"), col("doc_id"))
    val lex = Retrieval.bm25(documents(s, d), "doc_id", "text", qs, "query_id", "term")
      .withColumn("score_r", round(col("score"), 4))
      .withColumn("rank", row_number().over(wl).cast("long"))
      .filter(col("rank") <= 20)
      .select("query_id", "doc_id", "rank")
    val emb = embeddings(s, d)
    val q = emb.filter(col("vec_id").isin(1L, 2L, 3L)).limit(3) // no-op bound stamp (plan-gate maxRows idiom)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val wd = Window.partitionBy("query_id").orderBy(desc("sim_r"), col("vec_id"))
    val dense = graft.pipeline.Similarity
      .pairSims(emb, q, "vec_id", "query_id", "embedding", "q_embedding")
      .withColumn("sim_r", round(col("sim"), 4))
      .withColumn("rank", row_number().over(wd).cast("long"))
      .filter(col("rank") <= 20)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    val wf = Window.partitionBy("query_id").orderBy(desc("rrf_r"), col("doc_id"))
    Retrieval.rrfFuse(lex, dense, "query_id", "doc_id")
      .withColumn("rrf_r", round(col("rrf"), 6))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("doc_id"), col("rrf_r"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val r3Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |    (1, 'vector'), (1, 'hash'), (1, 'join'),
      |    (2, 'spark'), (2, 'stream'), (2, 'window'),
      |    (3, 'slow'), (3, 'query')),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split(trim(text), ' '), t -> t != '')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id,
      |    len(list_filter(string_split(trim(text), ' '), t -> t != '')) AS dl
      |  FROM documents),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |         AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |tf AS (SELECT t.doc_id, t.term, COUNT(*) AS tf
      |       FROM tok t WHERE t.term IN (SELECT term FROM q)
      |       GROUP BY t.doc_id, t.term),
      |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |sc AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * 2.2
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  JOIN q ON q.term = tf.term, st
      |  GROUP BY q.query_id, tf.doc_id),
      |lex AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |  FROM sc) WHERE rank <= 20),
      |e AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |qe AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
      |       FROM e WHERE vec_id IN (1, 2, 3)),
      |sims AS (
      |  SELECT qe.query_id, e.vec_id AS doc_id,
      |    ROUND(list_sum(list_transform(range(1, len(qv) + 1),
      |        k -> CAST(qv[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))
      |      / (qn * e.nrm), 4) AS sim_r
      |  FROM qe CROSS JOIN e WHERE e.vec_id != qe.query_id),
      |dense AS (SELECT query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY sim_r DESC, doc_id) AS rank
      |  FROM sims) WHERE rank <= 20),
      |f AS (SELECT COALESCE(l.query_id, dn.query_id) AS query_id,
      |        COALESCE(l.doc_id, dn.doc_id) AS doc_id,
      |        COALESCE(1.0 / (60 + l.rank), 0.0)
      |          + COALESCE(1.0 / (60 + dn.rank), 0.0) AS rrf
      |      FROM lex l FULL OUTER JOIN dense dn
      |        ON l.query_id = dn.query_id AND l.doc_id = dn.doc_id)
      |SELECT query_id, doc_id, ROUND(rrf, 6) AS rrf_r,
      |  CAST(rank AS BIGINT) AS rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY ROUND(rrf, 6) DESC, doc_id) AS rank
      |  FROM f)
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** MMR diversity re-rank of the dense top-12 shortlist (λ = 0.7,
    * k = 5): greedy λ·rel − (1−λ)·max-sim-to-selected over the r3
    * dense ranking's candidates ([[Retrieval.mmrRerank]]). Relevance
    * and candidate-pair cosines use the 4-dp-round + id-tiebreak
    * idiom, the greedy argmax rounds to 6 dp, so selection is
    * deterministic and the oracle replays it with a recursive CTE —
    * greedy MMR is exactly a 5-step recursion carrying the picked
    * set as a list. */
  def r5Mmr(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val q = emb.filter(col("vec_id").isin(1L, 2L, 3L)).limit(3) // no-op bound stamp (plan-gate maxRows idiom)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val wd = Window.partitionBy("query_id").orderBy(desc("sim_r"), col("vec_id"))
    val cand = graft.pipeline.Similarity
      .pairSims(emb, q, "vec_id", "query_id", "embedding", "q_embedding")
      .withColumn("sim_r", round(col("sim"), 4))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") <= 12)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("sim_r"))
    val cv = cand.select("query_id", "doc_id")
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
    val ps = cv.select(col("query_id"), col("doc_id").as("id_a"),
        col("embedding").as("_va"))
      .join(cv.select(col("query_id"), col("doc_id").as("id_b"),
        col("embedding").as("_vb")), Seq("query_id"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("query_id"), col("id_a"), col("id_b"),
        round(graft.pipeline.Similarity.cosine(col("_va"), col("_vb")), 4)
          .as("sim"))
    Retrieval.mmrRerank(cand, ps, "query_id", "doc_id", "sim_r",
        k = 5, lambda = 0.7)
      // the MMR score can sit at a tiny negative — pin the sign of
      // zero on both engines (graft.queries.Num.rnd0 rule)
      .select(col("query_id"), col("doc_id"),
        (col("mmr") + lit(0.0)).as("mmr_r"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val r5Sql: String =
    """WITH RECURSIVE
      |e AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |qe AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
      |       FROM e WHERE vec_id IN (1, 2, 3)),
      |sims AS (
      |  SELECT qe.query_id, e.vec_id AS doc_id,
      |    ROUND(list_sum(list_transform(range(1, len(qv) + 1),
      |        k -> CAST(qv[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))
      |      / (qn * e.nrm), 4) AS sim_r
      |  FROM qe CROSS JOIN e WHERE e.vec_id != qe.query_id),
      |cand AS (SELECT query_id, doc_id, sim_r FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY sim_r DESC, doc_id) AS rn FROM sims) WHERE rn <= 12),
      |cv AS (SELECT c.query_id, c.doc_id, c.sim_r, e.embedding AS v, e.nrm
      |       FROM cand c JOIN e ON c.doc_id = e.vec_id),
      |ps AS (
      |  SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
      |    ROUND(list_sum(list_transform(range(1, len(a.v) + 1),
      |        k -> CAST(a.v[k] AS DOUBLE) * CAST(b.v[k] AS DOUBLE)))
      |      / (a.nrm * b.nrm), 4) AS s
      |  FROM cv a JOIN cv b ON a.query_id = b.query_id AND a.doc_id != b.doc_id),
      |sel AS (
      |  SELECT query_id, doc_id, 1 AS rank, [doc_id] AS picked,
      |         ROUND(0.7 * sim_r, 6) AS mmr
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY sim_r DESC, doc_id) AS rn FROM cand) WHERE rn = 1
      |  UNION ALL
      |  SELECT query_id, pick.d AS doc_id, rank + 1, list_append(picked, pick.d),
      |         -pick.ns AS mmr
      |  FROM (
      |    SELECT query_id, rank, picked,
      |           MIN({'ns': -score, 'd': doc_id}) AS pick
      |    FROM (
      |      SELECT s.query_id, s.rank, s.picked, c.doc_id,
      |             ROUND(0.7 * c.sim_r - 0.3 * MAX(p.s), 6) AS score
      |      FROM sel s
      |      JOIN cand c ON c.query_id = s.query_id
      |        AND NOT list_contains(s.picked, c.doc_id)
      |      JOIN ps p ON p.query_id = s.query_id AND p.da = c.doc_id
      |        AND list_contains(s.picked, p.db)
      |      WHERE s.rank < 5
      |      GROUP BY s.query_id, s.rank, s.picked, c.doc_id, c.sim_r
      |    )
      |    GROUP BY query_id, rank, picked
      |  )
      |)
      |SELECT query_id, doc_id, mmr + 0.0 AS mmr_r, CAST(rank AS BIGINT) AS rank
      |FROM sel ORDER BY query_id, rank""".stripMargin

  /** Retrieval evaluation over the r1 ranking: gold(q) = docs
    * containing ALL the query's terms (conjunctive match — exact and
    * engine-replayable, the stand-in for human relevance labels), then
    * [[Retrieval.evalMetrics]] reports per-query recall@10 / MRR@10.
    * The whole metric table is deterministic → fully oracled. */
  /** The conjunctive-match gold table behind r4: gold(q) = docs
    * containing ALL the query's terms — exact and engine-replayable,
    * the stand-in for human relevance labels. */
  private def goldTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "join"),
      (2L, "spark"), (2L, "stream"), (2L, "window"),
      (3L, "slow"), (3L, "query")).toDF("query_id", "term")
    val tok = documents(s, d).select(col("doc_id"),
      explode(array_distinct(graft.pipeline.TextAnalysis.tokens(col("text"))))
        .as("term"))
    val nq = qs.groupBy("query_id").agg(countDistinct(col("term")).as("_nt"))
    qs.join(tok, Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(countDistinct(col("term")).as("_m"))
      .join(nq, Seq("query_id"))
      .filter(col("_m") === col("_nt"))
      .select("query_id", "doc_id")
  }

  def r4EvalMetrics(s: SparkSession, d: String): DataFrame =
    Retrieval.evalMetrics(r1Bm25(s, d), goldTable(s, d), "query_id",
        "doc_id", k = 10)
      .orderBy("query_id")

  val r4Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |    (1, 'vector'), (1, 'hash'), (1, 'join'),
      |    (2, 'spark'), (2, 'stream'), (2, 'window'),
      |    (3, 'slow'), (3, 'query')),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split(trim(text), ' '), t -> t != '')) AS term
      |  FROM documents),
      |dtok AS (SELECT DISTINCT doc_id, term FROM tok),
      |nq AS (SELECT query_id, COUNT(DISTINCT term) AS nt FROM q GROUP BY 1),
      |gold AS (SELECT q.query_id, t.doc_id
      |  FROM q JOIN dtok t USING (term) JOIN nq USING (query_id)
      |  GROUP BY q.query_id, t.doc_id, nq.nt
      |  HAVING COUNT(DISTINCT q.term) = nq.nt),
      |dl AS (SELECT doc_id,
      |    len(list_filter(string_split(trim(text), ' '), t -> t != '')) AS dl
      |  FROM documents),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |         AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |tf AS (SELECT t.doc_id, t.term, COUNT(*) AS tf
      |       FROM tok t WHERE t.term IN (SELECT term FROM q)
      |       GROUP BY t.doc_id, t.term),
      |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |sc AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * 2.2
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  JOIN q ON q.term = tf.term, st
      |  GROUP BY q.query_id, tf.doc_id),
      |r AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |  FROM sc) WHERE rank <= 10),
      |h AS (SELECT r.query_id, COUNT(*) AS n_hits, MIN(r.rank) AS frst
      |      FROM r JOIN gold
      |        ON r.query_id = gold.query_id AND r.doc_id = gold.doc_id
      |      GROUP BY r.query_id),
      |ng AS (SELECT CAST(query_id AS BIGINT) AS query_id,
      |         COUNT(*) AS n_gold FROM gold GROUP BY 1)
      |SELECT ng.query_id, ng.n_gold,
      |  COALESCE(h.n_hits, 0) AS n_hits,
      |  ROUND(COALESCE(h.n_hits, 0) / CAST(ng.n_gold AS DOUBLE), 4)
      |    AS recall_at_k,
      |  ROUND(COALESCE(1.0 / h.frst, 0.0), 4) AS mrr_at_k
      |FROM ng LEFT JOIN h USING (query_id)
      |ORDER BY ng.query_id""".stripMargin

  /** R11 (beyond ref): hard-negative mining for contrastive training
    * ([[Retrieval.hardNegatives]]) — positives are the TEACHER
    * retriever's top-3 (r10's query-likelihood ranking), and each
    * pairs with the 3 highest-BM25-ranked docs NOT in the teacher's
    * top-3: the cross-retriever distillation recipe (mine negatives
    * with a different retriever than the one that labeled positives,
    * so the negatives are lexically plausible but teacher-rejected).
    * r4's conjunctive gold is unusable here: on this corpus half the
    * docs contain every query term, so BM25's whole top-10 is gold
    * and the naive mine is empty. Rank arithmetic is engine-exact
    * (4-dp-rounded scores + doc_id tiebreak) → fully oracled. */
  def r11HardNegatives(s: SparkSession, d: String): DataFrame = {
    val teacherTop = r10Qlm(s, d).filter(col("rank") <= 3)
      .select("query_id", "doc_id")
    Retrieval.hardNegatives(r1Bm25(s, d), teacherTop, "query_id",
        "doc_id", "rank", nNeg = 3)
      .select(col("query_id"), col("pos_doc_id"), col("neg_doc_id"),
        col("neg_rank"), col("score_r").as("neg_score_r"))
      .orderBy("query_id", "pos_doc_id", "neg_rank")
  }

  val r11Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |    (1, 'vector'), (1, 'hash'), (1, 'join'),
      |    (2, 'spark'), (2, 'stream'), (2, 'window'),
      |    (3, 'slow'), (3, 'query')),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split(trim(text), ' '), t -> t != '')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id,
      |    len(list_filter(string_split(trim(text), ' '), t -> t != '')) AS dl
      |  FROM documents),
      |m AS (SELECT doc_id, term FROM tok
      |      WHERE term IN (SELECT term FROM q)),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM m GROUP BY 1, 2),
      |tot AS (SELECT SUM(CAST(dl AS DOUBLE)) AS total FROM dl),
      |qlen AS (SELECT query_id, COUNT(DISTINCT term) AS qlen
      |         FROM q GROUP BY 1),
      |cf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM m GROUP BY 1),
      |tts AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + tf.tf * tot.total / (300.0 * cf.cf))) AS s
      |  FROM tf JOIN cf USING (term) JOIN q ON q.term = tf.term, tot
      |  GROUP BY 1, 2),
      |tsc AS (SELECT tts.query_id, tts.doc_id,
      |    tts.s + qlen.qlen * ln(300.0 / (CAST(dl.dl AS DOUBLE) + 300.0))
      |      AS score
      |  FROM tts JOIN dl USING (doc_id) JOIN qlen USING (query_id)),
      |gold AS (SELECT query_id, doc_id FROM (
      |    SELECT query_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |    FROM tsc) WHERE rank <= 3),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |         AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |sc AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * 2.2
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  JOIN q ON q.term = tf.term, st
      |  GROUP BY q.query_id, tf.doc_id),
      |r AS (SELECT query_id, doc_id, ROUND(score, 4) AS score_r,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |      FROM sc),
      |neg AS (SELECT r.query_id, r.doc_id, r.score_r,
      |          ROW_NUMBER() OVER (PARTITION BY r.query_id
      |            ORDER BY r.rank) AS neg_rank
      |        FROM r WHERE r.rank <= 10 AND NOT EXISTS (
      |          SELECT 1 FROM gold g
      |          WHERE g.query_id = r.query_id AND g.doc_id = r.doc_id))
      |SELECT CAST(g.query_id AS BIGINT) AS query_id,
      |  g.doc_id AS pos_doc_id, n.doc_id AS neg_doc_id,
      |  CAST(n.neg_rank AS BIGINT) AS neg_rank, n.score_r AS neg_score_r
      |FROM gold g JOIN neg n ON g.query_id = n.query_id
      |WHERE n.neg_rank <= 3
      |ORDER BY query_id, pos_doc_id, neg_rank""".stripMargin

  /** NDCG@10 over the r1 BM25 ranking with GRADED relevance — rel(q,
    * doc) = how many of the query's terms the doc contains (1..3), the
    * graded companion to r4's binary recall/MRR ([[Retrieval.ndcg]]).
    * Log2 discounts are spelled ln(i+1)/ln 2 in both engines and all
    * metric columns emit at 4 dp → fully oracled. */
  def r6Ndcg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "join"),
      (2L, "spark"), (2L, "stream"), (2L, "window"),
      (3L, "slow"), (3L, "query")).toDF("query_id", "term")
    val tok = documents(s, d).select(col("doc_id"),
      explode(array_distinct(graft.pipeline.TextAnalysis.tokens(col("text"))))
        .as("term"))
    val graded = qs.join(tok, Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(countDistinct(col("term")).as("rel"))
    Retrieval.ndcg(r1Bm25(s, d), graded, "query_id", "doc_id", "rel", k = 10)
      .orderBy("query_id")
  }

  val r6Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |    (1, 'vector'), (1, 'hash'), (1, 'join'),
      |    (2, 'spark'), (2, 'stream'), (2, 'window'),
      |    (3, 'slow'), (3, 'query')),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split(trim(text), ' '), t -> t != '')) AS term
      |  FROM documents),
      |dtok AS (SELECT DISTINCT doc_id, term FROM tok),
      |gr AS (SELECT CAST(q.query_id AS BIGINT) AS query_id, t.doc_id,
      |         COUNT(DISTINCT q.term) AS rel
      |       FROM q JOIN dtok t USING (term) GROUP BY 1, 2),
      |dl AS (SELECT doc_id,
      |    len(list_filter(string_split(trim(text), ' '), t -> t != '')) AS dl
      |  FROM documents),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |         AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |tf AS (SELECT t.doc_id, t.term, COUNT(*) AS tf
      |       FROM tok t WHERE t.term IN (SELECT term FROM q)
      |       GROUP BY t.doc_id, t.term),
      |df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      |sc AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * 2.2
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  JOIN q ON q.term = tf.term, st
      |  GROUP BY q.query_id, tf.doc_id),
      |r AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |  FROM sc) WHERE rank <= 10),
      |dc AS (SELECT r.query_id,
      |         SUM(CAST(COALESCE(gr.rel, 0) AS DOUBLE)
      |             / (LN(r.rank + 1.0) / LN(2.0))) AS dcg
      |       FROM r LEFT JOIN gr
      |         ON r.query_id = gr.query_id AND r.doc_id = gr.doc_id
      |       GROUP BY r.query_id),
      |ic AS (SELECT query_id,
      |         SUM(CAST(rel AS DOUBLE) / (LN(ir + 1.0) / LN(2.0))) AS idcg
      |       FROM (SELECT query_id, doc_id, rel,
      |               ROW_NUMBER() OVER (PARTITION BY query_id
      |                 ORDER BY rel DESC, doc_id) AS ir
      |             FROM gr)
      |       WHERE ir <= 10 GROUP BY query_id)
      |SELECT ic.query_id,
      |  ROUND(COALESCE(dc.dcg, 0.0), 4) AS dcg_at_k,
      |  ROUND(ic.idcg, 4) AS idcg_at_k,
      |  ROUND(COALESCE(dc.dcg, 0.0) / ic.idcg, 4) AS ndcg_at_k
      |FROM ic LEFT JOIN dc USING (query_id)
      |ORDER BY ic.query_id""".stripMargin

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM-style PRF,
    * the classic two-round retrieval): round 1 ranks with the original
    * terms (r1's BM25), the top-3 docs per query are PRESUMED relevant,
    * their 2 most frequent terms (total tf across the feedback docs,
    * excluding the query's own terms; term-string tiebreak) expand the
    * query, and round 2 re-ranks with the expanded term set. Both
    * rounds are the same exact-count BM25 program; expansion selection
    * is integer counting with a lexicographic tiebreak → the whole
    * two-round pipeline replays in DuckDB.
    *
    * Scale shape: round-1 ranking is already top-k per query, the
    * feedback-doc token join touches 3 docs per query, and round 2 is
    * BM25 with a slightly larger broadcast term set — no new shuffle
    * class beyond r1 itself. */
  def r7PrfExpand(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "join"),
      (2L, "spark"), (2L, "stream"), (2L, "window"),
      (3L, "slow"), (3L, "query")).toDF("query_id", "term")
    Retrieval.prfSearch(documents(s, d), "doc_id", "text", qs,
        "query_id", "term", feedbackDocs = 3, expandTerms = 2, k = 10)
      .orderBy("query_id", "rank")
  }

  val r7Sql: String =
    """WITH q0(query_id, term) AS (VALUES
      |    (1, 'vector'), (1, 'hash'), (1, 'join'),
      |    (2, 'spark'), (2, 'stream'), (2, 'window'),
      |    (3, 'slow'), (3, 'query')),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split(trim(text), ' '), t -> t != '')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id,
      |    len(list_filter(string_split(trim(text), ' '), t -> t != '')) AS dl
      |  FROM documents),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |         AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |tf1 AS (SELECT t.doc_id, t.term, COUNT(*) AS tf
      |       FROM tok t WHERE t.term IN (SELECT term FROM q0)
      |       GROUP BY t.doc_id, t.term),
      |df1 AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf1 GROUP BY term),
      |sc1 AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * 2.2
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
      |  FROM tf1 tf JOIN df1 df USING (term) JOIN dl USING (doc_id)
      |  JOIN q0 q ON q.term = tf.term, st
      |  GROUP BY q.query_id, tf.doc_id),
      |top3 AS (SELECT query_id, doc_id FROM (
      |  SELECT query_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ROUND(score, 4) DESC, doc_id) AS rn
      |  FROM sc1) WHERE rn <= 3),
      |expn AS (SELECT query_id, term FROM (
      |  SELECT t3.query_id, tk.term,
      |    ROW_NUMBER() OVER (PARTITION BY t3.query_id
      |      ORDER BY COUNT(*) DESC, tk.term) AS rn
      |  FROM top3 t3 JOIN tok tk ON tk.doc_id = t3.doc_id
      |  WHERE NOT EXISTS (SELECT 1 FROM q0
      |    WHERE q0.query_id = t3.query_id AND q0.term = tk.term)
      |  GROUP BY t3.query_id, tk.term) WHERE rn <= 2),
      |q2 AS (SELECT CAST(query_id AS BIGINT) AS query_id, term FROM q0
      |       UNION ALL
      |       SELECT CAST(query_id AS BIGINT) AS query_id, term FROM expn),
      |tf2 AS (SELECT t.doc_id, t.term, COUNT(*) AS tf
      |       FROM tok t WHERE t.term IN (SELECT term FROM q2)
      |       GROUP BY t.doc_id, t.term),
      |df2 AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf2 GROUP BY term),
      |sc2 AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * 2.2
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
      |  FROM tf2 tf JOIN df2 df USING (term) JOIN dl USING (doc_id)
      |  JOIN q2 q ON q.term = tf.term, st
      |  GROUP BY q.query_id, tf.doc_id)
      |SELECT query_id, doc_id, ROUND(score, 4) AS score_r,
      |  CAST(rank AS BIGINT) AS rank FROM (
      |  SELECT query_id, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |  FROM sc2)
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Exact phrase search ([[Retrieval.phraseSearch]]): four quoted
    * queries against the positional-postings alignment, including a
    * repeated-token phrase ('table table table') whose overlapping
    * occurrences exercise the anchor arithmetic. Pure integer output
    * (counts + 0-based first position) → fully oracled. */
  def r8PhraseSearch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ph = Seq(
      (1L, "hash join"), (2L, "table scan"), (3L, "slow query"),
      (4L, "table table table")).toDF("query_id", "phrase")
    Retrieval.phraseSearch(documents(s, d), "doc_id", "text", ph,
        "query_id", "phrase")
      .orderBy("query_id", "doc_id")
  }

  val r8Sql: String =
    """WITH p(query_id, phrase) AS (VALUES
      |    (1, 'hash join'), (2, 'table scan'), (3, 'slow query'),
      |    (4, 'table table table')),
      |pw AS (SELECT query_id, string_split(phrase, ' ') AS wd FROM p),
      |pt AS (SELECT query_id, len(wd) AS n, qp - 1 AS qpos, wd[qp] AS term
      |       FROM (SELECT query_id, wd,
      |               unnest(generate_series(1, len(wd))) AS qp
      |             FROM pw)),
      |tw AS (SELECT doc_id,
      |    list_filter(string_split(trim(text), ' '), t -> t != '') AS wd
      |  FROM documents),
      |tok AS (SELECT doc_id, ps - 1 AS pos, wd[ps] AS term
      |        FROM (SELECT doc_id, wd,
      |                unnest(generate_series(1, len(wd))) AS ps
      |              FROM tw)),
      |an AS (SELECT pt.query_id, tok.doc_id,
      |         tok.pos - pt.qpos AS anchor, pt.n
      |       FROM tok JOIN pt USING (term)
      |       WHERE tok.pos - pt.qpos >= 0),
      |occ AS (SELECT query_id, doc_id, anchor
      |        FROM an GROUP BY query_id, doc_id, anchor, n
      |        HAVING COUNT(*) = n)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
      |  COUNT(*) AS n_occurrences,
      |  CAST(MIN(anchor) AS BIGINT) AS first_pos
      |FROM occ GROUP BY query_id, doc_id
      |ORDER BY query_id, doc_id""".stripMargin

  /** R9 (beyond ref): proximity ranking ([[Retrieval.proximityRank]])
    * — both terms within 5 token positions, scored by pair count +
    * min distance, top-10 per query; the position-pair join is
    * bucket-bounded (the j7/a16 trick), never per-doc quadratic.
    * Pure integer output with a deterministic (n_pairs desc,
    * min_dist, doc_id) tie rule → fully oracled. */
  def r9Proximity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val q = Seq(
      (1L, "hash", "join"), (2L, "table", "scan"),
      (3L, "slow", "query"), (4L, "sort", "merge"))
      .toDF("query_id", "term_a", "term_b")
    Retrieval.proximityRank(documents(s, d), "doc_id", "text", q,
        "query_id", "term_a", "term_b", window = 5, k = 10)
      .orderBy("query_id", "rank")
  }

  val r9Sql: String =
    """WITH q(query_id, ta, tb) AS (VALUES
      |    (1, 'hash', 'join'), (2, 'table', 'scan'),
      |    (3, 'slow', 'query'), (4, 'sort', 'merge')),
      |tw AS (SELECT doc_id,
      |    list_filter(string_split(trim(text), ' '), t -> t != '') AS wd
      |  FROM documents),
      |tok AS (SELECT doc_id, ps - 1 AS pos, wd[ps] AS term
      |        FROM (SELECT doc_id, wd,
      |                unnest(generate_series(1, len(wd))) AS ps
      |              FROM tw)),
      |pa AS (SELECT q.query_id, t.doc_id, t.pos
      |       FROM tok t JOIN q ON t.term = q.ta),
      |pb AS (SELECT q.query_id, t.doc_id, t.pos
      |       FROM tok t JOIN q ON t.term = q.tb),
      |pr AS (SELECT pa.query_id, pa.doc_id, COUNT(*) AS n_pairs,
      |         CAST(MIN(ABS(pa.pos - pb.pos)) AS BIGINT) AS min_dist
      |       FROM pa JOIN pb
      |         ON pa.query_id = pb.query_id AND pa.doc_id = pb.doc_id
      |        AND ABS(pa.pos - pb.pos) <= 5
      |       GROUP BY 1, 2)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_pairs,
      |  min_dist, CAST(rank AS BIGINT) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY n_pairs DESC, min_dist, doc_id) AS rank
      |      FROM pr)
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** R10 (beyond ref): Dirichlet query-likelihood retrieval
    * ([[Retrieval.queryLikelihood]], μ=300) — the language-modeling
    * ranking family next to r1's BM25, over the same query set so the
    * two rankings are directly comparable. Scores use the r1 idiom:
    * 4-dp rounding + doc_id tiebreak, top-10 per query. μ=300 sits
    * near the corpus mean doc length, the standard setting. */
  def r10Qlm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qs = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "join"),
      (2L, "spark"), (2L, "stream"), (2L, "window"),
      (3L, "slow"), (3L, "query")).toDF("query_id", "term")
    val w = Window.partitionBy("query_id").orderBy(desc("score_r"), col("doc_id"))
    Retrieval.queryLikelihood(documents(s, d), "doc_id", "text",
        qs, "query_id", "term", mu = 300.0)
      .withColumn("score_r", round(col("score"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("doc_id"), col("score_r"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val r10Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |    (1, 'vector'), (1, 'hash'), (1, 'join'),
      |    (2, 'spark'), (2, 'stream'), (2, 'window'),
      |    (3, 'slow'), (3, 'query')),
      |dl AS (SELECT doc_id,
      |    CAST(len(list_filter(string_split(trim(text), ' '),
      |      t -> t != '')) AS DOUBLE) AS dl
      |  FROM documents),
      |tot AS (SELECT SUM(dl) AS total FROM dl),
      |qlen AS (SELECT query_id, COUNT(DISTINCT term) AS qlen
      |         FROM q GROUP BY 1),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(string_split(trim(text), ' '), t -> t != ''))
      |      AS term
      |  FROM documents),
      |m AS (SELECT doc_id, term FROM tok
      |      WHERE term IN (SELECT term FROM q)),
      |cf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM m GROUP BY 1),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      |       FROM m GROUP BY 1, 2),
      |ts AS (SELECT q.query_id, tf.doc_id,
      |    SUM(ln(1.0 + tf.tf * tot.total / (300.0 * cf.cf))) AS s
      |  FROM tf JOIN cf USING (term) JOIN q ON q.term = tf.term, tot
      |  GROUP BY 1, 2),
      |sc AS (SELECT ts.query_id, ts.doc_id,
      |    ts.s + qlen.qlen * ln(300.0 / (dl.dl + 300.0)) AS score
      |  FROM ts JOIN dl USING (doc_id) JOIN qlen USING (query_id)),
      |r AS (SELECT query_id, doc_id, ROUND(score, 4) AS score_r,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      |  FROM sc)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_r,
      |  CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r10_qlm" -> (r10Qlm _),
    "r11_hard_negatives" -> (r11HardNegatives _),
    "r9_proximity" -> (r9Proximity _),
    "r1_bm25" -> (r1Bm25 _),
    "r2_chunk" -> (r2Chunk _),
    "r3_hybrid_rrf" -> (r3HybridRrf _),
    "r4_eval_metrics" -> (r4EvalMetrics _),
    "r5_mmr_rerank" -> (r5Mmr _),
    "r6_ndcg" -> (r6Ndcg _),
    "r7_prf_expand" -> (r7PrfExpand _),
    "r8_phrase_search" -> (r8PhraseSearch _))

  def oracles: Map[String, String] = Map(
    "r10_qlm" -> r10Sql,
    "r11_hard_negatives" -> r11Sql,
    "r9_proximity" -> r9Sql,
    "r1_bm25" -> r1Sql,
    "r2_chunk" -> r2Sql,
    "r3_hybrid_rrf" -> r3Sql,
    "r4_eval_metrics" -> r4Sql,
    "r5_mmr_rerank" -> r5Sql,
    "r6_ndcg" -> r6Sql,
    "r7_prf_expand" -> r7Sql,
    "r8_phrase_search" -> r8Sql)
}
