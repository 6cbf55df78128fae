package graft.queries

/** DuckDB oracle for the BPE queries (t14, e4) that REPLAYS THE
  * TRAINING ITSELF — no trained artifact crosses the engine boundary.
  *
  * [[graft.pipeline.Bpe]]'s trainer is deterministic (pair argmax tie
  * broken count-desc then pair-lexicographic; left-to-right
  * non-overlapping rewrite), so each of its `numMerges` greedy steps
  * is expressible as one pair of chained CTEs: `m_k` picks step k's
  * best pair from the step-(k−1) word table, `w_k` rewrites every word
  * with it. The chain is GENERATED here (the SQL is a pure function of
  * `numMerges`); after the last stage the word table holds each
  * vocabulary word's final tokenization, which is exactly what
  * `encodeCorpus` computes distributed — rank-priority encode ≡
  * in-order merge replay because a merge's operands exist only after
  * the merges that create them (so the lowest-rank applicable merge is
  * always the next training merge that applies at all; the same
  * argument pins the left-to-right fold: a fused token can never equal
  * its own left operand, `right` being non-empty).
  *
  * Exhaustion is handled like the trainer's early stop: when a stage
  * finds no pair (`m_k` empty), the scalar-aggregate cross join yields
  * NULL and `w_k` passes words through unchanged, so extra stages are
  * identity — the final table matches a trainer that stopped early.
  *
  * Every stage is `MATERIALIZED`: each w-table is referenced twice
  * (next m + next w) and DuckDB would otherwise inline the chain into
  * an exponentially duplicated scan.
  *
  * Assumption documented once: the oracle trains on the FULL
  * vocabulary while `Bpe.train` caps at `maxWords = 100000`; the
  * battery corpora have vocabularies orders of magnitude below the
  * cap, so the inputs coincide.
  */
object BpeOracle {

  private def stage(k: Int): String = {
    val p = k - 1
    s"""m$k AS MATERIALIZED (SELECT p[1] AS l, p[2] AS r FROM (
       |  SELECT p, SUM(n) AS c FROM (
       |    SELECT n, unnest([[syms[i], syms[i+1]] for i in range(1, len(syms))]) AS p
       |    FROM w$p)
       |  GROUP BY p) ORDER BY c DESC, p[1], p[2] LIMIT 1),
       |w$k AS MATERIALIZED (SELECT word, n,
       |  CASE WHEN mm.ml IS NULL THEN syms ELSE
       |    list_reduce(list_transform(syms, s -> [s]), (acc, x) ->
       |      CASE WHEN acc[len(acc)] = mm.ml AND x[1] = mm.mr
       |           THEN list_concat(acc[1:len(acc)-1], [mm.ml || mm.mr])
       |           ELSE list_concat(acc, x) END) END AS syms
       |  FROM w$p, (SELECT MAX(l) AS ml, MAX(r) AS mr FROM m$k) mm)""".stripMargin
  }

  /** `WITH` header + training chain: d0 (tokenized docs), w0 (word
    * frequencies + character symbols), then m1/w1 … m_n/w_n. */
  private def trainingCtes(numMerges: Int): String =
    s"""WITH
       |d0 AS MATERIALIZED (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), t -> t != '') AS wd
       |  FROM documents),
       |w0 AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS n,
       |    list_filter(string_split(word, ''), c -> c != '') AS syms
       |  FROM (SELECT unnest(wd) AS word FROM d0) GROUP BY word),
       |""".stripMargin + (1 to numMerges).map(stage).mkString(",\n")

  /** t14: per-document BPE token count. */
  def t14Sql(numMerges: Int): String =
    trainingCtes(numMerges) + s""",
       |dw AS (SELECT doc_id, wd[pos] AS word
       |  FROM (SELECT doc_id, wd, unnest(generate_series(1, len(wd))) AS pos
       |        FROM d0))
       |SELECT d0.doc_id, CAST(COALESCE(SUM(len(w.syms)), 0) AS BIGINT) AS n_bpe_tokens
       |FROM d0 LEFT JOIN dw ON d0.doc_id = dw.doc_id
       |LEFT JOIN w$numMerges w ON dw.word = w.word
       |GROUP BY d0.doc_id ORDER BY d0.doc_id""".stripMargin

  /** t17: tokenizer fertility per language — the tokenizer-diagnostics
    * rollup (BPE tokens per whitespace word). Same per-doc encode as
    * t14, joined to `lang` and aggregated. */
  def t17Sql(numMerges: Int): String =
    trainingCtes(numMerges) + s""",
       |dw AS (SELECT doc_id, wd[pos] AS word
       |  FROM (SELECT doc_id, wd, unnest(generate_series(1, len(wd))) AS pos
       |        FROM d0)),
       |per AS (SELECT d0.doc_id, len(d0.wd) AS nw,
       |    CAST(COALESCE(SUM(len(w.syms)), 0) AS BIGINT) AS nb
       |  FROM d0 LEFT JOIN dw ON d0.doc_id = dw.doc_id
       |  LEFT JOIN w$numMerges w ON dw.word = w.word
       |  GROUP BY d0.doc_id, len(d0.wd))
       |SELECT d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(per.nw) AS BIGINT) AS n_words,
       |  CAST(SUM(per.nb) AS BIGINT) AS n_bpe_tokens,
       |  ROUND(SUM(per.nb) / CAST(SUM(per.nw) AS DOUBLE), 4) AS fertility
       |FROM per JOIN documents d ON per.doc_id = d.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** e4: token streams packed into `seqLen`-token training sequences —
    * per-sequence doc/token counts + md5 signature of the exact
    * space-joined token stream (the p4 prefix-sum layout with real
    * token arrays spliced in). */
  def e4Sql(numMerges: Int, seqLen: Int): String =
    trainingCtes(numMerges) + s""",
       |dw AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, wd[pos] AS word
       |  FROM (SELECT doc_id, wd, unnest(generate_series(1, len(wd))) AS pos
       |        FROM d0)),
       |dt AS (SELECT doc_id, flatten(list(w.syms ORDER BY dw.pos)) AS toks
       |  FROM dw JOIN w$numMerges w ON dw.word = w.word GROUP BY doc_id),
       |c AS (SELECT doc_id, toks, len(toks) AS tok,
       |    CAST(SUM(len(toks)) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM dt),
       |s AS (SELECT doc_id, toks, cum - tok AS strt, cum FROM c WHERE tok > 0),
       |e AS (SELECT doc_id, toks, strt, cum,
       |    unnest(generate_series(strt // $seqLen, (cum - 1) // $seqLen)) AS seq
       |  FROM s),
       |sl AS (SELECT seq, doc_id,
       |    toks[GREATEST(strt, seq * $seqLen) - strt + 1
       |         : LEAST(cum, (seq + 1) * $seqLen) - strt] AS piece
       |  FROM e)
       |SELECT CAST(seq AS BIGINT) AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(piece)) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(flatten(list(piece ORDER BY doc_id)), ' ')) AS seq_sig
       |FROM sl GROUP BY seq ORDER BY seq_id""".stripMargin
}
