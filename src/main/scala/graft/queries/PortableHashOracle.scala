package graft.queries

/** Generated DuckDB replay SQL for the MinHash / SimHash battery
  * entries (d2, d3, d9, d10, cc3, e5).
  *
  * The whole family hashes with the engine-portable md5-64 base +
  * Mersenne-61 affine mixes ([[graft.functions.SimHashUtil.md5h64]]),
  * so the oracle can recompute every signature, band bucket, and
  * combined-block candidate bit-for-bit:
  *
  *  - base hash:  `('0x' || substr(md5(s), 1, 16))::UBIGINT` — the
  *    same 64 bits as the Scala side's first-8-md5-bytes long;
  *  - MinHash perm_i: `((a_i::HUGEINT * h61 + b_i) % (2^61-1))` —
  *    the 122-bit product fits HUGEINT exactly, mirroring the
  *    Math.multiplyHigh fold in SimHashUtil.mulModP; the affine
  *    constants are drawn HERE from the same cached generator the
  *    Catalyst expression uses, so the two sides cannot drift;
  *  - band bucket: md5 of the identical "band,v1,..,v4" decimal
  *    rendering (Spark keeps the first 8 bytes as a long, the oracle
  *    the first 16 hex chars — same bits, same collisions);
  *  - SimHash: per-token bit votes summed per document, signature
  *    assembled from power-of-two literals (DuckDB refuses `1 << 63`
  *    but a HUGEINT literal sum is exact), pairs brute-forced — valid
  *    as an oracle because the combined-block candidate join is
  *    pigeonhole-COMPLETE, so production output == all pairs with
  *    hamming <= maxHamming (QualitySpec pins the same equality).
  *
  * These are oracle-side replays of the operator CONTRACT, not of the
  * Spark plan: the SQL brute-forces where the engine uses an index
  * (d3/d10) and re-derives persisted postings from source text
  * (d9/e5), so a hash-match here checks the distributed program
  * against an independent sequential evaluation.
  */
object PortableHashOracle {

  private val P = graft.functions.SimHashUtil.P61 // 2^61 - 1

  /** The k=32 affine constants, drawn from the ONE shared generator. */
  private def consts32: (Array[Long], Array[Long]) =
    graft.functions.SimHashUtil.perms(32)

  // ---- shared CTE fragments ---------------------------------------

  /** Tokenize + 3-gram shingle CTEs for `src`, suffixed `_$sfx`:
    * w_$sfx (doc_id, wd) and s_$sfx (doc_id, sh). Same fragments as
    * the long-green d4/cc1 oracles. */
  private def shingleCtes(sfx: String, src: String): String =
    s"""w_$sfx AS (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), t -> t != '') AS wd
       |  FROM $src),
       |s_$sfx AS (SELECT doc_id, wd,
       |    list_distinct([wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2]
       |                   for i in range(1, len(wd) - 1)]) AS sh
       |  FROM w_$sfx WHERE len(wd) >= 3)""".stripMargin

  /** MinHash signature + band-bucket CTEs on top of s_$sfx:
    * g_$sfx (doc_id, sh, sg) and b_$sfx (doc_id, bd, bk).
    * k = 32 hashes, 8 bands x 4 rows — the battery parameters. */
  private def minhashCtes(sfx: String): String = {
    val (as, bs) = consts32
    val sigs = (0 until 32).map { i =>
      s"list_min(list_transform(hh, h -> ((${as(i)}::HUGEINT * h + ${bs(i)}) % $P)::BIGINT))"
    }.mkString(",\n|      ").stripMargin
    s"""h_$sfx AS (SELECT doc_id, sh,
       |    list_transform(sh, g -> ('0x' || substr(md5(g), 1, 16))::UBIGINT % $P) AS hh
       |  FROM s_$sfx),
       |g_$sfx AS (SELECT doc_id, sh,
       |    [$sigs] AS sg
       |  FROM h_$sfx),
       |b_$sfx AS (SELECT doc_id, bd,
       |    substr(md5(bd::VARCHAR || ',' ||
       |               array_to_string(list_slice(sg, 4*bd+1, 4*bd+4), ',')), 1, 16) AS bk
       |  FROM g_$sfx CROSS JOIN (SELECT unnest(range(8)) AS bd) bands)""".stripMargin
  }

  /** SimHash signature CTEs on top of w_$sfx (tokens WITH duplicates,
    * docs with >= 3 words — the same population that survives the
    * shingle filter): sim_$sfx (doc_id, sg UBIGINT). */
  private def simhashCtes(sfx: String): String = {
    val sums = (0 until 64).map { b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS c$b"
    }.mkString(",\n|      ").stripMargin
    val assemble = (0 until 64).map { b =>
      val pow = java.math.BigInteger.ONE.shiftLeft(b).toString
      s"CASE WHEN c$b >= 0 THEN $pow ELSE 0 END"
    }.mkString(" +\n|      ").stripMargin
    s"""t_$sfx AS (SELECT doc_id, unnest(wd) AS tk
       |  FROM w_$sfx WHERE len(wd) >= 3),
       |hb_$sfx AS (SELECT doc_id,
       |    ('0x' || substr(md5(tk), 1, 16))::UBIGINT AS h FROM t_$sfx),
       |cs_$sfx AS (SELECT doc_id,
       |      $sums
       |  FROM hb_$sfx GROUP BY doc_id),
       |sim_$sfx AS (SELECT doc_id,
       |    ($assemble)::UBIGINT AS sg
       |  FROM cs_$sfx)""".stripMargin
  }

  private val jac =
    "CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(list_distinct(list_concat(x.sh, y.sh)))"

  /** The d9/d10 probe batch: near-copies of every 6th doc, ids offset
    * into a disjoint space. */
  private val batch6 =
    "(SELECT doc_id + 1000000 AS doc_id, text || ' appended' AS text FROM documents WHERE doc_id % 6 = 0)"

  /** The e5 eval set: every 25th doc verbatim, ids offset. */
  private val eval25 =
    "(SELECT doc_id + 5000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0)"

  // ---- d2: MinHash + LSH near-dup pairs ---------------------------

  val d2Sql: String =
    s"""WITH ${shingleCtes("c", "documents")},
       |${minhashCtes("c")},
       |cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b
       |  FROM b_c p JOIN b_c q ON p.bd = q.bd AND p.bk = q.bk AND p.doc_id < q.doc_id),
       |j AS (SELECT c.id_a, c.id_b, $jac AS jac
       |  FROM cand c JOIN s_c x ON x.doc_id = c.id_a
       |              JOIN s_c y ON y.doc_id = c.id_b)
       |SELECT id_a, id_b, ROUND(jac, 6) AS jaccard
       |FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin

  // ---- cc3: MinHash pairs -> connected-component clusters ---------

  val cc3Sql: String =
    s"""WITH RECURSIVE ${shingleCtes("c", "documents")},
       |${minhashCtes("c")},
       |cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b
       |  FROM b_c p JOIN b_c q ON p.bd = q.bd AND p.bk = q.bk AND p.doc_id < q.doc_id),
       |pairs AS (SELECT c.id_a, c.id_b
       |  FROM cand c JOIN s_c x ON x.doc_id = c.id_a
       |              JOIN s_c y ON y.doc_id = c.id_b
       |  WHERE $jac >= 0.5),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION SELECT id_b AS a, id_a AS b FROM pairs),
       |reach(a, b) AS (SELECT a, b FROM edges
       |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lbl AS (SELECT d.doc_id,
       |    LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster
       |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id)
       |SELECT doc_id, cluster, cluster = doc_id AS is_rep
       |FROM lbl ORDER BY doc_id""".stripMargin

  // ---- d9: incremental MinHash probe vs corpus postings -----------

  val d9Sql: String =
    s"""WITH ${shingleCtes("c", "documents")},
       |${minhashCtes("c")},
       |${shingleCtes("n", batch6)},
       |${minhashCtes("n")},
       |cand AS (
       |  SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b, 'corpus' AS origin
       |  FROM b_c p JOIN b_n q ON p.bd = q.bd AND p.bk = q.bk AND p.doc_id != q.doc_id
       |  UNION
       |  SELECT DISTINCT p.doc_id, q.doc_id, 'batch'
       |  FROM b_n p JOIN b_n q ON p.bd = q.bd AND p.bk = q.bk AND p.doc_id < q.doc_id),
       |sh_all AS (SELECT doc_id, sh FROM s_c UNION ALL SELECT doc_id, sh FROM s_n),
       |j AS (SELECT c.id_a, c.id_b, c.origin, $jac AS jac
       |  FROM cand c JOIN sh_all x ON x.doc_id = c.id_a
       |              JOIN s_n y ON y.doc_id = c.id_b)
       |SELECT id_a, id_b, ROUND(jac, 4) AS jacc, origin
       |FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b, origin""".stripMargin

  // ---- st3: streamed near-dup ingestion (4-batch replay) ----------

  /** Replays [[graft.streaming.NearDupStream.processBatch]] over the
    * deterministic 4-way batch split (batch k = doc_id % 4): the pair
    * graph is d2's exact LSH-candidate + Jaccard-verify set, and the
    * kept set EVOLVES — a doc is `dup_corpus` if it matches a doc KEPT
    * in an earlier batch (novel docs are the only ones indexed),
    * `dup_batch` if it matches a smaller-id doc of its own batch
    * (regardless of that doc's own fate), else `kept` and indexed.
    * The batch recursion unrolls into one chained CTE per batch —
    * an independent sequential evaluation of the streaming state
    * machine. */
  /** The shared CTE text for the streamed-ingestion replays: d2's pair
    * graph (pr / sym) plus the per-batch label + kept chain. */
  private def streamChainCtes(nBatches: Int): String = {
    val base =
      s"""${shingleCtes("c", "documents")},
         |${minhashCtes("c")},
         |cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b
         |  FROM b_c p JOIN b_c q ON p.bd = q.bd AND p.bk = q.bk AND p.doc_id < q.doc_id),
         |pr AS (SELECT c.id_a, c.id_b
         |  FROM cand c JOIN s_c x ON x.doc_id = c.id_a
         |              JOIN s_c y ON y.doc_id = c.id_b
         |  WHERE $jac >= 0.5),
         |sym AS (SELECT id_a AS a, id_b AS b FROM pr
         |        UNION ALL SELECT id_b AS a, id_a AS b FROM pr)""".stripMargin
    val chain = (0 until nBatches).map { k =>
      val keptPrev =
        if (k == 0) "SELECT CAST(NULL AS BIGINT) AS doc_id WHERE FALSE"
        else (0 until k).map(i => s"SELECT doc_id FROM kept$i")
          .mkString(" UNION ALL ")
      s"""lbl$k AS (SELECT d.doc_id,
         |  CASE WHEN EXISTS (SELECT 1 FROM sym s JOIN ($keptPrev) kp
         |                    ON s.a = kp.doc_id WHERE s.b = d.doc_id)
         |         THEN 'dup_corpus'
         |       WHEN EXISTS (SELECT 1 FROM pr p
         |                    WHERE p.id_b = d.doc_id AND p.id_a % $nBatches = $k)
         |         THEN 'dup_batch'
         |       ELSE 'kept' END AS decision
         |  FROM documents d WHERE d.doc_id % $nBatches = $k),
         |kept$k AS (SELECT doc_id FROM lbl$k WHERE decision = 'kept')""".stripMargin
    }.mkString(",\n")
    s"$base,\n$chain"
  }

  def st3Sql(nBatches: Int = 4): String = {
    val all = (0 until nBatches).map(k => s"SELECT * FROM lbl$k")
      .mkString(" UNION ALL ")
    s"WITH ${streamChainCtes(nBatches)}\n" +
      s"SELECT doc_id, decision FROM ($all) ORDER BY doc_id"
  }

  /** Replays the LIVE duplicate-cluster map after the st3 ingestion:
    * the emitted pair stream is (kept-earlier doc, batch doc) sym
    * edges plus within-batch pr edges; the incremental fold's final
    * map must equal the transitive closure over exactly that stream
    * (min-id labels; only pair endpoints appear). */
  def cc5Sql(nBatches: Int = 4): String = {
    val keptAll = (0 until nBatches).map(i => s"SELECT doc_id FROM kept$i")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${streamChainCtes(nBatches)},
       |keptall AS ($keptAll),
       |cp AS (SELECT s.a AS x, s.b AS y FROM sym s
       |       JOIN keptall ka ON ka.doc_id = s.a
       |       WHERE s.a % $nBatches < s.b % $nBatches),
       |bp AS (SELECT id_a AS x, id_b AS y FROM pr
       |       WHERE id_a % $nBatches = id_b % $nBatches),
       |ed AS (SELECT x AS a, y AS b FROM cp UNION SELECT y, x FROM cp
       |       UNION SELECT x, y FROM bp UNION SELECT y, x FROM bp),
       |reach(a, b) AS (SELECT a, b FROM ed
       |  UNION SELECT r.a, e.b FROM reach r JOIN ed e ON r.b = e.a),
       |nodes AS (SELECT DISTINCT a AS doc_id FROM ed)
       |SELECT n.doc_id, LEAST(n.doc_id, MIN(r.b)) AS cluster
       |FROM nodes n JOIN reach r ON r.a = n.doc_id
       |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin
  }

  // ---- e5: fuzzy decontamination (eval set probes the same index) --

  val e5Sql: String =
    s"""WITH ${shingleCtes("c", "documents")},
       |${minhashCtes("c")},
       |${shingleCtes("n", eval25)},
       |${minhashCtes("n")},
       |cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b
       |  FROM b_c p JOIN b_n q ON p.bd = q.bd AND p.bk = q.bk AND p.doc_id != q.doc_id),
       |j AS (SELECT c.id_a, c.id_b, $jac AS jac
       |  FROM cand c JOIN s_c x ON x.doc_id = c.id_a
       |              JOIN s_n y ON y.doc_id = c.id_b)
       |SELECT id_a AS doc_id, id_b AS eval_doc_id, ROUND(jac, 4) AS jacc
       |FROM j WHERE jac >= 0.5 ORDER BY doc_id, eval_doc_id""".stripMargin

  // ---- e9: contamination report (exact + fuzzy rollup) ------------

  /** Per-eval-doc contamination datasheet: distinct corpus docs
    * sharing any verbatim 8-gram (e2's definition) and distinct
    * corpus docs at MinHash-candidate Jaccard ≥ 0.5 (e5's), with
    * zero-hit eval docs kept via the base left joins. */
  val e9Sql: String =
    s"""WITH ${shingleCtes("c", "documents")},
       |${minhashCtes("c")},
       |${shingleCtes("n", eval25)},
       |${minhashCtes("n")},
       |cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b
       |  FROM b_c p JOIN b_n q ON p.bd = q.bd AND p.bk = q.bk AND p.doc_id != q.doc_id
       |  WHERE p.doc_id % 25 != 0),
       |fj AS (SELECT c.id_a, c.id_b, $jac AS jac
       |  FROM cand c JOIN s_c x ON x.doc_id = c.id_a
       |              JOIN s_n y ON y.doc_id = c.id_b),
       |fz AS (SELECT id_b - 5000000 AS eval_doc_id,
       |         CAST(COUNT(DISTINCT id_a) AS BIGINT) AS nf
       |       FROM fj WHERE jac >= 0.5 GROUP BY 1),
       |w8 AS (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), t -> t != '') AS wd
       |  FROM documents),
       |s8 AS (SELECT doc_id,
       |    [array_to_string(wd[i:i+7], ' ') for i in range(1, len(wd) - 6)] AS sh8
       |  FROM w8 WHERE len(wd) >= 8),
       |eg AS (SELECT DISTINCT doc_id AS eval_doc_id, unnest(sh8) AS gram
       |       FROM s8 WHERE doc_id % 25 = 0),
       |cg AS (SELECT doc_id, unnest(sh8) AS gram FROM s8 WHERE doc_id % 25 != 0),
       |vb AS (SELECT eg.eval_doc_id, CAST(COUNT(DISTINCT cg.doc_id) AS BIGINT) AS nv
       |       FROM cg JOIN eg USING (gram) GROUP BY 1),
       |base AS (SELECT doc_id AS eval_doc_id FROM documents WHERE doc_id % 25 = 0)
       |SELECT base.eval_doc_id,
       |  CAST(COALESCE(vb.nv, 0) AS BIGINT) AS n_verbatim_docs,
       |  CAST(COALESCE(fz.nf, 0) AS BIGINT) AS n_fuzzy_docs,
       |  CAST(CASE WHEN COALESCE(vb.nv, 0) > 0 OR COALESCE(fz.nf, 0) > 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM base LEFT JOIN vb USING (eval_doc_id) LEFT JOIN fz USING (eval_doc_id)
       |ORDER BY eval_doc_id""".stripMargin

  // ---- e10: per-suite contamination rollup over e9 ----------------

  /** e9's datasheet grouped by the eval doc's `source` (the suite
    * stand-in): exact integer rollup + one 4-dp rate. */
  val e10Sql: String =
    s"""SELECT ds.source,
       |  COUNT(*) AS n_eval_docs,
       |  CAST(SUM(per.flagged) AS BIGINT) AS n_flagged,
       |  CAST(SUM(CASE WHEN per.n_verbatim_docs > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_verbatim,
       |  CAST(SUM(CASE WHEN per.n_fuzzy_docs > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_fuzzy,
       |  ROUND(CAST(SUM(per.flagged) AS DOUBLE) / COUNT(*), 4)
       |    AS contamination_rate
       |FROM ($e9Sql) per
       |JOIN (SELECT doc_id AS eval_doc_id, source FROM documents) ds
       |  USING (eval_doc_id)
       |GROUP BY ds.source ORDER BY ds.source""".stripMargin

  // ---- d3: SimHash near-dup pairs (brute-force replay) ------------

  val d3Sql: String =
    s"""WITH ${shingleCtes("c", "documents")},
       |${simhashCtes("c")},
       |cand AS (SELECT p.doc_id AS id_a, q.doc_id AS id_b,
       |    CAST(bit_count(xor(p.sg, q.sg)) AS INTEGER) AS hamming
       |  FROM sim_c p JOIN sim_c q ON p.doc_id < q.doc_id
       |  WHERE bit_count(xor(p.sg, q.sg)) <= 4),
       |j AS (SELECT c.id_a, c.id_b, c.hamming, $jac AS jac
       |  FROM cand c JOIN s_c x ON x.doc_id = c.id_a
       |              JOIN s_c y ON y.doc_id = c.id_b)
       |SELECT id_a, id_b, hamming, ROUND(jac, 6) AS jaccard
       |FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin

  // ---- d10: incremental SimHash probe (brute-force replay) --------

  val d10Sql: String =
    s"""WITH ${shingleCtes("c", "documents")},
       |${simhashCtes("c")},
       |${shingleCtes("n", batch6)},
       |${simhashCtes("n")},
       |cand AS (
       |  SELECT p.doc_id AS id_a, q.doc_id AS id_b,
       |      CAST(bit_count(xor(p.sg, q.sg)) AS INTEGER) AS hamming, 'corpus' AS origin
       |  FROM sim_c p JOIN sim_n q ON p.doc_id != q.doc_id
       |  WHERE bit_count(xor(p.sg, q.sg)) <= 4
       |  UNION ALL
       |  SELECT p.doc_id, q.doc_id,
       |      CAST(bit_count(xor(p.sg, q.sg)) AS INTEGER), 'batch'
       |  FROM sim_n p JOIN sim_n q ON p.doc_id < q.doc_id
       |  WHERE bit_count(xor(p.sg, q.sg)) <= 4),
       |sh_all AS (SELECT doc_id, sh FROM s_c UNION ALL SELECT doc_id, sh FROM s_n),
       |j AS (SELECT c.id_a, c.id_b, c.hamming, c.origin, $jac AS jac
       |  FROM cand c JOIN sh_all x ON x.doc_id = c.id_a
       |              JOIN s_n y ON y.doc_id = c.id_b)
       |SELECT id_a, id_b, hamming, ROUND(jac, 4) AS jacc, origin
       |FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b, origin""".stripMargin
}
