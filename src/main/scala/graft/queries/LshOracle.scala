package graft.queries

/** Generated DuckDB replay SQL for the hyperplane-LSH battery entries
  * (d5 embedding near-dup, s2 multiprobe ANN).
  *
  * The hyperplanes are SEEDED-deterministic
  * ([[graft.pipeline.Similarity.hyperplanes]]), so the oracle doesn't
  * need to re-derive them — this generator asks the same function for
  * the same planes and embeds them as SQL literals (shortest
  * round-trip `Double.toString` rendering, which DuckDB parses back to
  * the identical IEEE double). Bucket signs and verification cosines
  * are then the SAME float operations in the SAME order on both
  * engines (the long-green s1 oracle already pins that
  * `list_sum(list_transform(...))` matches the codegen'd left-to-right
  * dot product bit-for-bit), so candidates and verified pairs replay
  * exactly.
  *
  * A sign flip would need a |dot| at the ~1e-16 scale — probability
  * ~1e-14 per (vector, plane) on these embeddings; the s1 4-dp
  * rounding idiom still guards every ORDERING comparison.
  */
object LshOracle {

  /** planes CTE: pl(tbl, pidx, pv LIST(DOUBLE)) — `numTables` tables
    * of `planesPerTable` planes, drawn from the battery seed. */
  private def planesCte(numTables: Int, planesPerTable: Int, dim: Int): String = {
    val planes = graft.pipeline.Similarity.hyperplanes(
      numTables * planesPerTable, dim)
    val rows = planes.zipWithIndex.map { case (p, g) =>
      val t = g / planesPerTable; val i = g % planesPerTable
      s"($t, $i, [${p.map(_.toString).mkString(", ")}])"
    }.mkString(",\n|  ").stripMargin
    s"""pl(tbl, pidx, pv) AS (VALUES
       |  $rows)""".stripMargin
  }

  /** Normalized-embedding CTE (the s1 fragment + the zero-norm guard
    * Similarity.normalized applies). */
  private val neCte: String =
    """e0 AS (SELECT vec_id,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
      |    embedding FROM embeddings),
      |e AS (SELECT vec_id, embedding,
      |    CASE WHEN nrm > 0
      |      THEN list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm)
      |      ELSE list_transform(embedding, x -> 0.0) END AS ne
      |  FROM e0)""".stripMargin

  /** Sign-bit buckets: bk(vec_id, tbl, bucket) — bit i of a table's
    * bucket set iff dot(vector, plane_i) >= 0, matching
    * Similarity.lshBucket's `>= 0` and power-of-two packing. The
    * vector expression is a parameter because d5 buckets the
    * NORMALIZED embedding while annTopK (s2) buckets the RAW one —
    * mathematically the same sign, float-wise a different value, and
    * the oracle replays the exact operations. */
  private def bucketCte(src: String, elem: String): String =
    s"""sg AS (SELECT $src.vec_id, pl.tbl, pl.pidx,
       |    list_sum(list_transform(range(1, len($src.embedding) + 1),
       |      k -> $elem * pl.pv[k])) AS d FROM $src CROSS JOIN pl),
       |bk AS (SELECT vec_id, tbl,
       |    CAST(SUM(CASE WHEN d >= 0 THEN (1 << pidx) ELSE 0 END) AS INTEGER) AS bucket
       |  FROM sg GROUP BY vec_id, tbl)""".stripMargin

  /** d5: all pairs sharing any (table, bucket), verified by exact
    * cosine >= 0.4 — 24 tables x 4 planes, the battery parameters. */
  val d5Sql: String =
    s"""WITH ${planesCte(numTables = 24, planesPerTable = 4, dim = 64)},
       |$neCte,
       |${bucketCte("e", "e.ne[k]")},
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id),
       |v AS (SELECT c.id_a, c.id_b,
       |    list_sum(list_transform(range(1, len(x.ne) + 1),
       |      k -> x.ne[k] * y.ne[k])) AS sim
       |  FROM cand c JOIN e x ON x.vec_id = c.id_a
       |              JOIN e y ON y.vec_id = c.id_b)
       |SELECT id_a, id_b, ROUND(sim, 6) AS sim
       |FROM v WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin

  /** s2: multiprobe ANN top-5 — 8 tables x 4 planes, queries
    * (vec_id < 10) probe their bucket plus every 1-bit flip, the
    * candidate union is ranked by exact cosine (computed on the RAW
    * vectors exactly as Similarity.cosine does: dot / (nrm_q * nrm_c),
    * which equals the normalized dot only up to last-ulp — so the
    * oracle replays the same formula, not the equivalent one). */
  val s2Sql: String =
    s"""WITH ${planesCte(numTables = 8, planesPerTable = 4, dim = 64)},
       |$neCte,
       |${bucketCte("e0", "CAST(e0.embedding[k] AS DOUBLE)")},
       |fl(flip) AS (VALUES (0), (1), (2), (4), (8)),
       |qb AS (SELECT bk.vec_id AS q_vec_id, bk.tbl,
       |    CAST(xor(bk.bucket::BIGINT, fl.flip::BIGINT) AS INTEGER) AS bucket
       |  FROM bk CROSS JOIN fl WHERE bk.vec_id < 10),
       |cand AS (SELECT DISTINCT qb.q_vec_id, c.vec_id
       |  FROM qb JOIN bk c ON c.tbl = qb.tbl AND c.bucket = qb.bucket
       |  WHERE c.vec_id != qb.q_vec_id),
       |sims AS (SELECT cd.q_vec_id, cd.vec_id,
       |    CASE WHEN q.nrm * c.nrm > 0 THEN
       |      list_sum(list_transform(range(1, len(q.embedding) + 1),
       |        k -> CAST(q.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE)))
       |        / (q.nrm * c.nrm)
       |    ELSE 0.0 END AS sim
       |  FROM cand cd JOIN e0 q ON q.vec_id = cd.q_vec_id
       |               JOIN e0 c ON c.vec_id = cd.vec_id),
       |r AS (SELECT q_vec_id, vec_id, ROUND(sim, 4) + 0.0 AS sim_r,
       |    ROW_NUMBER() OVER (PARTITION BY q_vec_id
       |      ORDER BY sim DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT q_vec_id, vec_id, sim_r, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= 5 ORDER BY q_vec_id, rank""".stripMargin
}
