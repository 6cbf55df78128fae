package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, and brute-force
  * n-gram Jaccard (the small-scale ground truth the probabilistic
  * methods are tested against).
  *
  * All signature computation is pure codegen'd column expressions —
  * no UDFs, no driver loops. The MinHash/SimHash family hashes with
  * the ENGINE-PORTABLE md5-64 base + Mersenne-61 affine mixes
  * ([[graft.functions.SimHashUtil.md5h64]]), so every signature,
  * bucket, and verified pair replays bit-for-bit in the DuckDB
  * oracles ([[graft.queries.PortableHashOracle]]); exact dedup keys
  * on a 192-bit xxhash64+md5 digest (its OUTPUT is hash-value-
  * independent, so portability doesn't constrain it). The only shuffles are the band-bucket equi-join (MinHash) and
  * the final pair joins, both on dense integer/hash keys that AQE can
  * re-split on skew — the properties that matter at 100 TB, where
  * candidate generation must stay near-linear and only verified
  * candidates pay the quadratic cost.
  *
  * CACHE LIFETIME: the LSH operators persist() shared intermediates
  * (signature/shingle frames read by both sides of their candidate
  * joins). Those caches live until the session's next
  * `spark.catalog.clearCache()` — Verify/Bench sweep between queries;
  * a long-lived session embedding these operators should do the same
  * between pipeline runs (same note applies to [[Similarity]]).
  */
object Dedup {

  // ---- shingling ---------------------------------------------------

  /** Distinct word n-gram shingles of a *words array* column. The
    * argument must be a materialized column attribute, not an
    * expression: interpreted higher-order lambdas re-evaluate every
    * non-lambda subtree per element, so passing `split(...)` directly
    * re-runs the regex split once per shingle — O(|words|²) per
    * document (measured 6-7 s just to shingle 5000 docs at sf0.1;
    * ~0.5 s via [[withShingles]]). */
  def shinglesFromWords(words: Column, n: Int): Column = {
    val m = size(words) - (n - 1)
    when(m > 0,
      array_distinct(transform(sequence(lit(0), m - 1),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Add a distinct word-n-gram shingle column — a pure scan-stage
    * projection via the codegen'd [[graft.functions.WordShingles]]
    * expression (per-document work computes where the document already
    * is; no explode, no shuffle, no join back). NOT
    * [[shinglesFromWords]]: higher-order array lambdas run interpreted
    * in Spark (~30 µs of interpreter overhead per shingle dominated
    * the dedup battery at sf0.1); the custom expression is the same
    * loop as compiled bytecode inside whole-stage codegen. Earlier
    * formulations (posexplode + window `lead` + collect_set, then
    * gramRows + groupBy + join-back) paid a full gram-stream shuffle
    * and an id join for what is a per-row function.
    *
    * Set semantics match `array_distinct` modulo element order
    * (first-occurrence here); all consumers (size/intersect/explode)
    * are order-insensitive. Rows pass through 1:1 — a null/short
    * document yields an empty array exactly as the legacy left-join +
    * coalesce shape did, and `idCol` no longer carries a uniqueness
    * contract for THIS function (downstream pair joins still key on
    * it). */
  def withShingles(df: DataFrame, idCol: String, textCol: String, n: Int,
      out: String): DataFrame =
    df.withColumn("_sh_wd0", split(trim(col(textCol)), "\\s+"))
      .withColumn(out, coalesce(
        graft.functions.VectorExprs.wordShingles(col("_sh_wd0"), n),
        array().cast("array<string>")))
      .drop("_sh_wd0")

  /** One (`_sh_id`, `_sh_g`) row per word-n-gram OCCURRENCE (duplicates
    * included — group or distinct downstream as needed). Grams come
    * from an array transform INSIDE the scan stage (the
    * SpanDedup.windowRows shape) — the earlier posexplode + window
    * `lead` formulation shuffled every corpus token row before any
    * aggregation; this emits gram rows with no shuffle at all.
    * Exposed for consumers like decontamination that want the gram
    * stream without materializing per-doc arrays. Same `idCol`
    * contract as [[withShingles]]. */
  def gramRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val wd = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol).as("_sh_id"), wd.as("_sh_wd"))
      .filter(size(col("_sh_wd")) >= n)
      .select(col("_sh_id"), explode(transform(
        sequence(lit(0), size(col("_sh_wd")) - n),
        i => array_join(slice(col("_sh_wd"), i + 1, lit(n)), " "))).as("_sh_g"))
  }

  /** Distinct word n-gram shingles of a text column (convenience
    * closed form; prefer [[withShingles]] on hot paths). */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromWords(split(trim(text), "\\s+"), n)

  /** Distinct character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column = {
    val m = length(text) - (n - 1)
    when(m > 0,
      array_distinct(transform(sequence(lit(1), m), i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact set Jaccard of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))
      .otherwise(lit(0.0))

  // ---- exact dedup -------------------------------------------------

  /** Exact dedup: keep the minimum-id row per distinct value of
    * `textCol`; adds `n_copies`. Hash-groupBy — one shuffle keyed by a
    * 192-bit (xxhash64 + md5) digest rather than the text itself: a
    * lone 64-bit key would suffer birthday collisions at
    * training-corpus scale (~50% at ~5 G docs), silently merging
    * distinct documents. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("_th", xxhash64(col(textCol)))
      .withColumn("_tm", md5(col(textCol)))
      .groupBy("_th", "_tm")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("_th", "_tm")
      .join(df, Seq(idCol))

  /** The 192-bit digest [[exactDedup]] keys on, as a standalone frame —
    * this is the "index" an incremental pipeline persists (bucketed by
    * `_th` at scale) so each new batch dedups against the corpus
    * without rescanning it. */
  def digestIndex(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(
        coalesce(xxhash64(col(textCol)), lit(Long.MinValue)).as("_th"),
        coalesce(md5(col(textCol)), lit("null-text")).as("_tm"))
      .distinct()

  /** Incremental exact dedup — the operational mode at 100 TB: the
    * corpus is already deduped and indexed; only the NEW batch is
    * scored. Each new row gets a `decision`:
    * 'dup_corpus' (digest already in the index), 'dup_batch' (a
    * smaller-id row in the same batch has the same text), or 'kept'.
    *
    * Cost is O(batch) + one join against the digest index: the index
    * side is pre-distinct and fixed-width (192 bits/doc), so the join
    * shuffles (or broadcasts) digests, never corpus text. The
    * batch-internal tiebreak is a partial-aggregating min per digest,
    * not a window sort. */
  def incrementalExact(newBatch: DataFrame, idCol: String, textCol: String,
      index: DataFrame): DataFrame = {
    // null-safe digests: md5(null)/xxhash64(null) are null, and null
    // keys never match an equi-join — a failed-fetch row would silently
    // fall out of the result. Sentinels keep the contract "every batch
    // row gets a decision": null texts are mutual duplicates of each
    // other (and of null texts in the corpus), never of any real text
    // (md5 output is hex, so the sentinel cannot collide).
    val nb = newBatch
      .withColumn("_th", coalesce(xxhash64(col(textCol)), lit(Long.MinValue)))
      .withColumn("_tm", coalesce(md5(col(textCol)), lit("null-text")))
    val batchMin = nb.groupBy("_th", "_tm").agg(min(col(idCol)).as("_minid"))
    nb.join(index.withColumn("_inc", lit(true)), Seq("_th", "_tm"), "left")
      .join(batchMin, Seq("_th", "_tm"))
      .withColumn("decision",
        when(col("_inc"), lit("dup_corpus"))
          .when(col(idCol) > col("_minid"), lit("dup_batch"))
          .otherwise(lit("kept")))
      .drop("_th", "_tm", "_inc", "_minid")
  }

  // ---- MinHash + LSH ----------------------------------------------

  /** Seeded Carter-Wegman permutation family over the Mersenne field
    * GF(2^61-1): perm_i(h) = (a_i · h61 + b_i) mod p on the md5-based
    * base hash (one string hash per shingle + k cheap modular mixes).
    * ENGINE-PORTABLE by construction: the md5 base and the 128-bit-
    * staged affine mix replay exactly in DuckDB HUGEINT arithmetic,
    * which is what lets the whole MinHash battery family (d2, d9, cc3,
    * e5) carry hash-match oracles — see
    * [[graft.functions.SimHashUtil.md5h64]] for the hash-choice
    * rationale and [[graft.queries.PortableHashOracle]] for the
    * generated replay SQL. Constants come from
    * [[graft.functions.SimHashUtil.perms]] (one seed, one draw
    * order), shared by every formulation. */
  private def p61Consts(k: Int): (Array[Long], Array[Long]) =
    graft.functions.SimHashUtil.perms(k)

  private val P61big = BigDecimal(graft.functions.SimHashUtil.P61)

  /** Unsigned md5-64 of a string column, mod 2^61-1, as Decimal(38,0)
    * — the closed-form (built-ins only) counterpart of the codegen'd
    * per-row hash; spec-path only. */
  private def h61Col(s: Column): Column =
    conv(substring(md5(s), 1, 16), 16, 10)
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)) % lit(P61big)

  /** k-permutation MinHash signature of a shingle-array column:
    * sig[i] = min over shingles of (a_i · h61(shingle) + b_i) mod
    * 2^61-1. Closed-form Column version staged in Decimal(38,0) (the
    * 122-bit product fits losslessly; Spark 4's ANSI mode would refuse
    * the long overflow); [[withMinhash]] computes the identical
    * signature via the codegen'd 128-bit integer path, which is what
    * scales. */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val (as, bs) = p61Consts(k)
    val hashes = transform(shingles, s => h61Col(s))
    array((0 until k).map { i =>
      array_min(transform(hashes, h =>
        ((lit(BigDecimal(as(i))) * h + lit(BigDecimal(bs(i)))) % lit(P61big))
          .cast("long")))
    }: _*)
  }

  /** Add `_shingles` and `_sig` columns — both pure scan-stage
    * projections ([[withShingles]] + the codegen'd
    * [[graft.functions.MinHashSig]] expression, whose affine
    * constants replicate [[minhashSignature]]'s draw-for-draw, so the
    * signature is bit-identical to [[minhashSignature]] and to the
    * earlier explode + k-min-aggregate formulation). The signature is
    * a per-document function, so nothing shuffles here: the only
    * exchange in a MinHash dedup is the downstream band-bucket join,
    * which carries ids only. Docs too short to shingle are filtered
    * (they have no signature), exactly as the aggregate formulation's
    * explode-then-inner-join did. */
  def withMinhash(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int, k: Int): DataFrame =
    withShingles(df, idCol, textCol, shingleWords, "_shingles")
      .filter(size(col("_shingles")) > 0)
      .withColumn("_sig",
        graft.functions.VectorExprs.minhashSig(col("_shingles"), k))

  /** LSH banding: explode the signature into `bands` buckets of `rows`
    * values each; two docs sharing any (band, hash) bucket become a
    * candidate pair. Returns (band, bucket, <df columns>). The bucket
    * key is the portable md5-64 of "band,v1,..,vrows" (decimal
    * rendering) — an 8-byte shuffle key whose collisions replay
    * exactly in the DuckDB oracle, which hashes the identical
    * string. */
  def lshBuckets(df: DataFrame, bands: Int, rows: Int): DataFrame =
    df.withColumn("_band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("_bucket", graft.functions.VectorExprs.md5Long(
        concat_ws(",", col("_band").cast("string"),
          slice(col("_sig"), col("_band") * rows + 1, lit(rows))
            .cast("array<string>"))))

  /** Candidate pairs from shared LSH buckets, verified by exact shingle
    * Jaccard >= `threshold`. Output: (id_a, id_b, jaccard) with
    * id_a < id_b, distinct. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // persist: the signature/shingle frame feeds three plan branches
    // (bucketing, and both sides of the verification join) — without it
    // the shingling + 32 hash aggregates run once per branch
    val sigs = withMinhash(df.select(col(idCol), col(textCol)), idCol, textCol,
      shingleWords, numHashes).persist()
    // candidate id pairs first (ids only through the band shuffle);
    // shingle arrays join back just for the verification step
    val buckets = lshBuckets(sigs, bands, rows)
      .select(col("_band"), col("_bucket"), col(idCol))
    val cands = buckets.select(col("_band"), col("_bucket"), col(idCol).as("id_a"))
      .join(buckets.select(col("_band"), col("_bucket"), col(idCol).as("id_b")),
        Seq("_band", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val sh = sigs.select(col(idCol), col("_shingles"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("_shingles").as("_sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("_shingles").as("_sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** The two persisted halves of an incremental near-dup pipeline:
    * `buckets` = (_band, _bucket, id) — the LSH postings a new batch
    * probes — and `shingles` = (id, _shingles) — fetched per candidate
    * for exact-Jaccard verification. Persist `buckets` partitioned (or
    * bucketed) by (_band, _bucket) and `shingles` bucketed by id at
    * scale, so a batch's probes and verifications are point lookups,
    * never corpus scans. */
  final case class NearDupIndex(buckets: DataFrame, shingles: DataFrame)

  /** Build the near-dup index for a (deduped) corpus. Same
    * shingle/signature parameters must be used for every later batch —
    * the index stores no text, only shingle sets and band postings. */
  def minhashIndex(corpus: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, numHashes: Int = 32,
      bands: Int = 8): NearDupIndex =
    minhashIndexWithSigs(corpus, idCol, textCol, shingleWords, numHashes, bands)._1

  /** [[minhashIndex]] plus the persisted signature frame both index
    * halves derive from — callers that materialize the index elsewhere
    * (e.g. [[saveIndex]]) use the handle to release the cache. */
  def minhashIndexWithSigs(corpus: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, numHashes: Int = 32,
      bands: Int = 8): (NearDupIndex, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = withMinhash(corpus.select(col(idCol), col(textCol)), idCol,
      textCol, shingleWords, numHashes).persist()
    val buckets = lshBuckets(sigs, bands, numHashes / bands)
      .select(col("_band"), col("_bucket"), col(idCol))
    (NearDupIndex(buckets, sigs.select(col(idCol), col("_shingles"))), sigs)
  }

  /** The two frame schemas a persisted [[NearDupIndex]] reads back
    * with — plan-only (no persist, no job). Readers of on-disk index
    * segments pass these to `spark.read.schema(...)` so the parquet
    * load skips its footer-inference job: a streamed fold otherwise
    * pays one scheduler job per segment read per micro-batch just to
    * rediscover a schema that is fixed by construction. */
  def indexSchemas(like: DataFrame, idCol: String, textCol: String,
      shingleWords: Int, numHashes: Int, bands: Int):
      (org.apache.spark.sql.types.StructType, org.apache.spark.sql.types.StructType) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = withMinhash(like.limit(0).select(col(idCol), col(textCol)),
      idCol, textCol, shingleWords, numHashes)
    (lshBuckets(sigs, bands, numHashes / bands)
       .select(col("_band"), col("_bucket"), col(idCol)).schema,
     sigs.select(col(idCol), col("_shingles")).schema)
  }

  /** Persist a [[NearDupIndex]]: band postings laid out PARTITIONED BY
    * `_band` — a batch's probe join prunes to matching band files —
    * plus the shingle frame for candidate verification. The shingle
    * write lands last, so `shingles/_SUCCESS` is the commit marker for
    * the whole index. At 100 TB the same layout holds; you'd
    * additionally bucket postings by `_bucket` and shingles by id so
    * probes and verifications become co-located point lookups. */
  def saveIndex(index: NearDupIndex, dir: String): Unit = {
    graft.util.Stage.publish(index.buckets.sparkSession, dir,
        "shingles/_SUCCESS") { staging =>
      index.buckets.write.mode("overwrite").partitionBy("_band")
        .parquet(s"$staging/buckets")
      index.shingles.write.mode("overwrite").parquet(s"$staging/shingles")
    }
  }

  def isIndexSaved(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean =
    graft.util.Stage.isCommitted(spark, dir, "shingles/_SUCCESS")

  /** Reload a saved index. Probing a loaded index pays only the probe
    * cost — shingling and banding the corpus happened at [[saveIndex]]
    * time, which is the operational mode incrementalMinhash exists
    * for: index once, probe every batch, never rescan the corpus.
    * `schemas` (buckets, shingles — [[indexSchemas]]' shape): the index
    * layout is fixed by construction, so callers that know it skip the
    * footer-inference scheduler job each schemaless read fires. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      schemas: Option[(org.apache.spark.sql.types.StructType,
        org.apache.spark.sql.types.StructType)] = None): NearDupIndex =
    NearDupIndex(
      schemas.fold(spark.read)(s => spark.read.schema(s._1))
        .parquet(s"$dir/buckets"),
      schemas.fold(spark.read)(s => spark.read.schema(s._2))
        .parquet(s"$dir/shingles"))

  /** Load the index at `dir` if present, else build it from `corpus`
    * and persist it there (freeing the build's signature cache once
    * written). Either way the returned index reads from the persisted
    * band-partitioned layout — with explicit schemas (plan-only, from
    * the corpus frame), so the two reads plan jobless. */
  def loadOrBuildIndex(corpus: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8,
      dir: String): NearDupIndex = {
    if (!isIndexSaved(corpus.sparkSession, dir)) {
      val (built, sigs) = minhashIndexWithSigs(corpus, idCol, textCol,
        shingleWords, numHashes, bands)
      saveIndex(built, dir)
      sigs.unpersist()
    }
    loadIndex(corpus.sparkSession, dir, Some(indexSchemas(corpus, idCol,
      textCol, shingleWords, numHashes, bands)))
  }

  /** Canonical per-dataset scratch location for the demo corpus band
    * index (d9 + NearDupStream-style consumers). Keyed by the source
    * table's CONTENT signature, not just its path — a regenerated
    * dataset at the same path gets a fresh index instead of stale
    * postings (same contract as [[IvfAnn.scratchDir]]). */
  def indexScratchDir(dataset: String, table: String = "documents"): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_neardupp_${
      graft.Tables.tableSignature(dataset, table)}"

  /** Incremental NEAR-dup — [[incrementalExact]]'s counterpart for
    * paraphrase-level duplicates, the operational mode at 100 TB: the
    * corpus's LSH postings are already persisted; only the NEW batch is
    * shingled and hashed. Emits exact-Jaccard-verified pairs
    * (id_a, id_b, jaccard, origin) where id_b is always a batch doc and
    * origin marks whether id_a came from the corpus index or earlier in
    * the same batch (id_a < id_b for batch-internal pairs; corpus ids
    * win ties by convention since the corpus was there first).
    *
    * Cost shape: O(batch) shingling, band probes that shuffle ids only,
    * and a verification join that touches candidate ids alone — the
    * corpus is never rescanned. Identical parameters ⇒ identical
    * hashing, so the result equals the batch recomputation
    * [[minhashNearDups]] over corpus ∪ batch restricted to pairs
    * involving a batch doc (QualitySpec pins this). */
  def incrementalMinhash(newBatch: DataFrame, idCol: String, textCol: String,
      index: NearDupIndex, shingleWords: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5): DataFrame =
    incrementalMinhashWithSigs(newBatch, idCol, textCol, index,
      shingleWords, numHashes, bands, threshold)._1

  /** [[incrementalMinhash]] plus the batch's persisted signature frame
    * (id, _shingles, _sig) — for callers that go on to index the batch
    * (e.g. [[graft.streaming.NearDupStream]]) and should not shingle
    * it a second time. The caller owns the sigs frame's unpersist once
    * both it and the pair frame are consumed. */
  def incrementalMinhashWithSigs(newBatch: DataFrame, idCol: String,
      textCol: String, index: NearDupIndex, shingleWords: Int = 3,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = withMinhash(newBatch.select(col(idCol), col(textCol)), idCol,
      textCol, shingleWords, numHashes).persist()
    val nb = lshBuckets(sigs, bands, numHashes / bands)
      .select(col("_band"), col("_bucket"), col(idCol))
    // batch ⋈ corpus postings + batch-internal candidates, ids only —
    // ONE tagged join, not two: the corpus postings and the batch's
    // own postings union into a single probe side (union is free — no
    // shuffle), so the batch frame is joined (and broadcast) once per
    // fold instead of once per candidate source. The per-origin
    // predicates are unchanged: id_a =!= id_b on the corpus leg (ids
    // are contract-unique across corpus and batch, but a REPLAYED
    // batch whose postings already committed would otherwise
    // self-match every doc at jaccard 1.0), id_a < id_b on the
    // batch-internal leg (each unordered pair once).
    val postings = index.buckets
      .select(col("_band"), col("_bucket"), col(idCol).as("id_a"),
        lit("corpus").as("origin"))
      .union(nb.select(col("_band"), col("_bucket"), col(idCol).as("id_a"),
        lit("batch").as("origin")))
    val cands = postings
      .join(nb.select(col("_band"), col("_bucket"), col(idCol).as("id_b")),
        Seq("_band", "_bucket"))
      .filter((col("origin") === "corpus" && col("id_a") =!= col("id_b")) ||
        (col("origin") === "batch" && col("id_a") < col("id_b")))
      .select(col("id_a"), col("id_b"), col("origin"))
      .dropDuplicates("id_a", "id_b", "origin")
    val shA = index.shingles.select(col(idCol).as("id_a"), col("_shingles").as("_sh_a"))
      .union(sigs.select(col(idCol).as("id_a"), col("_shingles").as("_sh_a")))
    val pairs = cands
      .join(shA, Seq("id_a"))
      .join(sigs.select(col(idCol).as("id_b"), col("_shingles").as("_sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard", "origin")
    (pairs, sigs)
  }

  // ---- SimHash -----------------------------------------------------

  /** 64-bit SimHash over a token-array column: bit b is set iff the sum
    * over tokens of ±1 (sign of bit b of the portable md5-64 token
    * hash) is >= 0. Closed form (spec path); the scan-stage
    * [[withShinglesAndSimhash]] is what scales. */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => graft.functions.VectorExprs.md5Long(t))
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
      val bitSum = aggregate(hashes, lit(0L), (s, h) =>
        s + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      acc.bitwiseOR(when(bitSum >= 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L)))
    })
  }

  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Fused shingles + SimHash: a pure scan-stage PROJECTION — both the
    * n-gram set and the 64-bit signature are per-document functions of
    * the document alone, so they're computed per row by the codegen'd
    * [[graft.functions.WordShingles]] / [[graft.functions.SimHash64]]
    * expressions over one tokenization. No explode, no window or
    * groupBy shuffle, no join back, and the compiled plan is two
    * expression calls instead of 64 aggregate columns (whose codegen
    * compile alone dominated d3's cold time; the earlier posexplode +
    * window-`lead` + 64-conditional-sum formulation also shuffled
    * every corpus token row before aggregating).
    *
    * Values are identical to [[withShingles]] + [[withSimhash]] modulo
    * shingle element order (set semantics; every consumer is
    * order-insensitive): same tokenizer, same per-token portable
    * md5-64 hash and sign-sum convention (see [[graft.functions
    * .SimHashUtil]]), and a null/short document yields an empty
    * shingle set exactly as the legacy left-join + coalesce did. Rows
    * and ids pass through 1:1, so the [[withShingles]] id contract is
    * no longer load-bearing here. */
  def withShinglesAndSimhash(df: DataFrame, idCol: String, textCol: String,
      n: Int, shinglesOut: String, simOut: String): DataFrame = {
    import graft.functions.VectorExprs
    df.withColumn("_sh_wd", split(trim(col(textCol)), "\\s+"))
      .withColumn(shinglesOut,
        coalesce(VectorExprs.wordShingles(col("_sh_wd"), n),
          array().cast("array<string>")))
      .withColumn(simOut, VectorExprs.simhash64Words(col("_sh_wd")))
      .drop("_sh_wd")
  }

  /** Add a `_sim` SimHash column to `df`, computed by exploding tokens
    * and running 64 codegen'd conditional sums (map-side combined) —
    * same value as [[simhash64]], minus the interpreted per-row nested
    * lambdas that dominated the sf0.1 profile. */
  def withSimhash(df: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val ex = df.select(col(idCol), explode(col(tokensCol)).as("_t"))
      .withColumn("_h", graft.functions.VectorExprs.md5Long(col("_t")))
    val aggs = (0 until 64).map { b =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"_b$b")
    }
    val sums = ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"_b$b") >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    df.join(sums.select(col(idCol), sim.as("_sim")), Seq(idCol))
  }

  /** SimHash near-dup pairs: candidates with hamming distance <=
    * `maxHamming`, verified by exact shingle Jaccard >= `threshold`.
    *
    * Candidate generation is an equi-join on combined two-block keys
    * of the signature (complete by pigeonhole — see inline proof), not
    * an n² cross and not the collision-heavy single-block index. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, shingleWords: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    // persist: consumed by the block join (twice) and the verification
    // joins (twice) — see minhashNearDups. Shingles and signature come
    // from the single fused pass (withShinglesAndSimhash); docs too
    // short to shingle drop out after it, exactly as the two-pass
    // version's pre-filter did (their signatures are never joined).
    val base = withShinglesAndSimhash(df.select(col(idCol), col(textCol)),
        idCol, textCol, shingleWords, "_shingles", "_sim")
      .filter(size(col("_shingles")) > 0)
      .persist()
    // Multi-index on PAIRS of blocks (Manku-style combined keys): split
    // the 64 bits into nBlocks = maxHamming + 2 blocks; <= maxHamming
    // differing bits dirty at most maxHamming blocks, leaving >= 2
    // clean, so some pair (i, j) of blocks is identical in any true
    // near-dup — candidate generation over all C(nBlocks, 2) pairs is
    // complete. The win over single-block keys (nBlocks = h + 1): the
    // join key carries TWO blocks' bits, e.g. h = 8 → 10 blocks of
    // ~6.4 bits → ~12.8-bit keys (~7k buckets) instead of 9 blocks of
    // ~7.1 bits (~128 buckets). Random 64-bit signatures collide per
    // combo at ~n²/2^keybits, so candidate volume drops ~55× for h = 8
    // (45·n²/7k vs 9·n²/128) at the price of a 5× wider explode of
    // (comb, v1, v2, id) rows — candidates dominate at scale, the
    // explode is linear. Ids+signatures only through the shuffle;
    // shingles join back for verification.
    val keyed = simhashBlockKeys(base.select(col(idCol), col("_sim")),
      idCol, "_sim", maxHamming)
    val cands = keyed.select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_a"), col("_sim").as("_sim_a"))
      .join(keyed.select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_b"), col("_sim").as("_sim_b")), Seq("_comb", "_v1", "_v2"))
      .filter(col("id_a") < col("id_b"))
      .filter(hammingDist(col("_sim_a"), col("_sim_b")) <= maxHamming)
      .select(col("id_a"), col("id_b"),
        hammingDist(col("_sim_a"), col("_sim_b")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
    val sh = base.select(col(idCol), col("_shingles"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("_shingles").as("_sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("_shingles").as("_sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "hamming", "jaccard")
  }

  /** All pairs at Hamming distance ≤ `maxHamming` between 64-bit
    * signatures — [[simhashNearDups]]'s candidate machinery without
    * the text-specific shingle verification, for signature columns
    * that are NOT text SimHashes (e.g. perceptual image hashes, any
    * 64-bit sketch). The combined-block index is pigeonhole-COMPLETE,
    * so the output EQUALS the all-pairs brute force while the plan
    * stays banding-bounded. Returns (id_a, id_b, hamming),
    * id_a < id_b. */
  def signaturePairs(df: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int): DataFrame = {
    val keyed = simhashBlockKeys(df.select(col(idCol), col(sigCol)),
      idCol, sigCol, maxHamming)
    keyed.select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_a"), col(sigCol).as("_sig_a"))
      .join(keyed.select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_b"), col(sigCol).as("_sig_b")),
        Seq("_comb", "_v1", "_v2"))
      .filter(col("id_a") < col("id_b"))
      .filter(hammingDist(col("_sig_a"), col("_sig_b")) <= maxHamming)
      .select(col("id_a"), col("id_b"),
        hammingDist(col("_sig_a"), col("_sig_b")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Combined two-block candidate keys (_comb, _v1, _v2) for a 64-bit
    * SimHash column — the candidate-generation keys of
    * [[simhashNearDups]], factored out so an index BUILD and a later
    * batch PROBE key identically. One output row per input row per
    * C(maxHamming + 2, 2) block pair; static bit bounds, so each key
    * is a codegen'd shift+mask. See [[simhashNearDups]] for the
    * pigeonhole completeness argument. */
  def simhashBlockKeys(df: DataFrame, idCol: String, simCol: String,
      maxHamming: Int): DataFrame = {
    val nBlocks = maxHamming + 2
    require(nBlocks <= 16, s"maxHamming=$maxHamming leaves pair keys under 8 bits")
    val bounds = (0 to nBlocks).map(i => i * 64 / nBlocks)
    def blockVal(sim: Column, b: Int): Column = {
      // value of block b: bits [bounds(b), bounds(b+1))
      val width = bounds(b + 1) - bounds(b)
      shiftrightunsigned(sim, bounds(b)).bitwiseAND(lit((1L << width) - 1L))
    }
    val combos = for { i <- 0 until nBlocks; j <- i + 1 until nBlocks } yield (i, j)
    df.select(col(idCol), col(simCol),
        explode(array(combos.zipWithIndex.map { case ((i, j), c) =>
          struct(lit(c).as("_comb"),
            blockVal(col(simCol), i).as("_v1"),
            blockVal(col(simCol), j).as("_v2"))
        }: _*)).as("_k"))
      .select(col(idCol), col(simCol),
        col("_k._comb").as("_comb"), col("_k._v1").as("_v1"), col("_k._v2").as("_v2"))
  }

  // ---- incremental SimHash near-dup --------------------------------

  /** The persisted halves of an incremental SIMHASH near-dup pipeline
    * — [[NearDupIndex]]'s counterpart for the hamming-distance family:
    * `keys` = (_comb, _v1, _v2, id, _sim) combined-block postings a
    * new batch probes with a plain equi-join (the _sim rides along for
    * the hamming filter), and `shingles` = (id, _shingles) for
    * exact-Jaccard verification. The same maxHamming must be used at
    * build and probe time — the block layout IS the key space — which
    * is why [[simhashScratchDir]] bakes it into the path. */
  final case class SimHashIndex(keys: DataFrame, shingles: DataFrame)

  def simhashIndex(corpus: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 4, shingleWords: Int = 3): SimHashIndex =
    simhashIndexWithSigs(corpus, idCol, textCol, maxHamming, shingleWords)._1

  /** [[simhashIndex]] plus the persisted fused signature frame both
    * halves derive from — callers that materialize the index elsewhere
    * use the handle to release the cache (as [[minhashIndexWithSigs]]). */
  def simhashIndexWithSigs(corpus: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 4, shingleWords: Int = 3): (SimHashIndex, DataFrame) = {
    val sigs = withShinglesAndSimhash(corpus.select(col(idCol), col(textCol)),
        idCol, textCol, shingleWords, "_shingles", "_sim")
      .filter(size(col("_shingles")) > 0)
      .persist()
    val keys = simhashBlockKeys(sigs.select(col(idCol), col("_sim")),
      idCol, "_sim", maxHamming)
    (SimHashIndex(keys, sigs.select(col(idCol), col("_shingles"))), sigs)
  }

  /** Persist a [[SimHashIndex]]: key postings PARTITIONED BY `_comb`
    * (a probe's equi-join prunes to matching combo files) plus the
    * shingle frame; `shingles/_SUCCESS` is the commit marker, as with
    * [[saveIndex]]. At 100 TB you'd additionally bucket keys by
    * (_v1, _v2) and shingles by id for co-located point lookups. */
  def saveSimhashIndex(index: SimHashIndex, dir: String): Unit = {
    graft.util.Stage.publish(index.keys.sparkSession, dir,
        "shingles/_SUCCESS") { staging =>
      index.keys.write.mode("overwrite").partitionBy("_comb")
        .parquet(s"$staging/keys")
      index.shingles.write.mode("overwrite").parquet(s"$staging/shingles")
    }
  }

  def isSimhashIndexSaved(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean =
    graft.util.Stage.isCommitted(spark, dir, "shingles/_SUCCESS")

  /** The two frame schemas a persisted [[SimHashIndex]] reads back
    * with — plan-only, no job ([[indexSchemas]]' counterpart for the
    * hamming family). */
  def simhashIndexSchemas(like: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, shingleWords: Int):
      (org.apache.spark.sql.types.StructType, org.apache.spark.sql.types.StructType) = {
    val sigs = withShinglesAndSimhash(
      like.limit(0).select(col(idCol), col(textCol)),
      idCol, textCol, shingleWords, "_shingles", "_sim")
    (simhashBlockKeys(sigs.select(col(idCol), col("_sim")), idCol, "_sim",
       maxHamming).schema,
     sigs.select(col(idCol), col("_shingles")).schema)
  }

  /** `schemas` (keys, shingles — [[simhashIndexSchemas]]' shape): the
    * layout is fixed by construction, so callers that know it skip the
    * footer-inference job each schemaless read fires. */
  def loadSimhashIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      schemas: Option[(org.apache.spark.sql.types.StructType,
        org.apache.spark.sql.types.StructType)] = None): SimHashIndex =
    SimHashIndex(
      schemas.fold(spark.read)(s => spark.read.schema(s._1))
        .parquet(s"$dir/keys"),
      schemas.fold(spark.read)(s => spark.read.schema(s._2))
        .parquet(s"$dir/shingles"))

  /** Load the simhash index at `dir` if present, else build from
    * `corpus` and persist it there — the probe-only operational mode,
    * mirroring [[loadOrBuildIndex]] (explicit read schemas included). */
  def loadOrBuildSimhashIndex(corpus: DataFrame, idCol: String,
      textCol: String, maxHamming: Int = 4, shingleWords: Int = 3,
      dir: String): SimHashIndex = {
    if (!isSimhashIndexSaved(corpus.sparkSession, dir)) {
      val (built, sigs) = simhashIndexWithSigs(corpus, idCol, textCol,
        maxHamming, shingleWords)
      saveSimhashIndex(built, dir)
      sigs.unpersist()
    }
    loadSimhashIndex(corpus.sparkSession, dir,
      Some(simhashIndexSchemas(corpus, idCol, textCol, maxHamming,
        shingleWords)))
  }

  /** Canonical content-signature-keyed scratch location for the demo
    * corpus simhash index (d10) — maxHamming is part of the path
    * because it determines the block-key layout (see [[SimHashIndex]]). */
  def simhashScratchDir(dataset: String, maxHamming: Int = 4,
      table: String = "documents"): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_simhashp_h${maxHamming}_${
      graft.Tables.tableSignature(dataset, table)}"

  /** Incremental SimHash near-dup — [[incrementalMinhash]]'s
    * counterpart on the hamming-distance candidate family: the
    * corpus's combined-block key postings are already persisted; only
    * the NEW batch is tokenized and signed. Emits exact-Jaccard-
    * verified pairs (id_a, id_b, hamming, jaccard, origin) where id_b
    * is always a batch doc and origin marks whether id_a came from the
    * corpus index or earlier in the same batch (id_a < id_b for
    * batch-internal pairs).
    *
    * Cost shape: O(batch) signing, a key equi-join that shuffles only
    * the batch's C(maxHamming+2, 2) key rows against partition-pruned
    * corpus postings, and a verification join over candidate ids — the
    * corpus is never rescanned or re-signed. Unlike the MinHash
    * variant, candidate generation is pigeonhole-COMPLETE, so the
    * result equals [[simhashNearDups]] over corpus ∪ batch restricted
    * to pairs involving a batch doc exactly, not just
    * with-high-probability (QualitySpec pins the equality). */
  def incrementalSimhash(newBatch: DataFrame, idCol: String, textCol: String,
      index: SimHashIndex, maxHamming: Int = 4, shingleWords: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sigs = withShinglesAndSimhash(newBatch.select(col(idCol), col(textCol)),
        idCol, textCol, shingleWords, "_shingles", "_sim")
      .filter(size(col("_shingles")) > 0)
      .persist()
    val nb = simhashBlockKeys(sigs.select(col(idCol), col("_sim")),
      idCol, "_sim", maxHamming)
    // id_a =!= id_b: ids are contract-unique across corpus and batch,
    // but a REPLAYED batch whose postings already committed would
    // otherwise self-match every doc (see incrementalMinhash)
    val vsCorpus = index.keys
      .select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_a"), col("_sim").as("_sim_a"))
      .join(nb.select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_b"), col("_sim").as("_sim_b")),
        Seq("_comb", "_v1", "_v2"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("_sim_a"), col("_sim_b"),
        lit("corpus").as("origin"))
    val within = nb.select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_a"), col("_sim").as("_sim_a"))
      .join(nb.select(col("_comb"), col("_v1"), col("_v2"),
        col(idCol).as("id_b"), col("_sim").as("_sim_b")),
        Seq("_comb", "_v1", "_v2"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_sim_a"), col("_sim_b"),
        lit("batch").as("origin"))
    val cands = vsCorpus.union(within)
      .filter(hammingDist(col("_sim_a"), col("_sim_b")) <= maxHamming)
      .select(col("id_a"), col("id_b"),
        hammingDist(col("_sim_a"), col("_sim_b")).as("hamming"), col("origin"))
      .dropDuplicates("id_a", "id_b", "origin")
    val shA = index.shingles
      .select(col(idCol).as("id_a"), col("_shingles").as("_sh_a"))
      .union(sigs.select(col(idCol).as("id_a"), col("_shingles").as("_sh_a")))
    cands
      .join(shA, Seq("id_a"))
      .join(sigs.select(col(idCol).as("id_b"), col("_shingles").as("_sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "hamming", "jaccard", "origin")
  }

  // ---- brute-force n-gram Jaccard (ground truth / small corpora) ---

  /** All pairs with word-n-gram Jaccard >= threshold — *exact*, via the
    * inverted-index join: explode (doc, shingle), self-equi-join on the
    * shingle, count matches per pair → |A∩B|, then
    * J = ∩ / (|A| + |B| − ∩).
    *
    * Identical output to a nested-loop crossJoin + array_intersect for
    * any threshold > 0 (zero-overlap pairs can't pass), but only
    * pairs that actually share a shingle materialize, the join is a
    * shuffle on the shingle key, and the count is a codegen'd
    * aggregate — a 75× wall-clock difference at sf0.1 (533 s → ~7 s)
    * and the shape that survives 100 TB (cost ~ Σ df(shingle)², not
    * n²). Still the exactness baseline; [[minhashNearDups]] bounds the
    * candidate space further when even the inverted index is too hot. */
  /** Candidate-path policy for [[ngramJaccardPairsAuto]]: the PPJoin
    * prefix filter pays two extra full-gram-stream shuffles (global df
    * aggregation + a df-ranked window re-sort) to shrink candidate
    * volume from Σ df² to Σ df(rare)². Measured at sf0.1 (5 k docs,
    * ProfileD3 `pairs` mode): plain 1.2–2.0 s vs prefix-filtered
    * 4.6–9.8 s for the identical 256-pair result — below ~50 k docs
    * the bound's fixed work dominates and Σ df² is capped by the small
    * corpus anyway; above it the quadratic candidate risk is what
    * matters (a boilerplate-heavy shingle at df = n generates n²
    * candidates on the plain path regardless of corpus size). */
  def usePrefixFilter(nDocs: Long): Boolean = nDocs >= 50000L

  /** [[ngramJaccardPairs]] with the candidate path chosen by
    * [[usePrefixFilter]] on the corpus row count (one cheap count job;
    * output is identical on either path — exact Jaccard verification —
    * so the choice is purely a cost decision). */
  def ngramJaccardPairsAuto(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, threshold: Double = 0.5): DataFrame =
    ngramJaccardPairs(df, idCol, textCol, shingleWords, threshold,
      prefixFilter = usePrefixFilter(df.count()))

  /** Containment near-dup pairs: C(A,B) = |A∩B| / min(|A|,|B|) over
    * n-gram shingle sets — the asymmetric measure that catches a doc
    * being a near-SUBSET of a larger one (a quoted article inside a
    * page, a README pasted into a bundle), which symmetric Jaccard
    * dilutes below any usable threshold as the container grows
    * (J = |A|/|B| → 0 while C stays 1). The standard companion to
    * Jaccard in web-scale dedup (Broder's containment from the
    * original shingling paper).
    *
    * Same plain inverted-index candidate shape as
    * [[ngramJaccardPairs]]: co-occurrence join on shingles, the
    * per-pair row count IS the intersection, so one shuffle produces
    * scored pairs. (The PPJoin prefix bound does NOT apply here —
    * it's derived for Jaccard's symmetric denominator — so the
    * inverted index is the candidate generator at every size; at
    * 100 TB the shingle-df skew guard is dropping ultra-common
    * shingles before the join, the standard stopword-gram cut.)
    * Exact counting + one double division → fully DuckDB-replayable. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = withShingles(df.select(col(idCol).as("_id"), col(textCol)),
        "_id", textCol, shingleWords, "_sh")
      .select(col("_id"), size(col("_sh")).as("_sz"), explode(col("_sh")).as("_s"))
    val a = sh.select(col("_id").as("id_a"), col("_sz").as("_sz_a"), col("_s"))
    val b = sh.select(col("_id").as("id_b"), col("_sz").as("_sz_b"), col("_s"))
    a.join(b, Seq("_s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("_inter"),
        first(col("_sz_a")).as("_sa"), first(col("_sz_b")).as("_sb"))
      .withColumn("containment",
        col("_inter").cast("double") / least(col("_sa"), col("_sb")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("_inter").as("n_common"),
        col("containment"))
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, threshold: Double = 0.5,
      prefixFilter: Boolean = true): DataFrame = {
    // persist: both join branches (a, b) re-shingle otherwise
    val sh = withShingles(df.select(col(idCol).as("_id"), col(textCol)),
        "_id", textCol, shingleWords, "_sh")
      .select(col("_id"), col("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_sz", size(col("_sh")))
      .persist()
    val ex = sh.select(col("_id"), col("_sz"), explode(col("_sh")).as("_s"))
    if (!prefixFilter) {
      // plain inverted-index join: every co-occurring pair materializes;
      // the per-pair count IS the intersection size, so no second pass
      val a = ex.select(col("_id").as("id_a"), col("_sz").as("_sz_a"), col("_s"))
      val b = ex.select(col("_id").as("id_b"), col("_sz").as("_sz_b"), col("_s"))
      a.join(b, Seq("_s"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("_inter"),
          first(col("_sz_a")).as("_sa"), first(col("_sz_b")).as("_sb"))
        .withColumn("jaccard",
          col("_inter").cast("double") / (col("_sa") + col("_sb") - col("_inter")))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    } else {
      // PPJoin-style prefix filter (Xiao et al.): order shingles by
      // global document frequency (rarest first, shingle text as the
      // total-order tiebreak); a pair with J >= t must share a shingle
      // within each side's first |x| - ceil(t*|x|) + 1 shingles, so only
      // the prefixes generate candidates. Candidate volume scales with
      // Σ df(rare shingle)² instead of Σ df², which is what survives a
      // boilerplate-heavy 100 TB corpus; exact Jaccard then verifies the
      // (small) candidate set.
      import org.apache.spark.sql.expressions.Window
      val freq = ex.groupBy("_s").agg(count(lit(1)).as("_df"))
      val ranked = ex.join(freq, Seq("_s"))
        .withColumn("_rn", row_number().over(
          Window.partitionBy("_id").orderBy(col("_df"), col("_s"))))
        .filter(col("_rn") <= col("_sz") - ceil(col("_sz") * threshold) + 1)
        .select(col("_s"), col("_id"))
      val cands = ranked.select(col("_s"), col("_id").as("id_a"))
        .join(ranked.select(col("_s"), col("_id").as("id_b")), Seq("_s"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      cands
        .join(sh.select(col("_id").as("id_a"), col("_sh").as("_sh_a")), Seq("id_a"))
        .join(sh.select(col("_id").as("id_b"), col("_sh").as("_sh_b")), Seq("id_b"))
        .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    }
  }
}
