package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, and brute-force
  * n-gram Jaccard (the small-scale ground truth the probabilistic
  * methods are tested against).
  *
  * All signature computation is pure codegen'd column expressions
  * (higher-order array functions + xxhash64) — no UDFs, no driver
  * loops. The only shuffles are the band-bucket equi-join (MinHash) and
  * the final pair joins, both on dense integer/hash keys that AQE can
  * re-split on skew — the properties that matter at 100 TB, where
  * candidate generation must stay near-linear and only verified
  * candidates pay the quadratic cost.
  */
object Dedup {

  // ---- shingling ---------------------------------------------------

  /** Distinct word n-gram shingles of a text column. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    val m = size(words) - (n - 1)
    when(m > 0,
      array_distinct(transform(sequence(lit(0), m - 1),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

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
    * `textCol`; adds `n_copies`. Hash-groupBy — one shuffle on the
    * 64-bit text hash, constant memory per group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = xxhash64(col(textCol))
    df.withColumn("_th", h)
      .groupBy("_th")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("_th")
      .join(df, Seq(idCol))
  }

  // ---- MinHash + LSH ----------------------------------------------

  /** k-permutation MinHash signature of a shingle-array column:
    * sig[i] = min over shingles of xxhash64(shingle, i). */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** Add `_shingles` and `_sig` columns. */
  def withMinhash(df: DataFrame, textCol: String, shingleWords: Int, k: Int): DataFrame =
    df.withColumn("_shingles", wordShingles(col(textCol), shingleWords))
      .filter(size(col("_shingles")) > 0)
      .withColumn("_sig", minhashSignature(col("_shingles"), k))

  /** LSH banding: explode the signature into `bands` buckets of `rows`
    * values each; two docs sharing any (band, hash) bucket become a
    * candidate pair. Returns (band, bucket, <df columns>). */
  def lshBuckets(df: DataFrame, bands: Int, rows: Int): DataFrame =
    df.withColumn("_band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("_bucket",
        xxhash64(slice(col("_sig"), col("_band") * rows + 1, lit(rows)), col("_band")))

  /** Candidate pairs from shared LSH buckets, verified by exact shingle
    * Jaccard >= `threshold`. Output: (id_a, id_b, jaccard) with
    * id_a < id_b, distinct. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = withMinhash(df.select(col(idCol), col(textCol)), textCol, shingleWords, numHashes)
    val buckets = lshBuckets(sigs, bands, rows)
      .select(col("_band"), col("_bucket"), col(idCol), col("_shingles"))
    val a = buckets.select(col("_band"), col("_bucket"),
      col(idCol).as("id_a"), col("_shingles").as("_sh_a"))
    val b = buckets.select(col("_band"), col("_bucket"),
      col(idCol).as("id_b"), col("_shingles").as("_sh_b"))
    a.join(b, Seq("_band", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_sh_a"), col("_sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash -----------------------------------------------------

  /** 64-bit SimHash over a token-array column: bit b is set iff the sum
    * over tokens of ±1 (sign of bit b of the token hash) is >= 0. */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
      val bitSum = aggregate(hashes, lit(0L), (s, h) =>
        s + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      acc.bitwiseOR(when(bitSum >= 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L)))
    })
  }

  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates with hamming distance <=
    * `maxHamming`, verified by exact shingle Jaccard >= `threshold`.
    *
    * Candidate generation joins on rotated 16-bit blocks of the
    * signature (any pair within hamming d <= 3 shares at least one of
    * the 4 blocks exactly — pigeonhole), keeping the join an equi-join
    * instead of an n² cross. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, shingleWords: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol), col(textCol))
      .withColumn("_shingles", wordShingles(col(textCol), shingleWords))
      .filter(size(col("_shingles")) > 0)
      .withColumn("_tokens", split(trim(col(textCol)), "\\s+"))
      .withColumn("_sim", simhash64(col("_tokens")))
    // 4 blocks of 16 bits; hamming <= 3 ⇒ >= 1 block identical
    val blocks = base.withColumn("_blk", explode(sequence(lit(0), lit(3))))
      .withColumn("_blkval",
        call_function("shiftright", col("_sim"), col("_blk") * 16).bitwiseAND(lit(0xFFFFL)))
    val a = blocks.select(col("_blk"), col("_blkval"), col(idCol).as("id_a"),
      col("_sim").as("_sim_a"), col("_shingles").as("_sh_a"))
    val bSel = blocks.select(col("_blk"), col("_blkval"), col(idCol).as("id_b"),
      col("_sim").as("_sim_b"), col("_shingles").as("_sh_b"))
    a.join(bSel, Seq("_blk", "_blkval"))
      .filter(col("id_a") < col("id_b"))
      .filter(hammingDist(col("_sim_a"), col("_sim_b")) <= maxHamming)
      .select(col("id_a"), col("id_b"), col("_sh_a"), col("_sh_b"),
        hammingDist(col("_sim_a"), col("_sim_b")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "hamming", "jaccard")
  }

  // ---- brute-force n-gram Jaccard (ground truth / small corpora) ---

  /** All pairs with word-n-gram Jaccard >= threshold, by brute-force
    * self-join. Quadratic — the correctness baseline the LSH variants
    * are measured against; use [[minhashNearDups]] at scale. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol), wordShingles(col(textCol), shingleWords).as("_sh"))
      .filter(size(col("_sh")) > 0)
    val a = sh.select(col(idCol).as("id_a"), col("_sh").as("_sh_a"))
    val b = sh.select(col(idCol).as("id_b"), col("_sh").as("_sh_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
