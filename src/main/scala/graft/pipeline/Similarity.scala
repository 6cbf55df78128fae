package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine top-k is the exactness baseline; the scale path
  * is hyperplane-LSH bucketing (random-projection signs → integer
  * bucket, equi-join on bucket with optional 1-bit multiprobe), which
  * turns the n² pair space into per-bucket blocks. Dot products are
  * `zip_with` + `aggregate` column expressions evaluated in whole-stage
  * codegen — no UDFs.
  */
object Similarity {

  /** Elementwise dot product of two numeric array columns (double) —
    * a custom codegen'd Catalyst expression; the equivalent
    * `aggregate(zip_with(...))` runs interpreted and is ~10× slower in
    * the O(n²) pair loops (see graft.functions.DotProduct). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, zero-norm-safe: a zero vector (empty/OOV
    * document embedding) has undefined direction — its similarity is
    * defined as 0 rather than NaN, because Spark sorts NaN ABOVE every
    * real number and a single NaN row would otherwise rank first in
    * every top-k window it reaches. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** All (query, corpus) cosine similarities. `queries` should be small
    * (it is broadcast); corpus scans stay partition-local. */
  def pairSims(corpus: DataFrame, queries: DataFrame,
      idCol: String, qIdCol: String, embCol: String, qEmbCol: String): DataFrame =
    corpus.crossJoin(broadcast(queries))
      .filter(col(qIdCol) =!= col(idCol))
      .withColumn("sim", cosine(col(qEmbCol), col(embCol)))

  /** Exact brute-force top-k nearest neighbours per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", qIdCol: String = "q_vec_id",
      embCol: String = "embedding", qEmbCol: String = "q_embedding"): DataFrame = {
    val w = Window.partitionBy(qIdCol).orderBy(desc("sim"), col(idCol))
    pairSims(corpus, queries, idCol, qIdCol, embCol, qEmbCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("sim"), col("rank"))
  }

  /** Exact brute-force MAXIMUM-INNER-PRODUCT top-k — the scoring mode
    * of recommender / two-tower retrieval, where magnitude carries
    * signal (popularity, confidence) that cosine normalizes away.
    * Ranking is on the 4-dp-rounded product with id tiebreak (the s1
    * idiom), so both engines rank identically. `excludeSelfId` drops
    * corpus rows whose id equals the query id — ONLY for the
    * self-corpus case (queries drawn from the corpus itself, as in
    * s10); leave it false when query and corpus ids live in different
    * id spaces (users × items), where a numeric collision would
    * silently punch a hole in that query's candidate set. At scale
    * MIPS reduces to cosine ANN via the norm-augmentation transform
    * (Bachrach et al., RecSys 2014): append sqrt(M² − ‖x‖²) to each
    * corpus vector and 0 to queries, then any cosine index
    * ([[cosineNearDupsLsh]], [[IvfAnn]], [[PqAnn]]) serves MIPS —
    * this brute force is the exactness baseline those paths verify
    * against. */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", qIdCol: String = "q_vec_id",
      embCol: String = "embedding", qEmbCol: String = "q_embedding",
      excludeSelfId: Boolean = false): DataFrame = {
    val w = Window.partitionBy(qIdCol).orderBy(desc("ip_r"), col(idCol))
    val paired = corpus.crossJoin(broadcast(queries))
    (if (excludeSelfId) paired.filter(col(qIdCol) =!= col(idCol)) else paired)
      .withColumn("ip_r", round(dot(col(qEmbCol), col(embCol)), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("ip_r"), col("rank"))
  }

  /** Unit-normalize an embedding column (norm computed once per row).
    * A zero vector stays a zero vector (0/0 would propagate NaN into
    * every downstream dot product, ranking, and k-means fit). */
  def normalized(df: DataFrame, embCol: String, outCol: String): DataFrame =
    df.withColumn("_nrm", norm(col(embCol)))
      .withColumn(outCol, when(col("_nrm") > 0,
          transform(col(embCol), x => x.cast("double") / col("_nrm")))
        .otherwise(transform(col(embCol), x => lit(0.0))))
      .drop("_nrm")

  /** All pairs with cosine >= threshold (embedding near-dup detection),
    * brute force. Vectors are unit-normalized once up front so each of
    * the O(n²) pairs costs a single dot product instead of a dot plus
    * two norms (3× fewer interpreted lambda evals — the pair loop is
    * the entire cost at scale). Quadratic ground truth; see [[annTopK]]
    * for the LSH scale path. */
  def cosineNearDups(df: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    // persist: both sides of the pair join read the normalized vectors
    val n = normalized(df.select(col(idCol), col(embCol)), embCol, "_ne").persist()
    val a = n.select(col(idCol).as("id_a"), col("_ne").as("_e_a"))
    val b = n.select(col(idCol).as("id_b"), col("_ne").as("_e_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("_e_a"), col("_e_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** All pairs with cosine >= threshold via multi-table hyperplane-LSH
    * blocking + exact-cosine verification — the scale-shaped variant of
    * [[cosineNearDups]], mirroring how MinHash banding feeds exact
    * Jaccard: candidates come from an equi-join on (table, bucket)
    * keys, only ids travel through the bucket shuffle, and normalized
    * vectors join back for the (small) verified set.
    *
    * Honest tradeoff, because it is threshold-dependent: a pair at
    * cosine t collides per plane with p = 1 − arccos(t)/π, so per
    * 4-plane table a t = 0.4 pair survives at p⁴ ≈ 0.16 vs 1/16 for a
    * random pair — only ~2.5× separation, and reaching recall ≥ 0.95
    * (16 tables) leaves candidate volume a large fraction of n²/2. At
    * a realistic near-dup threshold (t ≥ 0.8, p ≥ 0.8/plane) the same
    * index prunes to ~n²/25 per table and fewer tables are needed —
    * the regime this operator is built for. Recall vs the brute-force
    * ground truth is asserted in PipelineSpec; the all-pairs
    * [[cosineNearDups]] stays as that ground truth and is no longer on
    * any battery path. */
  def cosineNearDupsLsh(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, dim: Int, numTables: Int = 16,
      planesPerTable: Int = 4, seed: Long = 42L): DataFrame = {
    val all = hyperplanes(numTables * planesPerTable, dim, seed)
    // persist: bucket derivation and both verification branches read it
    val n = normalized(df.select(col(idCol), col(embCol)), embCol, "_ne").persist()
    val keyed = n.select(col(idCol),
      posexplode(array((0 until numTables).map { t =>
        lshBucket(col("_ne"), all.slice(t * planesPerTable, (t + 1) * planesPerTable))
      }: _*)).as(Seq("_table", "_bucket")))
    val cands = keyed.select(col("_table"), col("_bucket"), col(idCol).as("id_a"))
      .join(keyed.select(col("_table"), col("_bucket"), col(idCol).as("id_b")),
        Seq("_table", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    cands
      .join(n.select(col(idCol).as("id_a"), col("_ne").as("_e_a")), Seq("id_a"))
      .join(n.select(col(idCol).as("id_b"), col("_ne").as("_e_b")), Seq("id_b"))
      .withColumn("sim", dot(col("_e_a"), col("_e_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  // ---- hyperplane LSH (scale path) ---------------------------------

  /** Deterministic pseudo-random hyperplanes (seeded Gaussian). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit bucket id of an embedding under the given hyperplanes. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, typedlit(p)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b)).cast("int")

  /** Approximate top-k per query via multi-table hyperplane LSH.
    *
    * `numTables` independent tables of `planesPerTable` hyperplanes
    * each; a corpus row lands in one bucket per table (the classic L×
    * memory/recall tradeoff), queries probe their own bucket plus every
    * 1-bit flip (multiprobe). Candidates are the union over tables,
    * deduped, then ranked by exact cosine. A single wide table cannot
    * reach useful recall for moderate-similarity neighbours (P[same
    * side] ≈ 1 − θ/π per plane decays exponentially in planes); the
    * table union converts that into 1 − (1−p^r)^L. Recall vs
    * [[bruteForceTopK]] is asserted in PipelineSpec.
    *
    * Scale shape: corpus replicated ×numTables into an equi-join on
    * (table, bucket) — linear scans, dense int keys, AQE-splittable;
    * queries are broadcast. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, numTables: Int = 8, planesPerTable: Int = 4,
      idCol: String = "vec_id", qIdCol: String = "q_vec_id",
      embCol: String = "embedding", qEmbCol: String = "q_embedding",
      seed: Long = 42L): DataFrame = {
    val all = hyperplanes(numTables * planesPerTable, dim, seed)
    def buckets(e: Column): Column = array((0 until numTables).map { t =>
      lshBucket(e, all.slice(t * planesPerTable, (t + 1) * planesPerTable))
    }: _*)
    val c = corpus.select(col(idCol), col(embCol),
        posexplode(buckets(col(embCol))).as(Seq("_table", "_bucket")))
    val flips = lit(0) +: (0 until planesPerTable).map(i => lit(1 << i))
    val q = queries.select(col(qIdCol), col(qEmbCol),
        posexplode(buckets(col(qEmbCol))).as(Seq("_table", "_qbucket")))
      .withColumn("_flip", explode(array(flips: _*)))
      .withColumn("_bucket", col("_qbucket").bitwiseXOR(col("_flip")))
      .select(col(qIdCol), col(qEmbCol), col("_table"), col("_bucket"))
    val w = Window.partitionBy(qIdCol).orderBy(desc("sim"), col(idCol))
    c.join(broadcast(q), Seq("_table", "_bucket"))
      .filter(col(qIdCol) =!= col(idCol))
      .select(col(qIdCol), col(qEmbCol), col(idCol), col(embCol))
      .dropDuplicates(qIdCol, idCol)
      .withColumn("sim", cosine(col(qEmbCol), col(embCol)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("sim"), col("rank"))
  }
}
