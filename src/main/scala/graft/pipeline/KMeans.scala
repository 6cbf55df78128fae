package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Deterministic fixed-iteration Lloyd clustering over an embedding
  * column — the corpus-organization primitive (topic bucketing,
  * stratified export, SemDeDup-style cell partitioning) as an exactly
  * replayable operator.
  *
  * Unlike [[IvfAnn]]'s trainer (seeded sampling → rows-only checked),
  * every choice here is deterministic and engine-portable, so the
  * whole clustering is DuckDB-oracle-able:
  *   - init: the k lowest-id vectors are the seeds, and each cluster
  *     is LABELED by its seed's id (stable under empty clusters);
  *   - assignment: argmin over the codegen'd difference-fold squared
  *     L2 distance ([[graft.functions.SqL2Dist]] — a left-to-right
  *     fold, bit-identical to a sequential replay), rounded at 6 dp
  *     with smaller-label tiebreak;
  *   - update: per-(cluster, dim) mean rounded at 6 dp — rounding the
  *     centroids is what makes iteration i+1's inputs bit-identical
  *     across engines despite each engine's own sum order;
  *   - empty clusters keep their previous centroid.
  *
  * Scale shape: centroids are a k×dim local frame BROADCAST into the
  * assignment join (one linear scan of the vectors per iteration, the
  * s1 pattern); the update is one (cluster, dim)-keyed partial
  * aggregate. The only driver-side data is the k×dim centroid matrix
  * itself (k and dim are model constants, never corpus-sized) — the
  * same bounded-collect contract as [[IvfAnn]]'s codebook loop.
  */
object KMeans {

  /** Run `iterations` full Lloyd steps (assign + centroid update) from
    * the first-k-ids seeds, then return the final assignment against
    * the post-update centroids: (idCol, cluster, dist2_r) where
    * `cluster` is the seed id of the winning centroid and `dist2_r`
    * the 6-dp-rounded squared L2 distance to it. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iterations: Int = 2): DataFrame =
    fitAssign(vecs, idCol, vecCol, k, iterations)._2

  /** [[assign]], but also returning the final (label, centroid)
    * model — the k×dim matrix an IVF-style consumer ([[DetIvf]])
    * probes against. One Lloyd run feeds both. */
  def fitAssign(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iterations: Int = 2)
      : (Seq[(Long, Seq[Double])], DataFrame) = {
    require(k >= 1 && iterations >= 0,
      s"need k >= 1, iterations >= 0 (got $k, $iterations)")
    val spark = vecs.sparkSession
    import spark.implicits._
    val v = vecs.select(col(idCol).cast("long").as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
      .persist()  // scanned once per iteration + the final assignment

    // seeds: the k lowest ids, k rows to the driver (bounded by k)
    var cents: Seq[(Long, Seq[Double])] = v.orderBy("_id").limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    def assignTo(cs: Seq[(Long, Seq[Double])]): DataFrame = {
      val cf = cs.toDF("_c", "_cv")
      v.crossJoin(broadcast(cf))
        .withColumn("_d2", round(VectorExprs.sqL2Dist(col("_v"), col("_cv")), 6))
        .groupBy("_id")
        .agg(min(struct(col("_d2"), col("_c"))).as("_m"))
        .select(col("_id"), col("_m._c").as("_c"), col("_m._d2").as("_d2"))
    }

    for (_ <- 1 to iterations) {
      // per-(cluster, dim) mean, rounded; k*dim rows to the driver
      val means = assignTo(cents).join(v, Seq("_id"))
        .select(col("_c"), posexplode(col("_v")).as(Seq("_dim", "_x")))
        .groupBy("_c", "_dim")
        .agg(round(avg(col("_x")), 6).as("_mv"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (c, rows: Array[Row]) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.map { case (c, cv) => c -> means.getOrElse(c, cv) }
    }

    val out = assignTo(cents)
      .select(col("_id").as(idCol), col("_c").as("cluster"),
        col("_d2").as("dist2_r"))
      .localCheckpoint(true)
    v.unpersist(blocking = false)
    (cents, out)
  }
}
