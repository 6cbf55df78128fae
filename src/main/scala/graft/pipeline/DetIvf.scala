package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Fully-deterministic IVF nearest-neighbor search — the oracle-able
  * counterpart to [[IvfAnn]] (whose seeded-sample trainer makes it
  * rows-only checkable): coarse cells come from [[KMeans.fitAssign]]'s
  * exactly-replayable Lloyd run (first-k-id seeds, 6-dp-rounded
  * distances AND centroid means), the query probes its `nprobe`
  * nearest cells by the same rounded metric, and candidates re-rank by
  * exact squared L2 rounded at 6 dp with id tiebreak. Every decision
  * point is rounded-then-compared, so the whole index build + probe +
  * re-rank replays bit-for-bit on any engine — an ANN query under the
  * full hash-oracle gate, not just a recall spec.
  *
  * Scale shape: the Lloyd build is one linear scan per iteration
  * (broadcast k×dim centroids); cell assignment rides the same scan.
  * At query time the probe ranking is queries × k rows (window over a
  * broadcast-sized frame), and the candidate join touches only the
  * probed cells' members — ~nprobe/k of the corpus per query, the IVF
  * contract. The final top-k window partitions per query over that
  * candidate subset, never the corpus. The query side broadcasts into
  * the scoring join (the s1/s10 pattern).
  */
object DetIvf {

  /** Top-`topK` neighbors per query over a `kCells`-cell deterministic
    * IVF index with `nprobe`-cell probes. Output: (qIdCol, idCol,
    * d2_r, rank) — squared L2 rounded at 6 dp, rank by (d2_r, id).
    * Self-matches (same id on both sides) are excluded. */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      kCells: Int = 8, iterations: Int = 2, nprobe: Int = 2,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._

    val (cents, cells) =
      KMeans.fitAssign(corpus, idCol, vecCol, kCells, iterations)
    val cf = cents.toDF("_c", "_cv")

    // probe ranking: queries × kCells rows, nprobe nearest cells each
    val q = queries.select(col(qIdCol).cast("long").as("_qid"),
      col(qVecCol).cast("array<double>").as("_qv"))
    val wProbe = Window.partitionBy("_qid").orderBy(col("_pd2"), col("_c"))
    val probes = q.crossJoin(broadcast(cf))
      .withColumn("_pd2", round(VectorExprs.sqL2Dist(col("_qv"), col("_cv")), 6))
      .withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= nprobe)
      .select(col("_qid"), col("_qv"), col("_c"))

    // candidates: members of the probed cells only
    val members = cells.select(col(idCol).cast("long").as("_id"),
        col("cluster").as("_c"))
      .join(corpus.select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v")), Seq("_id"))
    val wRank = Window.partitionBy("_qid").orderBy(col("d2_r"), col("_id"))
    broadcast(probes).join(members, Seq("_c"))
      .filter(col("_id") =!= col("_qid"))
      .withColumn("d2_r", round(VectorExprs.sqL2Dist(col("_qv"), col("_v")), 6))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("_qid").as(qIdCol), col("_id").as(idCol),
        col("d2_r"), col("rank"))
  }
}
