package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted near-dup cluster artifact — the production shape of the
  * cc-family: the expensive substrate (shingle pair graph + connected
  * components) is built ONCE per corpus and persisted; every consumer
  * (apply-clusters, keep-best, split assignment, audits) PROBES the
  * parquet artifact instead of re-paying the build. At 100 TB the
  * cluster table is the deliverable a dedup job ships to the rest of
  * the pipeline — nobody recomputes a trillion-shingle pair graph to
  * ask "which cluster is this doc in".
  *
  * Persistence follows the [[IvfAnn.scratchDir]] convention: the
  * location is keyed by the SOURCE table's content signature plus the
  * clustering parameters, so a regenerated dataset (or a different
  * shingle/threshold config) rebuilds instead of serving stale
  * clusters. Commit protocol is [[graft.util.Stage]]: build into a
  * staging dir, atomic rename to publish — readers never see a
  * half-written table and concurrent builders race safely.
  */
object ClusterStore {

  /** Canonical scratch location for the cluster table of `dataset`'s
    * documents at the given clustering parameters. */
  def scratchDir(dataset: String, shingleWords: Int, threshold: Double): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cc_${shingleWords}_" +
      s"${math.round(threshold * 100)}_" +
      graft.Tables.tableSignature(dataset, "documents")

  /** Load the persisted (doc_id, cluster, is_rep) table if present,
    * else build it from `docs` (pair graph auto-policy + large/small-
    * star CC, exactly cc1's substrate) and persist it via the
    * [[graft.util.Stage]] staging-then-rename protocol (Hadoop-FS
    * markers, atomic publish, race-safe against concurrent builders).
    * Either way the returned frame reads from parquet, so repeat
    * consumers pay only the scan. */
  def loadOrBuild(spark: SparkSession, dataset: String, docs: => DataFrame,
      shingleWords: Int = 3, threshold: Double = 0.5): DataFrame = {
    val dir = scratchDir(dataset, shingleWords, threshold)
    if (!graft.util.Stage.isCommitted(spark, dir)) {
      graft.util.Stage.publish(spark, dir) { staging =>
        val d = docs
        val pairs = Dedup.ngramJaccardPairsAuto(d, "doc_id", "text",
          shingleWords = shingleWords, threshold = threshold)
        Components.dedupClusters(d, "doc_id", pairs, "id_a", "id_b")
          .write.mode("overwrite").parquet(staging)
      }
    }
    spark.read.parquet(dir)
  }
}
