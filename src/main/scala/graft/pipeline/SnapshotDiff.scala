package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit a pipeline runs between crawl
  * versions before re-training: classify every document id as
  * `added` (only in the new snapshot), `removed` (only in the old),
  * `changed` (present in both, content digest differs), or
  * `unchanged`, and roll the churn up per source/domain. The diff is
  * what decides whether downstream artifacts (dedup indexes, BPE
  * merges, quality models) need refreshing, and the churn report is
  * the first thing an operator looks at when a crawl misbehaves.
  *
  * Scale shape: one md5 digest per row in the scan stage, then a
  * single full-outer equi-join on the id — both snapshots shuffle once
  * on the id key and nothing carries text past the digest projection.
  * Exact and seedless, so the whole surface replays in any engine.
  */
object SnapshotDiff {

  /** Per-id classification. Output: (idCol, status) with status in
    * {added, removed, changed, unchanged}. Ids must be unique within
    * each snapshot (the usual URL/doc-id contract; duplicate ids
    * should be deduplicated upstream — [[Dedup.exactDedup]]). */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def dig(df: DataFrame, as: String) =
      df.select(col(idCol), md5(col(textCol)).as(as))
    dig(v1, "_d1").join(dig(v2, "_d2"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_d1").isNull, lit("added"))
          .when(col("_d2").isNull, lit("removed"))
          .when(col("_d1") === col("_d2"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Churn rollup per `groupCol` (source, domain, language): counts
    * per status + the churn ratio (non-unchanged over old-snapshot
    * size; `added` rows take the NEW snapshot's group, everything else
    * the old's). A group seen only in v2 has no old size — its ratio
    * is null rather than a fake infinity. */
  def churnReport(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String, groupCol: String): DataFrame = {
    val d = diff(v1, v2, idCol, textCol)
    val grp = coalesce(col("_g1"), col("_g2")).as(groupCol)
    val labeled = d
      .join(v1.select(col(idCol), col(groupCol).as("_g1")), Seq(idCol), "left")
      .join(v2.select(col(idCol), col(groupCol).as("_g2")), Seq(idCol), "left")
      .select(grp, col("status"))
    def n(s: String) = sum(when(col("status") === s, 1L).otherwise(0L)).as(s"n_$s")
    labeled.groupBy(groupCol)
      .agg(n("added"), n("removed"), n("changed"), n("unchanged"))
      .withColumn("churn", round(
        (col("n_removed") + col("n_changed")) /
          nullif(col("n_removed") + col("n_changed") + col("n_unchanged"),
            lit(0L)), 4))
  }
}
