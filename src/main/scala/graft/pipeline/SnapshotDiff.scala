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

  /** SCD-type-2 history from a stack of full snapshots — the lakehouse
    * "as-of any version" table [[diff]] generalizes to: given
    * (key, version, digest) rows with consecutive integer versions, a
    * new validity interval OPENS when the key first appears, reappears
    * after an absence gap, or its digest changes; it CLOSES at the
    * last version before the next opening (or the key's last
    * appearance). Output: one row per interval — (key, digest,
    * valid_from, valid_to) with the digest constant over the interval
    * by construction.
    *
    * Plan shape: one per-key lag window (keys are many, versions per
    * key are few — the partitions are tiny) + a running-sum era id +
    * one partial-aggregated groupBy. No join against the snapshot
    * stack; each snapshot row is read once. */
  /** Point-in-time slice of an SCD-2 history ([[scdHistory]] output):
    * the rows whose validity interval covers `version` — i.e. the
    * snapshot as it existed at that version, reconstructed WITHOUT
    * rescanning any snapshot. On a history table partitioned or
    * z-ordered by the validity columns this filter partition-prunes;
    * either way it is a scan-stage predicate, never a join. */
  def asOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
      col("valid_to") >= version)

  /** Time-travel diff: classify every key between two VERSIONS of the
    * corpus using only the SCD-2 history — `added` / `removed` /
    * `changed` / `unchanged` from `vOld` to `vNew`, same taxonomy as
    * [[diff]] but with both sides reconstructed by [[asOf]] interval
    * filters instead of full-snapshot digest scans. This is the audit
    * that stays cheap when snapshots are petabyte-scale but churn is
    * small: the history table carries one row per CHANGE interval, so
    * both sides of the single full-outer id-join are churn-sized, not
    * corpus-sized. */
  def asOfDiff(history: DataFrame, keyCol: String, digestCol: String,
      vOld: Long, vNew: Long): DataFrame = {
    def at(v: Long, as: String) =
      asOf(history, v).select(col(keyCol), col(digestCol).as(as))
    at(vOld, "_d1").join(at(vNew, "_d2"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("_d1").isNull, lit("added"))
          .when(col("_d2").isNull, lit("removed"))
          .when(col("_d1") === col("_d2"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  def scdHistory(snaps: DataFrame, keyCol: String, verCol: String,
      digestCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(verCol)
    snaps
      .withColumn("_pv", lag(col(verCol), 1).over(w))
      .withColumn("_pd", lag(col(digestCol), 1).over(w))
      .withColumn("_open", when(col("_pv").isNull ||
        col("_pv") =!= col(verCol) - 1 ||
        col("_pd") =!= col(digestCol), 1L).otherwise(0L))
      .withColumn("_era", sum(col("_open")).over(w))
      .groupBy(col(keyCol), col("_era"))
      .agg(max(col(digestCol)).as(digestCol),
        min(col(verCol)).as("valid_from"),
        max(col(verCol)).as("valid_to"))
      .drop("_era")
  }
}
