package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.{Catalog, Ltcv}

/** Gold summary tables — the replacement for the reference's
  * `objstats_{procver}` / `objstatscomb_{procver}` materialized views
  * (src/ltcv.py:1537-1831) and the pg_parquet lightcurve exporter
  * (src/parquet_export.py:52-137).
  *
  * The reference creates the views with 8 chained subqueries and
  * per-view indexes, refreshed manually; here each is one
  * `groupBy` pass over the deduped detections, written as parquet and
  * refreshed by overwrite (refresh = rerun). Object search (§3.4) is
  * then a predicate-spec filter over the gold table — at 100 TB the
  * search never touches photometry.
  */
object GoldTables {

  /** Build + persist per-band and cross-band objstats for one procver.
    * Joins weighted positions (A7) so cone search works on the gold
    * table alone. */
  def refreshObjStats(cat: Catalog, procverId: String, outDir: String): Unit = {
    // persist: the priority dedup over the full photometry is the most
    // expensive aggregation in the system, and without it the two
    // writes would execute it three times (perBand once, comb's
    // objStatsComb + weightedPositions join twice more)
    val src = Ltcv.sources(cat, procverId).persist()
    try {
      val perBand = Ltcv.objStats(src)
      val comb = Ltcv.objStatsComb(src)
        .join(Ltcv.weightedPositions(src), Seq("rootid"), "left_outer")
      perBand.write.mode("overwrite").parquet(s"$outDir/objstats_$procverId")
      comb.write.mode("overwrite").parquet(s"$outDir/objstatscomb_$procverId")
    } finally src.unpersist()
  }

  def objStats(spark: SparkSession, outDir: String, procverId: String,
      band: Option[String] = None): DataFrame = {
    val perBand = band.isDefined
    val name = if (perBand) s"objstats_$procverId" else s"objstatscomb_$procverId"
    val df = spark.read.parquet(s"$outDir/$name")
    band.map(b => df.filter(col("band") === b)).getOrElse(df)
  }

  /** S7 — lightcurve parquet export: one row per root object with the
    * photometry as an mjd-ordered array of records
    * (array_agg(record ORDER BY mjd), parquet_export.py:52-93). */
  def exportLtcvs(cat: Catalog, procverId: String, outDir: String,
      whichPhot: String = "patch"): Unit = {
    val ltcv = Ltcv.objectLtcvs(cat, procverId, whichPhot = whichPhot)
    // isdet/ispatch exist only on the patch-join output; the
    // detections-only / forced-only exports carry the constant flags
    // instead of failing analysis. Constants follow patchJoin's pinned
    // semantics (ispatch = "this flux comes from the detection"): a
    // detections export is all detection fluxes (true, true), a forced
    // export is all forced photometry (false, false).
    val (isdet, ispatch) = whichPhot match {
      case "detections" => (lit(true).as("isdet"), lit(true).as("ispatch"))
      case "forced"     => (lit(false).as("isdet"), lit(false).as("ispatch"))
      case _            => (col("isdet"), col("ispatch"))
    }
    ltcv
      .groupBy("rootid")
      .agg(array_sort(collect_list(struct(
        col("midpointmjdtai").as("mjd"), col("band"),
        col("psfflux"), col("psffluxerr"),
        isdet, ispatch))).as("ltcv"),
        count(lit(1)).as("nobs"))
      .write.mode("overwrite").parquet(outDir)
  }
}
