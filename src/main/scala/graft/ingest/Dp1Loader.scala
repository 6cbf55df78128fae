package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S2 — DP1 nested-parquet loader (src/admin/load_dp1_parquet.py:119-165).
  *
  * Input: object rows with *nested arrays* of diaSource /
  * diaObjectForcedSource records (the nested_pandas layout). Spark
  * reads nested parquet natively; the flatten is an `explode` plus
  * column renames — no custom reader needed. Column maps follow
  * load_dp1_parquet.py:20-75.
  */
object Dp1Loader {

  /** `objects` schema: (diaObjectId, ra, dec,
    *   diaSource: array<struct<...>>, diaObjectForcedSource: array<struct<...>>) */
  def load(objects: DataFrame, baseProcverId: String): Loaded = {
    val obj = objects.select(
      col("diaObjectId").cast("long").as("diaobjectid"),
      lit(baseProcverId).as("base_procver_id"),
      col("ra").cast("double").as("ra"),
      col("dec").cast("double").as("dec"))

    val src = objects
      .select(col("diaObjectId").cast("long").as("diaobjectid"),
        explode(col("diaSource")).as("s"))
      .select(
        col("s.diaSourceId").cast("long").as("diasourceid"),
        lit(baseProcverId).as("base_procver_id"),
        col("diaobjectid"),
        col("s.visit").cast("long").as("visit"),
        col("s.band").as("band"),
        col("s.midpointMjdTai").cast("double").as("midpointmjdtai"),
        col("s.psfFlux").cast("float").as("psfflux"),
        col("s.psfFluxErr").cast("float").as("psffluxerr"),
        col("s.ra").cast("double").as("ra"),
        col("s.dec").cast("double").as("dec"),
        // null astrometric errors, matching SnanaLoader's detected
        // shape — without them SourceImporter.newRows'
        // select(existing.columns) fails on a DP1-loaded batch
        lit(null).cast("float").as("raerr"),
        lit(null).cast("float").as("decerr"),
        lit(null).cast("float").as("ra_dec_cov"))

    val forced = objects
      .select(col("diaObjectId").cast("long").as("diaobjectid"),
        explode(col("diaObjectForcedSource")).as("f"))
      .select(
        col("f.diaForcedSourceId").cast("long").as("diaforcedsourceid"),
        lit(baseProcverId).as("base_procver_id"),
        col("diaobjectid"),
        col("f.visit").cast("long").as("visit"),
        col("f.band").as("band"),
        col("f.midpointMjdTai").cast("double").as("midpointmjdtai"),
        col("f.psfFlux").cast("float").as("psfflux"),
        col("f.psfFluxErr").cast("float").as("psffluxerr"),
        lit(null).cast("double").as("ra"),
        lit(null).cast("double").as("dec"))

    Loaded(obj, src, forced)
  }
}
