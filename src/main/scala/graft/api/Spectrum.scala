package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Spectrum-cycle workflow (src/spectrum.py + spectrumapp.py): request
  * spectra for transients, claim them per facility, report results —
  * the reference's wanted/planned/info anti-join battery (J3/J8, A9).
  */
object Spectrum {

  /** Spectra wanted but not yet claimed by any facility
    * (spectrum.py:150-156). */
  def wantedNotClaimed(wanted: DataFrame, planned: DataFrame): DataFrame =
    wanted.join(planned.select("root_diaobject_id").distinct(),
      Seq("root_diaobject_id"), "left_anti")

  /** Spectra wanted with no spectrum reported since `sinceMjd`
    * (spectrum.py:202-215). */
  def wantedWithoutRecentSpectrum(wanted: DataFrame, info: DataFrame,
      sinceMjd: Double): DataFrame =
    wanted.join(
      info.filter(col("mjd") >= sinceMjd).select("root_diaobject_id").distinct(),
      Seq("root_diaobject_id"), "left_anti")

  /** A9 — latest detection magnitude per (rootid, band): the pandas
    * groupby-idxmax (spectrum.py:265-291) as one max_by pass. */
  def latestDetectionMags(dedupedSources: DataFrame): DataFrame =
    dedupedSources
      .groupBy("rootid", "band")
      .agg(max_by(struct(col("midpointmjdtai").as("mjd"), col("psfflux").as("flux")),
        struct(col("midpointmjdtai"), col("diasourceid"))).as("_latest"))
      .select(col("rootid"), col("band"),
        col("_latest.mjd").as("latest_mjd"),
        Funcs.flux2mag(col("_latest.flux")).as("latest_mag"))

  /** New spectrum-want request rows (spectrumapp.py:59-63): id munging
    * F14 + priority clamp F15. */
  def makeWantRows(requests: DataFrame): DataFrame =
    requests.withColumn("wantspec_id",
        Funcs.wantspecId(col("root_diaobject_id"), col("requester")))
      .withColumn("priority", Funcs.clampPriority(col("priority")).cast("short"))
}
