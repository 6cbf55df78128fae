package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** S1 — SNANA-shaped batch loader (src/admin/load_snana_fits.py:115-245).
  *
  * The reference reads HEAD/PHOT FITS pairs with astropy; FITS decoding
  * is a one-time out-of-band conversion to parquet (astropy → parquet),
  * after which this loader applies the same column semantics as pure
  * DataFrame transforms:
  *
  *  - HEAD: one row per object — SNID (string → long) → diaobjectid,
  *    RA/DEC, PTROBS_MIN/PTROBS_MAX 1-indexed row range into PHOT;
  *  - PHOT: one row per observation — MJD → midpointmjdtai, BAND
  *    (needs strip), FLUXCAL/FLUXCALERR → psfflux/err after the ZP
  *    rescale flux *= 10^((31.4−zp)/2.5) (`:185-186`), PHOTFLAG;
  *  - derived: visit = floor(mjd*20000) (`:208`), diaforcedsourceid =
  *    SNID*maxSourcesPerObject + seq (`:210-211`);
  *  - every PHOT row becomes a forced source; rows with
  *    (PHOTFLAG & photflagDetect) != 0 additionally become detections
  *    (`:218-237`).
  */
object SnanaLoader {

  /** Attach SNID to PHOT rows via the HEAD row ranges. PHOT carries a
    * 1-indexed physical row number (`_rownum`); the range assignment is
    * an explode of HEAD ranges into (rownum → snid) — an equi-join, not
    * a range join, so it scales linearly and shuffles on the dense
    * rownum key. If PHOT already has SNID, this is skipped. */
  def assignSnid(head: DataFrame, phot: DataFrame): DataFrame =
    if (phot.columns.contains("SNID")) phot
    else {
      // guard inverted ranges: sequence(a, b) with a > b silently
      // generates a DESCENDING range, which would map the wrong rows
      // to this SNID instead of mapping none
      val ranges = head
        .filter(col("PTROBS_MIN") <= col("PTROBS_MAX"))
        .select(col("SNID"),
          explode(sequence(col("PTROBS_MIN"), col("PTROBS_MAX"))).as("_rownum"))
      phot.join(ranges, Seq("_rownum"))
    }

  /** Full load: returns the three silver-shaped tables. `zp` is the
    * SNANA zeropoint of FLUXCAL (27.5 for ELAsTiCC-style sims). */
  def load(head: DataFrame, phot: DataFrame, baseProcverId: String,
      photflagDetect: Int = 4096, zp: Double = 27.5,
      maxSourcesPerObject: Long = 100000L): Loaded = {

    val objects = head.select(
      col("SNID").cast("long").as("diaobjectid"),
      lit(baseProcverId).as("base_procver_id"),
      col("RA").cast("double").as("ra"),
      col("DEC").cast("double").as("dec"))

    val p = assignSnid(head.select("SNID", "PTROBS_MIN", "PTROBS_MAX"), phot)
      .withColumn("diaobjectid", col("SNID").cast("long"))
      .withColumn("band", trim(col("BAND")))
      .withColumn("midpointmjdtai", col("MJD").cast("double"))
      .withColumn("visit", Funcs.visitOf(col("MJD")))
      .withColumn("psfflux",
        Funcs.snanaZpRescale(col("FLUXCAL"), lit(zp)).cast("float"))
      .withColumn("psffluxerr",
        Funcs.snanaZpRescale(col("FLUXCALERR"), lit(zp)).cast("float"))

    // per-object observation sequence for synthesized ids (`:210-211`).
    // The full photometric tuple is in the sort so the id assignment is
    // total-ordered even when an input carries duplicate epochs; rows
    // identical under the whole tuple are interchangeable.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("diaobjectid")
      .orderBy("midpointmjdtai", "visit", "band", "psfflux", "psffluxerr", "PHOTFLAG")
    val seqd = p.withColumn("_seq", row_number().over(w).cast("long") - 1)
      // id-space guard: _seq beyond the per-object budget would collide
      // with the NEXT object's id range and silently corrupt the
      // (diasourceid, base_procver_id) PK — fail loudly on the row
      // instead (raise_error costs nothing until it fires)
      .withColumn("_srcid",
        when(col("_seq") >= maxSourcesPerObject,
          raise_error(concat(lit("SNANA object "), col("diaobjectid").cast("string"),
            lit(s" exceeds maxSourcesPerObject=$maxSourcesPerObject observations"))))
          .otherwise(col("diaobjectid") * maxSourcesPerObject + col("_seq")))

    val joined = seqd.join(
      head.select(col("SNID").cast("long").as("diaobjectid"),
        col("RA").cast("double").as("ra"), col("DEC").cast("double").as("dec")),
      Seq("diaobjectid"))

    val forced = joined.select(
      col("_srcid").as("diaforcedsourceid"),
      lit(baseProcverId).as("base_procver_id"),
      col("diaobjectid"), col("visit"), col("band"),
      col("midpointmjdtai"), col("psfflux"), col("psffluxerr"),
      col("ra"), col("dec"))

    val detected = joined
      .filter((col("PHOTFLAG").bitwiseAND(lit(photflagDetect))) =!= 0)
      .select(
        col("_srcid").as("diasourceid"),
        lit(baseProcverId).as("base_procver_id"),
        col("diaobjectid"), col("visit"), col("band"),
        col("midpointmjdtai"), col("psfflux"), col("psffluxerr"),
        col("ra"), col("dec"),
        lit(null).cast("float").as("raerr"),
        lit(null).cast("float").as("decerr"),
        lit(null).cast("float").as("ra_dec_cov"))

    Loaded(objects, detected, forced)
  }
}
