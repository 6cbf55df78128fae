package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8) as codegen'd Column
  * expressions — no UDFs in the hot path.
  */
object Funcs {

  /** AB-magnitude zeropoint used throughout the reference
    * (src/ltcv.py:1590-1595, src/spectrum.py:270-277). */
  val MagZeropoint = 31.4

  /** F1: flux (nJy) → AB magnitude: mag = -2.5*log10(flux) + 31.4. */
  def flux2mag(flux: Column): Column =
    lit(-2.5) * log10(flux) + lit(MagZeropoint)

  /** F1 inverse: magnitude → flux (nJy). */
  def mag2flux(mag: Column): Column =
    pow(lit(10.0), (mag - lit(MagZeropoint)) / lit(-2.5))

  /** Scala-side mag2flux for fixture/expected-value computation. */
  def mag2flux(mag: Double): Double =
    math.pow(10.0, (mag - MagZeropoint) / -2.5)

  /** F2: SNANA zeropoint rescale — flux *= 10^((31.4 - zp)/2.5)
    * (src/admin/load_snana_fits.py:185-186). */
  def snanaZpRescale(flux: Column, zp: Column): Column =
    flux * pow(lit(10.0), (lit(MagZeropoint) - zp) / lit(2.5))

  /** F3: synthesize a visit id from MJD — visit = floor(mjd * 20000)
    * (src/admin/load_snana_fits.py:165-209; ~4.3 s resolution keeps the
    * id int32-safe through 2040 per the reference's rationale comment). */
  def visitOf(mjd: Column): Column = floor(mjd * lit(20000)).cast("long")

  /** F4: MJD → epoch seconds (mjd 40587 = 1970-01-01; src/util.py:303-324).
    * TAI↔UTC offset handling stays at the API edge, as in the reference. */
  def mjdToUnix(mjd: Column): Column = (mjd - lit(40587.0)) * lit(86400.0)

  def mjdToTimestamp(mjd: Column): Column =
    timestamp_seconds(mjdToUnix(mjd))

  def unixToMjd(unixSecs: Column): Column =
    unixSecs / lit(86400.0) + lit(40587.0)

  /** Microsecond-precision inverse of [[mjdToTimestamp]]:
    * `unix_timestamp` truncates to whole seconds, which loses the
    * sub-second part of every observation time round-trip; derive from
    * the timestamp's internal microsecond count instead. */
  def timestampToMjd(ts: Column): Column =
    unixToMjd(unix_micros(ts).cast("double") / lit(1e6))

  /** F6: sexagesimal "±d:m:s" / "h:m:s" → degrees (src/util.py:326-374).
    * API-edge only; plain Scala, not a UDF. */
  def parseSexagesimal(s: String, hours: Boolean = false): Double = {
    val t = s.trim
    val neg = t.startsWith("-")
    val parts = t.stripPrefix("-").stripPrefix("+").split("[:\\s]+")
    require(parts.length == 3, s"not sexagesimal: '$s'")
    val d = parts(0).toDouble + parts(1).toDouble / 60.0 + parts(2).toDouble / 3600.0
    val signed = if (neg) -d else d
    if (hours) signed * 15.0 else signed
  }

  /** F8: pack boolean columns into an int bitfield — OR of per-bit masks
    * (src/services/brokerconsumer.py:453-461; maps src/db.py:1793-1837). */
  def packBits(bits: Seq[(Column, Int)]): Column =
    bits.map { case (b, bit) =>
      when(b, lit(1 << bit)).otherwise(lit(0))
    }.reduce(_.bitwiseOR(_))

  /** P6: test a packed bitfield against a mask. */
  def hasAnyBit(field: Column, mask: Int): Column =
    field.bitwiseAND(lit(mask)) =!= 0

  /** F13: great-circle separation in degrees (haversine). Replaces the
    * reference's q3c_dist; all codegen'd column math. */
  def greatCircleDeg(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column = {
    val dRa = radians(ra2 - ra1) / 2
    val dDec = radians(dec2 - dec1) / 2
    val a = pow(sin(dDec), 2) +
      cos(radians(dec1)) * cos(radians(dec2)) * pow(sin(dRa), 2)
    degrees(lit(2) * asin(sqrt(a)))
  }

  /** F14: spectrum-request id munging — "{rootid} ; {requester}"
    * (src/webserver/spectrumapp.py:59). */
  def wantspecId(rootid: Column, requester: Column): Column =
    concat_ws(" ; ", rootid, requester)

  /** F15: clamp priority to [0, 5] (src/webserver/spectrumapp.py:61-63). */
  def clampPriority(p: Column): Column = least(greatest(p, lit(0)), lit(5))
}
