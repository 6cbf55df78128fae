package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.greatCircleDeg

/** Spatial cone search / crossmatch without q3c.
  *
  * The reference leans on Postgres q3c functional indexes
  * (q3c_ang2ipix / q3c_radial_query — SURVEY.md §1.5, §2.3 J6). The
  * Spark-native equivalent is the *zones* algorithm (Gray, Nieto-
  * Santisteban & Szalay 2007, "The Zones Algorithm for Finding
  * Points-Near-a-Point or Cross-Matching Spatial Datasets"): bucket by
  * declination zone, equi-join on zone id (one side exploded to its
  * neighbor zones), prefilter by a ra/dec bounding box, then apply the
  * exact haversine predicate. The zone equi-join shuffles both sides on
  * a dense integer key — co-located, skew-free, and AQE-splittable at
  * 100 TB — and the exact filter runs inside whole-stage codegen.
  */
object Spatial {

  /** Dense integer zone id for a declination, given zone height in deg. */
  def zoneId(dec: Column, zoneHeightDeg: Double): Column =
    zoneId(dec, lit(zoneHeightDeg))

  /** Column-height variant — the single source of truth the SQL
    * surface's `zone_id` also resolves to, so the DataFrame cone join
    * and ad-hoc SQL can never zone differently. */
  def zoneId(dec: Column, zoneHeight: Column): Column =
    floor((dec + lit(90.0)) / zoneHeight).cast("int")

  /** Cone join: all (left, right) pairs within `radiusArcsec`.
    *
    * Column name collisions are the caller's problem to avoid; left and
    * right must expose distinct ra/dec column names (pass them in).
    * Returns left ⋈ right rows plus a `sep_arcsec` column.
    *
    * `zoneHeightDeg` defaults to the radius (≥ 1e-4 deg) so each point
    * matches at most its own and two neighbor zones.
    */
  def coneJoin(left: DataFrame, right: DataFrame,
      lRa: String, lDec: String, rRa: String, rDec: String,
      radiusArcsec: Double,
      zoneHeightDegOpt: Option[Double] = None): DataFrame = {
    val radiusDeg = radiusArcsec / 3600.0
    val h = zoneHeightDegOpt.getOrElse(math.max(radiusDeg, 1e-4))
    // the ±1-zone explode is only complete while a match can't span
    // more than one zone boundary
    require(h >= radiusDeg,
      s"zone height $h° must be >= radius $radiusDeg° or matches are missed")

    val lz = left.withColumn("_zone", zoneId(col(lDec), h))
    // Right rows are replicated into each zone they could match
    // (zone-1, zone, zone+1): explode keeps the join a pure equi-join.
    val rz = right.withColumn("_zbase", zoneId(col(rDec), h))
      .withColumn("_zone", explode(array(col("_zbase") - 1, col("_zbase"), col("_zbase") + 1)))
      .drop("_zbase")

    // RA bounding-box prefilter with wraparound (least of d, 360-d).
    // The true max RA separation within radius r at declination d is
    // 2*asin(sin(r/2)/cos d) — strictly wider than the naive r/cos d,
    // which drops genuine matches near the radius at high |dec|. Use
    // the exact bound, evaluated at the worst-case |dec|+r of the pair
    // (decOk already bounds the partner's dec), clamped to a full
    // bypass within one radius of the pole.
    val dRaRaw = abs(col(lRa) - col(rRa))
    val dRa = least(dRaRaw, lit(360.0) - dRaRaw)
    val worstDec = least(abs(col(lDec)) + lit(radiusDeg), lit(90.0))
    val cosDec = greatest(cos(radians(worstDec)), lit(1e-9))
    val sinHalfR = math.sin(math.toRadians(radiusDeg) / 2)
    val raBound = lit(2.0) * degrees(asin(least(lit(sinHalfR) / cosDec, lit(1.0))))
    val nearPole = abs(col(lDec)) >= lit(90.0 - radiusDeg)
    val raOk = (dRa <= raBound) || nearPole
    val decOk = abs(col(lDec) - col(rDec)) <= lit(radiusDeg)

    val sep = greatCircleDeg(col(lRa), col(lDec), col(rRa), col(rDec)) * 3600.0
    lz.join(rz, Seq("_zone"))
      .filter(decOk && raOk)
      .withColumn("sep_arcsec", sep)
      .filter(col("sep_arcsec") <= lit(radiusArcsec))
      .drop("_zone")
  }

  /** Cone *search*: rows of `df` within radius of a fixed point
    * (q3c_radial_query semantics, src/ltcv.py:1229-1260). A plain
    * filter — pushdown-friendly dec range first, then exact haversine. */
  def coneSearch(df: DataFrame, raCol: String, decCol: String,
      ra0: Double, dec0: Double, radiusArcsec: Double): DataFrame = {
    val radiusDeg = radiusArcsec / 3600.0
    df.filter(col(decCol) >= dec0 - radiusDeg && col(decCol) <= dec0 + radiusDeg)
      .filter(greatCircleDeg(col(raCol), col(decCol), lit(ra0), lit(dec0)) * 3600.0
        <= lit(radiusArcsec))
  }

  /** Root-object crossmatch (src/services/source_importer.py:101-104,
    * 430-462): for each new object pick the closest existing root within
    * `radiusArcsec` (ties broken by root id for determinism — the
    * reference has a TODO about multi-match ambiguity). Returns the new
    * objects with a nullable `rootid` column.
    *
    * `newObjs` must have (ra, dec) plus a unique `idCol`; `roots` is the
    * root_diaobject table (id, ra, dec).
    */
  def crossmatchRoots(newObjs: DataFrame, idCol: String, roots: DataFrame,
      radiusArcsec: Double = 1.0): DataFrame = {
    val r = roots.select(col("id").as("rootid"),
      col("ra").as("_root_ra"), col("dec").as("_root_dec"))
    val matches = coneJoin(newObjs, r, "ra", "dec", "_root_ra", "_root_dec", radiusArcsec)
      .groupBy(col(idCol))
      .agg(min_by(col("rootid"), struct(col("sep_arcsec"), col("rootid"))).as("rootid"))
    newObjs.join(matches, Seq(idCol), "left_outer")
  }
}
