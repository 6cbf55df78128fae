package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ingest.{Dp1Loader, Loaded, SnanaLoader}
import graft.merge.SourceImporter
import graft.query.Ltcv
import graft.spatial.Spatial

/** FASTDB operator semantics (SURVEY.md §2) driven through the real
  * engine code paths — [[graft.query.Ltcv]] / [[graft.spatial.Spatial]]
  * — on FASTDB-shaped frames derived deterministically from the
  * driver's testdata tables, so the DuckDB oracle gate hash-checks the
  * actual operators, not reimplementations.
  *
  * Derivations use integer arithmetic (mod/concat) so both engines
  * produce bit-identical inputs; floating outputs are rounded where a
  * sum's accumulation order could differ between engines.
  */
object FastdbOps {

  /** lineitem → diasource-shaped frame: multiple base procvers per
    * (rootid, visit) key so the priority dedup has real work. */
  private[queries] def liSources(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("diasourceid"),
      concat(lit("bpv"), (col("l_suppkey") % 3).cast("string")).as("base_procver_id"),
      (col("l_orderkey") % 1000).cast("string").as("rootid"),
      (col("l_partkey") % 100).as("visit"),
      col("l_returnflag").as("band"),
      col("l_extendedprice").as("midpointmjdtai"),
      (col("l_extendedprice") / 10).as("psfflux"),
      col("l_quantity").as("psffluxerr"),
      (col("l_partkey") * 1e-4).as("ra"),
      (col("l_suppkey") * 1e-4).as("dec"))

  private[queries] val liSourcesSql =
    """SELECT l_orderkey*10 + l_linenumber AS diasourceid,
      |  'bpv' || CAST(l_suppkey % 3 AS VARCHAR) AS base_procver_id,
      |  CAST(l_orderkey % 1000 AS VARCHAR) AS rootid,
      |  l_partkey % 100 AS visit,
      |  l_returnflag AS band,
      |  l_extendedprice AS midpointmjdtai,
      |  l_extendedprice / 10 AS psfflux,
      |  l_quantity AS psffluxerr,
      |  l_partkey * 1e-4 AS ra,
      |  l_suppkey * 1e-4 AS dec
      |FROM lineitem""".stripMargin

  private[queries] def bpvPriorities(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("bpv0", 0), ("bpv1", 1), ("bpv2", 2))
      .toDF("base_procver_id", "priority")
  }

  // ---- A1: priority dedup (the signature operator) -----------------

  /** The synthetic lineitem has duplicate (orderkey, linenumber) pairs,
    * so the derived diasourceid alone is not unique — extend the
    * tiebreak over the payload to keep the winner total-ordered.
    *
    * Columns the output doesn't use (ra/dec) are dropped BEFORE the
    * dedup: `max_by(struct(payload), struct(ordering))` carries a
    * struct-typed aggregation buffer, which HashAggregate cannot hold
    * (UnsafeRow-mutable fields only) — the plan falls back to
    * SortAggregate, and Catalyst's nested-column pruning does not
    * reach through aggregate buffers, so every payload column rides
    * the map-side sort. Pruning by hand is the only pruning this
    * shape gets (~10% here; proportionally more the wider the row). */
  def a1PriorityDedup(s: SparkSession, d: String): DataFrame =
    Ltcv.priorityDedup(liSources(s, d).drop("ra", "dec"), bpvPriorities(s),
        keys = Seq("rootid", "visit"),
        tiebreaks = Seq("diasourceid", "midpointmjdtai", "psffluxerr", "band"))
      .select(col("rootid"), col("visit"), col("diasourceid"),
        col("base_procver_id"), round(col("psfflux"), 4).as("psfflux"))
      .orderBy("rootid", "visit")

  val a1Sql: String =
    s"""WITH src AS ($liSourcesSql)
       |SELECT rootid, visit, diasourceid, base_procver_id,
       |  ROUND(psfflux, 4) AS psfflux
       |FROM (SELECT *,
       |        CAST(SUBSTR(base_procver_id, 4) AS INT) AS priority,
       |        ROW_NUMBER() OVER (PARTITION BY rootid, visit
       |          ORDER BY CAST(SUBSTR(base_procver_id, 4) AS INT) DESC,
       |                   diasourceid DESC, midpointmjdtai DESC,
       |                   psffluxerr DESC, band DESC) AS rn
       |      FROM src)
       |WHERE rn = 1
       |ORDER BY rootid, visit""".stripMargin

  // ---- J2: forced ⟗ detections patch join --------------------------

  /** forced := even orders; detections := first lineitem of orders with
    * l_partkey % 3 = 0 — gives all three patch categories. */
  def j2PatchJoin(s: SparkSession, d: String): DataFrame = {
    val f = orders(s, d).filter(col("o_orderkey") % 2 === 0).select(
      col("o_orderkey").cast("string").as("rootid"),
      (col("o_orderkey") % 7).as("visit"),
      col("o_orderstatus").as("band"),
      col("o_totalprice").as("midpointmjdtai"),
      col("o_totalprice").as("psfflux"),
      (col("o_totalprice") / 100).as("psffluxerr"),
      col("o_custkey").as("diaobjectid"))
    val src = lineitem(s, d)
      .filter(col("l_linenumber") === 1 && col("l_partkey") % 3 === 0).select(
        col("l_orderkey").cast("string").as("rootid"),
        (col("l_orderkey") % 7).as("visit"),
        col("l_returnflag").as("band"),
        col("l_extendedprice").as("midpointmjdtai"),
        col("l_extendedprice").as("psfflux"),
        col("l_quantity").as("psffluxerr"),
        col("l_partkey").as("diaobjectid"))
    Ltcv.patchJoin(f, src)
      .select(col("rootid"), col("visit"), col("band"),
        round(col("midpointmjdtai"), 4).as("midpointmjdtai"),
        round(col("psfflux"), 4).as("psfflux"),
        round(col("psffluxerr"), 4).as("psffluxerr"),
        col("diaobjectid"), round(col("detflux"), 4).as("detflux"),
        col("isdet"), col("ispatch"))
      .orderBy("rootid", "visit")
  }

  val j2Sql: String =
    """WITH f AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS rootid, o_orderkey % 7 AS visit,
      |    o_orderstatus AS band, o_totalprice AS midpointmjdtai,
      |    o_totalprice AS psfflux, o_totalprice / 100 AS psffluxerr,
      |    o_custkey AS diaobjectid
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |s AS (
      |  SELECT CAST(l_orderkey AS VARCHAR) AS rootid, l_orderkey % 7 AS visit,
      |    l_returnflag AS band, l_extendedprice AS midpointmjdtai,
      |    l_extendedprice AS psfflux, l_quantity AS psffluxerr,
      |    l_partkey AS diaobjectid
      |  FROM lineitem WHERE l_linenumber = 1 AND l_partkey % 3 = 0)
      |SELECT COALESCE(f.rootid, s.rootid) AS rootid,
      |  COALESCE(f.visit, s.visit) AS visit,
      |  COALESCE(f.band, s.band) AS band,
      |  ROUND(COALESCE(f.midpointmjdtai, s.midpointmjdtai), 4) AS midpointmjdtai,
      |  ROUND(COALESCE(f.psfflux, s.psfflux), 4) AS psfflux,
      |  ROUND(COALESCE(f.psffluxerr, s.psffluxerr), 4) AS psffluxerr,
      |  COALESCE(f.diaobjectid, s.diaobjectid) AS diaobjectid,
      |  ROUND(s.psfflux, 4) AS detflux,
      |  s.band IS NOT NULL AS isdet,
      |  (s.band IS NOT NULL AND f.band IS NULL) AS ispatch
      |FROM f FULL OUTER JOIN s ON f.rootid = s.rootid AND f.visit = s.visit
      |ORDER BY rootid, visit""".stripMargin

  // ---- A2/A3: objstats single-pass aggregation ----------------------

  def a2ObjStats(s: SparkSession, d: String): DataFrame =
    Ltcv.objStats(liSources(s, d)
        .withColumn("rootid", (col("diasourceid") % 300).cast("string")))
      .select(col("rootid"), col("band"), col("ndets"),
        col("firstdetmjd"), round(col("firstdetflux"), 4).as("firstdetflux"),
        col("lastdetmjd"), round(col("lastdetflux"), 4).as("lastdetflux"),
        col("maxdetmjd"), round(col("maxdetflux"), 4).as("maxdetflux"),
        col("ndets24"), col("ndets23"), col("ndets22"), col("ndets21"),
        col("nsn10"), col("nsn7"), col("nsn5"))
      .orderBy("rootid", "band")

  val a2Sql: String =
    s"""WITH src0 AS ($liSourcesSql),
       |src AS (SELECT * REPLACE (CAST(diasourceid % 300 AS VARCHAR) AS rootid) FROM src0),
       |agg AS (
       |  SELECT rootid, band, COUNT(*) AS ndets,
       |    CAST(SUM(CASE WHEN psfflux >= POWER(10, (24 - 31.4) / -2.5) THEN 1 ELSE 0 END) AS BIGINT) AS ndets24,
       |    CAST(SUM(CASE WHEN psfflux >= POWER(10, (23 - 31.4) / -2.5) THEN 1 ELSE 0 END) AS BIGINT) AS ndets23,
       |    CAST(SUM(CASE WHEN psfflux >= POWER(10, (22 - 31.4) / -2.5) THEN 1 ELSE 0 END) AS BIGINT) AS ndets22,
       |    CAST(SUM(CASE WHEN psfflux >= POWER(10, (21 - 31.4) / -2.5) THEN 1 ELSE 0 END) AS BIGINT) AS ndets21,
       |    CAST(SUM(CASE WHEN psfflux / psffluxerr >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS nsn10,
       |    CAST(SUM(CASE WHEN psfflux / psffluxerr >= 7 THEN 1 ELSE 0 END) AS BIGINT) AS nsn7,
       |    CAST(SUM(CASE WHEN psfflux / psffluxerr >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS nsn5
       |  FROM src GROUP BY rootid, band),
       |ranked AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY rootid, band ORDER BY midpointmjdtai, diasourceid) AS rn_first,
       |    ROW_NUMBER() OVER (PARTITION BY rootid, band ORDER BY midpointmjdtai DESC, diasourceid DESC) AS rn_last,
       |    ROW_NUMBER() OVER (PARTITION BY rootid, band ORDER BY psfflux DESC, diasourceid DESC) AS rn_max
       |  FROM src)
       |SELECT agg.rootid, agg.band, agg.ndets,
       |  fst.midpointmjdtai AS firstdetmjd, ROUND(fst.psfflux, 4) AS firstdetflux,
       |  lst.midpointmjdtai AS lastdetmjd, ROUND(lst.psfflux, 4) AS lastdetflux,
       |  mx.midpointmjdtai AS maxdetmjd, ROUND(mx.psfflux, 4) AS maxdetflux,
       |  agg.ndets24, agg.ndets23, agg.ndets22, agg.ndets21,
       |  agg.nsn10, agg.nsn7, agg.nsn5
       |FROM agg
       |JOIN (SELECT * FROM ranked WHERE rn_first = 1) fst USING (rootid, band)
       |JOIN (SELECT * FROM ranked WHERE rn_last = 1) lst USING (rootid, band)
       |JOIN (SELECT * FROM ranked WHERE rn_max = 1) mx USING (rootid, band)
       |ORDER BY rootid, band""".stripMargin

  // ---- A13 (beyond ref): light-curve feature extraction -------------

  /** Per-(root, band) classifier features over a photometry projection
    * whose TIME axis is independent of flux (liSources maps flux =
    * mjd/10 exactly, which would degenerate every slope to 0.1): mjd
    * rides on l_partkey, flux on l_extendedprice. Centered two-pass
    * moments replay bit-stably → fully oracled at 4 dp. */
  private def a13Sources(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      (col("l_orderkey") % 300).cast("string").as("rootid"),
      col("l_returnflag").as("band"),
      (lit(60000.0) + (col("l_partkey") % 1000) * 0.1).as("midpointmjdtai"),
      (col("l_extendedprice") / 10).as("psfflux"),
      col("l_quantity").cast("double").as("psffluxerr"))

  private val a13SourcesSql =
    """SELECT CAST(l_orderkey % 300 AS VARCHAR) AS rootid,
      |  l_returnflag AS band,
      |  60000.0 + (l_partkey % 1000) * 0.1 AS midpointmjdtai,
      |  l_extendedprice / 10 AS psfflux,
      |  CAST(l_quantity AS DOUBLE) AS psffluxerr
      |FROM lineitem""".stripMargin

  def a13LtcvFeatures(s: SparkSession, d: String): DataFrame =
    Ltcv.lightcurveFeatures(a13Sources(s, d))
      // the rounded slope can sit at a tiny negative — pin the sign of
      // zero on both engines (graft.queries.Num.rnd0 rule)
      .withColumn("trend_slope", col("trend_slope") + lit(0.0))
      .orderBy("rootid", "band")

  val a13Sql: String =
    s"""WITH src AS ($a13SourcesSql),
       |m AS (
       |  SELECT rootid, band, COUNT(*) AS ndets,
       |    AVG(midpointmjdtai) AS tbar, AVG(psfflux) AS fbar,
       |    SUM(psfflux) AS fsum,
       |    MAX(psfflux) AS fmax, MIN(psfflux) AS fmin,
       |    MAX(midpointmjdtai) AS tmax, MIN(midpointmjdtai) AS tmin
       |  FROM src GROUP BY rootid, band),
       |cen AS (
       |  SELECT s.rootid, s.band,
       |    SUM((s.midpointmjdtai - m.tbar) * (s.psfflux - m.fbar)) AS stf,
       |    SUM((s.midpointmjdtai - m.tbar) * (s.midpointmjdtai - m.tbar)) AS stt,
       |    SUM((s.psfflux - m.fbar) * (s.psfflux - m.fbar)) AS sff
       |  FROM src s JOIN m USING (rootid, band)
       |  GROUP BY s.rootid, s.band)
       |SELECT m.rootid, m.band, m.ndets,
       |  ROUND(m.fmax - m.fmin, 4) AS amplitude,
       |  ROUND(m.tmax - m.tmin, 4) AS mjd_span,
       |  ROUND(m.fsum, 3) AS flux_sum,
       |  ROUND(sqrt(cen.sff / m.ndets), 4) AS flux_std,
       |  ROUND(CASE WHEN cen.stt > 0 THEN cen.stf / cen.stt ELSE 0.0 END, 4)
       |    + 0.0 AS trend_slope
       |FROM m JOIN cen USING (rootid, band)
       |ORDER BY m.rootid, m.band""".stripMargin

  // ---- W5 (beyond ref): binned light curves --------------------------

  /** Time-binned light-curve resampling — the downsampled curve a
    * plotting/feature API serves instead of raw epochs: per (root,
    * band, time-bin) detection count, flux sum, and peak. The bin is
    * an exact integer floor of mjd/width; bin boundaries fall on exact
    * decimal mjds, whose doubles divide to exact integers on any
    * engine, so assignment never straddles a 1-ulp disagreement. Flux
    * emits as SUM at the inputs' own decimal precision (the a13
    * rounding-tie rule: means of finite decimals tie at the rounding
    * digit; sums cannot). One partial-aggregated groupBy — no window,
    * no per-curve collect. */
  def w5BinnedLtcv(s: SparkSession, d: String): DataFrame =
    liSources(s, d)
      .withColumn("bin", floor(col("midpointmjdtai") / 1000.0).cast("long"))
      .groupBy("rootid", "band", "bin")
      .agg(count(lit(1)).as("ndets"),
        round(sum(col("psfflux")), 3).as("flux_sum"),
        round(max(col("psfflux")), 4).as("peak_flux"))
      .orderBy("rootid", "band", "bin")

  val w5Sql: String =
    s"""WITH src AS ($liSourcesSql)
       |SELECT rootid, band,
       |  CAST(FLOOR(midpointmjdtai / 1000.0) AS BIGINT) AS bin,
       |  COUNT(*) AS ndets,
       |  ROUND(SUM(psfflux), 3) AS flux_sum,
       |  ROUND(MAX(psfflux), 4) AS peak_flux
       |FROM src GROUP BY rootid, band, bin
       |ORDER BY rootid, band, bin""".stripMargin

  // ---- W6 (beyond ref): trailing-range rolling statistics ------------

  /** Trailing rolling-window statistics per light curve — the
    * "activity in the last N days" view an alert-triage API serves
    * (recent detection count, recent flux sum, recent peak): a RANGE
    * window of 500 mjd trailing each detection within its (root,
    * band) curve. The order key is integer centi-mjd — the 2-dp mjd
    * scaled by 100 through `floor(x·100 + ½)`, identical doubles →
    * identical integers on both engines — because a value-based RANGE
    * frame needs an integer axis to mean the same thing everywhere
    * (and Spark requires the boundary literal to match the order-key
    * type). Count/max are order-free; the flux sum emits at the
    * inputs' own decimal precision (the a13/w5 rule — sums of finite
    * decimals cannot tie at the rounding digit).
    *
    * Scale shape: one window over (rootid, band) partitions — millions
    * of small curves, no global sort, no skew; RANGE frames include
    * order-key peers by definition in both engines, so duplicate-mjd
    * detections agree. */
  def w6RollingLtcv(s: SparkSession, d: String): DataFrame = {
    val src = liSources(s, d)
      .withColumn("mjd_c", floor(col("midpointmjdtai") * 100 + 0.5).cast("long"))
    Ltcv.rollingTrailing(src, Seq("rootid", "band"), "mjd_c", "psfflux",
        trail = 50000L)
      .select(col("rootid"), col("band"), col("mjd_c"), col("diasourceid"),
        col("n_trail"),
        round(col("flux_trail_raw"), 3).as("flux_trail"),
        round(col("peak_trail_raw"), 4).as("peak_trail"))
      .orderBy("rootid", "band", "mjd_c", "diasourceid")
  }

  val w6Sql: String =
    s"""WITH src AS ($liSourcesSql),
       |s2 AS (SELECT *,
       |         CAST(FLOOR(midpointmjdtai * 100 + 0.5) AS BIGINT) AS mjd_c
       |       FROM src)
       |SELECT rootid, band, mjd_c, diasourceid,
       |  COUNT(*) OVER w AS n_trail,
       |  ROUND(SUM(psfflux) OVER w, 3) AS flux_trail,
       |  ROUND(MAX(psfflux) OVER w, 4) AS peak_trail
       |FROM s2
       |WINDOW w AS (PARTITION BY rootid, band ORDER BY mjd_c
       |             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
       |ORDER BY rootid, band, mjd_c, diasourceid""".stripMargin

  // ---- A14 (beyond ref): phase-folded dispersion ----------------------

  /** Phase-dispersion summary at a fixed trial period — the PDM-style
    * statistic a periodicity search evaluates per (curve, period):
    * fold every detection to phase = mjd mod P (P = 25), bin the phase
    * into 10 equal cells, and report occupied-bin count plus the sum
    * of per-bin flux spreads (max − min; a periodic signal folded at
    * the right period concentrates flux per phase cell → small
    * dispersion). mod/floor arithmetic on identical doubles is
    * engine-deterministic, spreads are order-free, and the spread sum
    * emits at the inputs' own decimal precision (the w5 sum rule) →
    * fully oracled. One two-level partial-aggregated groupBy — no
    * window, no per-curve collect; a real search runs this shape once
    * per trial period. */
  def a14PhaseFold(s: SparkSession, d: String): DataFrame = {
    val p = 25.0
    liSources(s, d)
      .withColumn("phase",
        col("midpointmjdtai") - floor(col("midpointmjdtai") / p) * p)
      .withColumn("pbin", floor(col("phase") / 2.5).cast("long"))
      .groupBy("rootid", "band", "pbin")
      .agg(count(lit(1)).as("_n"),
        (max(col("psfflux")) - min(col("psfflux"))).as("_spread"))
      .groupBy("rootid", "band")
      .agg(count(lit(1)).as("n_occupied_bins"),
        sum(col("_n")).as("ndets"),
        round(sum(col("_spread")), 3).as("dispersion"))
      .orderBy("rootid", "band")
  }

  val a14Sql: String =
    s"""WITH src AS ($liSourcesSql),
       |ph AS (SELECT rootid, band, psfflux,
       |         midpointmjdtai - FLOOR(midpointmjdtai / 25.0) * 25.0 AS phase
       |       FROM src),
       |pb AS (SELECT rootid, band,
       |         CAST(FLOOR(phase / 2.5) AS BIGINT) AS pbin, psfflux FROM ph),
       |agg AS (SELECT rootid, band, pbin, COUNT(*) AS n,
       |          MAX(psfflux) - MIN(psfflux) AS spread
       |        FROM pb GROUP BY 1, 2, 3)
       |SELECT rootid, band, COUNT(*) AS n_occupied_bins,
       |  CAST(SUM(n) AS BIGINT) AS ndets,
       |  ROUND(SUM(spread), 3) AS dispersion
       |FROM agg GROUP BY rootid, band
       |ORDER BY rootid, band""".stripMargin

  // ---- A15 (beyond ref): cadence statistics ---------------------------

  /** Observing-cadence summary per light curve: inter-detection gaps
    * on the integer centi-mjd axis (lag window ordered by (mjd_c,
    * sourceid) — ties gap to 0 deterministically since the lagged
    * value is the order key itself), rolled up to max/min gap and the
    * summed span. The survey-planning/alert-triage companion to a2's
    * flux stats: a curve with a 90-day max gap needs different
    * detrending than a nightly one. Single-detection curves report
    * null gaps (no evidence), as both engines agree aggregates over
    * empty sets do. */
  def a15Cadence(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = liSources(s, d)
      .withColumn("mjd_c", floor(col("midpointmjdtai") * 100 + 0.5).cast("long"))
    val w = Window.partitionBy("rootid", "band").orderBy("mjd_c", "diasourceid")
    src.withColumn("gap", col("mjd_c") - lag("mjd_c", 1).over(w))
      .groupBy("rootid", "band")
      .agg(count(lit(1)).as("ndets"),
        max(col("gap")).as("max_gap_c"),
        min(col("gap")).as("min_gap_c"),
        sum(col("gap")).as("span_c"))
      .orderBy("rootid", "band")
  }

  val a15Sql: String =
    s"""WITH src AS ($liSourcesSql),
       |s2 AS (SELECT *,
       |         CAST(FLOOR(midpointmjdtai * 100 + 0.5) AS BIGINT) AS mjd_c
       |       FROM src),
       |g AS (SELECT rootid, band,
       |        mjd_c - LAG(mjd_c) OVER (PARTITION BY rootid, band
       |          ORDER BY mjd_c, diasourceid) AS gap
       |      FROM s2)
       |SELECT rootid, band, COUNT(*) AS ndets,
       |  MAX(gap) AS max_gap_c, MIN(gap) AS min_gap_c,
       |  CAST(SUM(gap) AS BIGINT) AS span_c
       |FROM g GROUP BY rootid, band
       |ORDER BY rootid, band""".stripMargin

  // ---- A16 (beyond ref): structure function ---------------------------

  /** First-order structure function per light curve — the AGN/variable
    * variability statistic: |Δflux| of detection pairs binned by time
    * lag, here 10 bins of 2 days covering lags up to 20 days on the
    * integer centi-mjd axis. Reported as pair count + the summed
    * |Δflux| per (curve, band, lag bin); SF(τ) = sum/n at the
    * consumption site (the a13 sum rule — a MEAN can land on the
    * rounding-digit half where engines' rounding modes disagree).
    *
    * Scale shape: the naive per-curve pair join is quadratic in curve
    * length; bounding the lag makes it linear in detections × bucket
    * occupancy via the j7 bucket trick — probe rows explode to their
    * own and the previous 2000-centi-mjd bucket, the build side keys
    * by its own bucket, so every lag-≤-2000 pair is found exactly once
    * and the equi key (rootid, band, bucket) carries the whole join.
    * Pairs are oriented (m_a, id_a) < (m_b, id_b) lexicographically, so
    * equal-epoch detections pair once, lag 0. */
  def a16StructureFunc(s: SparkSession, d: String): DataFrame = {
    val src = liSources(s, d)
      .withColumn("mjd_c", floor(col("midpointmjdtai") * 100 + 0.5).cast("long"))
      .select(col("rootid"), col("band"), col("mjd_c"), col("psfflux"),
        col("diasourceid"))
    val a = src.select(col("rootid"), col("band"),
        col("mjd_c").as("m_a"), col("psfflux").as("f_a"),
        col("diasourceid").as("id_a"))
      .withColumn("_bkt", explode(array(
        expr("m_a div 2000"), expr("m_a div 2000") + 1)))
    val b = src.select(col("rootid"), col("band"),
        col("mjd_c").as("m_b"), col("psfflux").as("f_b"),
        col("diasourceid").as("id_b"))
      .withColumn("_bkt", expr("m_b div 2000"))
    a.join(b, Seq("rootid", "band", "_bkt"))
      .filter(col("m_b") - col("m_a") <= 2000L &&
        (col("m_a") < col("m_b") ||
          (col("m_a") === col("m_b") && col("id_a") < col("id_b"))))
      .withColumn("lag_bin", expr("(m_b - m_a) div 200"))
      .groupBy("rootid", "band", "lag_bin")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(abs(col("f_b") - col("f_a"))), 3).as("sf_sum"))
      .orderBy("rootid", "band", "lag_bin")
  }

  val a16Sql: String =
    s"""WITH src AS ($liSourcesSql),
       |s2 AS (SELECT rootid, band, psfflux, diasourceid,
       |         CAST(FLOOR(midpointmjdtai * 100 + 0.5) AS BIGINT) AS mjd_c
       |       FROM src)
       |SELECT a.rootid, a.band,
       |  (b.mjd_c - a.mjd_c) // 200 AS lag_bin,
       |  COUNT(*) AS n_pairs,
       |  ROUND(SUM(ABS(b.psfflux - a.psfflux)), 3) AS sf_sum
       |FROM s2 a JOIN s2 b
       |  ON a.rootid = b.rootid AND a.band = b.band
       | AND b.mjd_c - a.mjd_c BETWEEN 0 AND 2000
       | AND (a.mjd_c < b.mjd_c
       |      OR (a.mjd_c = b.mjd_c AND a.diasourceid < b.diasourceid))
       |GROUP BY 1, 2, 3
       |ORDER BY a.rootid, a.band, lag_bin""".stripMargin

  // ---- A17 (beyond ref): periodogram ----------------------------------

  /** Classical (Schuster) periodogram per light curve at a fixed trial
    * period grid — the frequency-domain periodicity search next to
    * a14's phase-dispersion statistic: for each (curve, band, period)
    * the flux's spectral amplitude Σy·cos(ωt), Σy·sin(ωt) with
    * y = flux − per-curve mean and ω = 2π/P, plus the normalized
    * power (Sc² + Ss²)/n. Portability discipline: the centering mean
    * is deliberately UNROUNDED — engines' sum orders differ only
    * smoothly (~1e−13), while rounding a mean of finite-decimal
    * inputs creates exact .xxxx5 halves where HALF_UP and banker's
    * rounding cliff apart (the a13 lesson, re-confirmed live on this
    * query's first formulation); the two spectral sums round at 3 dp
    * (~7 digits of margin over accumulated mean/libm-ulp noise), and
    * the power is computed FROM the rounded sums — exact arithmetic
    * on identical inputs. Scale shape: the period grid is a 5-element
    * exploded in the scan stage (no join), then one partial-aggregated
    * groupBy at curve × period cardinality. */
  def a17Periodogram(s: SparkSession, d: String): DataFrame = {
    val periods = Seq(5.0, 10.0, 15.0, 20.0, 25.0)
    val src = liSources(s, d)
      .select(col("rootid"), col("band"), col("midpointmjdtai").as("t"),
        col("psfflux"))
    val means = src.groupBy("rootid", "band")
      .agg(avg(col("psfflux")).as("_mean"))
    val w = (lit(2 * math.Pi) / col("p")) * col("t")
    src.join(means, Seq("rootid", "band"))
      .withColumn("y", col("psfflux") - col("_mean"))
      .withColumn("p", explode(array(periods.map(lit): _*)))
      .groupBy("rootid", "band", "p")
      .agg(count(lit(1)).as("n"),
        (round(sum(col("y") * cos(w)), 3) + lit(0.0)).as("sc_r"),
        (round(sum(col("y") * sin(w)), 3) + lit(0.0)).as("ss_r"))
      .withColumn("power_r",
        round((col("sc_r") * col("sc_r") + col("ss_r") * col("ss_r")) /
          col("n"), 3))
      .orderBy("rootid", "band", "p")
  }

  val a17Sql: String =
    s"""WITH src AS ($liSourcesSql),
       |m AS (SELECT rootid, band, AVG(psfflux) AS mn
       |      FROM src GROUP BY 1, 2),
       |y AS (SELECT s.rootid, s.band, s.midpointmjdtai AS t,
       |        s.psfflux - m.mn AS y
       |      FROM src s JOIN m USING (rootid, band)),
       |f AS (SELECT CAST(unnest([5.0, 10.0, 15.0, 20.0, 25.0]) AS DOUBLE)
       |        AS p),
       |g AS (SELECT rootid, band, p, COUNT(*) AS n,
       |        ROUND(SUM(y * cos(2 * pi() / p * t)), 3) + 0.0 AS sc_r,
       |        ROUND(SUM(y * sin(2 * pi() / p * t)), 3) + 0.0 AS ss_r
       |      FROM y CROSS JOIN f GROUP BY 1, 2, 3)
       |SELECT rootid, band, p, CAST(n AS BIGINT) AS n, sc_r, ss_r,
       |  ROUND((sc_r * sc_r + ss_r * ss_r) / n, 3) AS power_r
       |FROM g ORDER BY rootid, band, p""".stripMargin

  // ---- A18 (beyond ref): von Neumann variability index ----------------

  /** Von Neumann η per light curve — the time-ordered variability
    * statistic survey pipelines cut on (η ≪ 2 ⇒ correlated trend,
    * η ≈ 2 ⇒ white noise): the ratio of the mean squared successive
    * flux difference to the flux variance. Reported as the two sums
    * plus η computed FROM the rounded sums (the a13/a17 rule: the
    * centering mean stays unrounded — engines' sum orders differ only
    * smoothly — while each accumulated SUM rounds at 3 dp, orders of
    * magnitude above float noise on these ≤ ~dozen-row groups).
    * Successive = (mjd_c, diasourceid) lexicographic order, the a15
    * cadence ordering, so ties are deterministic in both engines.
    * Single-detection curves report nulls (no evidence), as both
    * engines agree aggregates over empty sets do. Scale shape: one
    * per-curve lag window + one partial-aggregated groupBy — no
    * self-join, nothing quadratic in curve length. */
  def a18EtaVariability(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = liSources(s, d)
      .withColumn("mjd_c", floor(col("midpointmjdtai") * 100 + 0.5).cast("long"))
      .select(col("rootid"), col("band"), col("mjd_c"), col("diasourceid"),
        col("psfflux"))
    val w = Window.partitionBy("rootid", "band").orderBy("mjd_c", "diasourceid")
    val means = src.groupBy("rootid", "band").agg(avg(col("psfflux")).as("_mean"))
    val diffed = src
      .withColumn("_d", col("psfflux") - lag("psfflux", 1).over(w))
      .join(means, Seq("rootid", "band"))
    diffed
      .groupBy("rootid", "band")
      .agg(count(lit(1)).as("ndets"),
        round(sum(col("_d") * col("_d")), 3).as("sq_diff_sum"),
        round(sum((col("psfflux") - col("_mean")) *
          (col("psfflux") - col("_mean"))), 3).as("sq_dev_sum"))
      .withColumn("eta",
        when(col("ndets") > 1 && col("sq_dev_sum") > 0,
          round(col("sq_diff_sum") / col("sq_dev_sum"), 6)))
      .orderBy("rootid", "band")
  }

  val a18Sql: String =
    s"""WITH src AS ($liSourcesSql),
       |s2 AS (SELECT rootid, band, diasourceid, psfflux,
       |         CAST(FLOOR(midpointmjdtai * 100 + 0.5) AS BIGINT) AS mjd_c
       |       FROM src),
       |m AS (SELECT rootid, band, AVG(psfflux) AS mn FROM s2 GROUP BY 1, 2),
       |dd AS (SELECT s2.rootid, s2.band, s2.psfflux, m.mn,
       |         s2.psfflux - LAG(s2.psfflux) OVER (
       |           PARTITION BY s2.rootid, s2.band
       |           ORDER BY s2.mjd_c, s2.diasourceid) AS d
       |       FROM s2 JOIN m USING (rootid, band)),
       |g AS (SELECT rootid, band, COUNT(*) AS ndets,
       |        ROUND(SUM(d * d), 3) AS sq_diff_sum,
       |        ROUND(SUM((psfflux - mn) * (psfflux - mn)), 3) AS sq_dev_sum
       |      FROM dd GROUP BY 1, 2)
       |SELECT rootid, band, ndets, sq_diff_sum, sq_dev_sum,
       |  CASE WHEN ndets > 1 AND sq_dev_sum > 0
       |    THEN ROUND(sq_diff_sum / sq_dev_sum, 6)
       |  END AS eta
       |FROM g ORDER BY rootid, band""".stripMargin

  // ---- A19 (beyond ref): Lomb–Scargle periodogram ---------------------

  /** Lomb–Scargle periodogram (Scargle 1982) per light curve at a
    * 5-period trial grid — the irregular-sampling period search that
    * is THE standard in time-domain astronomy (a17's Schuster form
    * assumes even sampling; LS's per-period phase offset τ restores
    * time-shift invariance for real cadences).
    *
    * Two-pass τ-offset form, engine-portable by the a13/a17 rounding
    * discipline: pass 1 accumulates Σsin(2ωt), Σcos(2ωt) and ROUNDS
    * them at 3 dp — so τ = atan2(s2_r, c2_r)/(2ω) is computed from
    * bit-identical inputs in both engines and is itself bit-identical
    * (atan2/sin/cos are 1-ulp libm calls whose ≲1e-15 divergence is
    * crushed by the 3-dp rounding of every downstream SUM); pass 2
    * accumulates the four phased sums (Σy·cos, Σy·sin, Σcos², Σsin²
    * at ω(t−τ)), rounds each at 3 dp, and assembles the power from
    * the rounded pieces. The centering mean stays UNROUNDED (the a17
    * lesson). Frequencies are spelled as single divisions of exact
    * doubles (2π/p, 4π/p — 2π and 4π are exact power-of-two scalings
    * of the correctly-rounded π), so every argument is IEEE-identical
    * cross-engine.
    *
    * Curves need n ≥ 5 detections (below that the trial fit is
    * meaningless and the n=1 degenerate τ makes Σsin² exactly 0);
    * if a rounded denominator still lands ≤ 0, power is null rather
    * than ±inf — both spelled identically in the oracle.
    *
    * τ is only defined modulo p/2 (the defining tangent has period π
    * in 2ωτ), and atan2's ±π branch cut sits exactly where a
    * near-zero Σsin(2ωt) rounds to ±0 — an engine whose accumulation
    * noise lands on the other side of zero picks the other branch,
    * shifting the phase by π and flipping BOTH projection signs
    * (observed live: one sf0.01 curve). The emitted (yc, ys) pair is
    * therefore sign-canonicalized — flipped to make it
    * lexicographically non-negative — which pins the τ representative
    * without touching the (sign-invariant) power.
    *
    * Scale shape: the period grid explodes in the scan stage (×5
    * rows, no join); pass 1 is one map-combined aggregate; τ (one row
    * per curve×period) broadcasts back onto the exploded stream, so
    * pass 2 is one more map-combined aggregate — no self-join,
    * nothing quadratic in curve length, the same two-shuffle shape at
    * any corpus size. */
  def a19LombScargle(s: SparkSession, d: String): DataFrame = {
    val periods = Seq(5.0, 10.0, 15.0, 20.0, 25.0)
    val src = liSources(s, d)
      .select(col("rootid"), col("band"), col("midpointmjdtai").as("t"),
        col("psfflux"))
    val means = src.groupBy("rootid", "band")
      .agg(avg(col("psfflux")).as("_mean"))
    val yp = src.join(means, Seq("rootid", "band"))
      .withColumn("y", col("psfflux") - col("_mean"))
      .withColumn("p", explode(array(periods.map(lit): _*)))
    val w1 = lit(2 * math.Pi) / col("p")   // ω
    val w2 = lit(4 * math.Pi) / col("p")   // 2ω
    val tau = yp.groupBy("rootid", "band", "p")
      .agg(count(lit(1)).as("n"),
        round(sum(sin(w2 * col("t"))), 3).as("_s2_r"),
        round(sum(cos(w2 * col("t"))), 3).as("_c2_r"))
      .filter(col("n") >= 5)
      .withColumn("_tau", atan2(col("_s2_r"), col("_c2_r")) / w2)
      .select(col("rootid"), col("band"), col("p"), col("n"), col("_tau"))
    val ph = w1 * (col("t") - col("_tau"))
    yp.join(broadcast(tau), Seq("rootid", "band", "p"))
      // cos/sin of the phase are PROJECTED once per row before the
      // aggregate: each appears in 3 of the 4 sums, and aggregate
      // update expressions do not reliably get codegen subexpression
      // elimination — the projection pins 2 trig calls/row instead of
      // 6. Same multiplications on the same values afterwards, so the
      // 3-dp-rounded sums are bit-identical (oracle-stable).
      .select(col("rootid"), col("band"), col("p"), col("n"), col("y"),
        cos(ph).as("_cph"), sin(ph).as("_sph"))
      .groupBy(col("rootid"), col("band"), col("p"), col("n"))
      .agg(round(sum(col("y") * col("_cph")), 3).as("yc_r"),
        round(sum(col("y") * col("_sph")), 3).as("ys_r"),
        round(sum(col("_cph") * col("_cph")), 3).as("_cc_r"),
        round(sum(col("_sph") * col("_sph")), 3).as("_ss_r"))
      .withColumn("power_r",
        when(col("_cc_r") > 0 && col("_ss_r") > 0,
          round(lit(0.5) * (col("yc_r") * col("yc_r") / col("_cc_r") +
            col("ys_r") * col("ys_r") / col("_ss_r")), 3)))
      .withColumn("_flip",
        col("yc_r") < 0 || (col("yc_r") === 0 && col("ys_r") < 0))
      .select(col("rootid"), col("band"), col("p"), col("n"),
        // + 0.0 pins the sign of zero: a rounded ±0 projection (or a
        // flip of +0.0) must not emit -0.0 on one engine only
        (when(col("_flip"), -col("yc_r")).otherwise(col("yc_r")) + lit(0.0))
          .as("yc_r"),
        (when(col("_flip"), -col("ys_r")).otherwise(col("ys_r")) + lit(0.0))
          .as("ys_r"),
        col("power_r"))
      .orderBy("rootid", "band", "p")
  }

  val a19Sql: String =
    s"""WITH src AS ($liSourcesSql),
       |m AS (SELECT rootid, band, AVG(psfflux) AS mn
       |      FROM src GROUP BY 1, 2),
       |yp AS (SELECT s.rootid, s.band, s.midpointmjdtai AS t,
       |         s.psfflux - m.mn AS y, f.p
       |       FROM src s JOIN m USING (rootid, band)
       |       CROSS JOIN (SELECT CAST(unnest([5.0, 10.0, 15.0, 20.0, 25.0])
       |         AS DOUBLE) AS p) f),
       |tau AS (SELECT rootid, band, p, COUNT(*) AS n,
       |          atan2(ROUND(SUM(sin(4 * pi() / p * t)), 3),
       |                ROUND(SUM(cos(4 * pi() / p * t)), 3))
       |            / (4 * pi() / p) AS tau
       |        FROM yp GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5),
       |g AS (SELECT yp.rootid, yp.band, yp.p, tau.n,
       |        ROUND(SUM(y * cos(2 * pi() / yp.p * (t - tau))), 3) AS yc_r,
       |        ROUND(SUM(y * sin(2 * pi() / yp.p * (t - tau))), 3) AS ys_r,
       |        ROUND(SUM(cos(2 * pi() / yp.p * (t - tau)) *
       |                  cos(2 * pi() / yp.p * (t - tau))), 3) AS cc_r,
       |        ROUND(SUM(sin(2 * pi() / yp.p * (t - tau)) *
       |                  sin(2 * pi() / yp.p * (t - tau))), 3) AS ss_r
       |      FROM yp JOIN tau USING (rootid, band, p)
       |      GROUP BY 1, 2, 3, 4)
       |SELECT rootid, band, p, n,
       |  (CASE WHEN yc_r < 0 OR (yc_r = 0 AND ys_r < 0)
       |    THEN -yc_r ELSE yc_r END) + 0.0 AS yc_r,
       |  (CASE WHEN yc_r < 0 OR (yc_r = 0 AND ys_r < 0)
       |    THEN -ys_r ELSE ys_r END) + 0.0 AS ys_r,
       |  CASE WHEN cc_r > 0 AND ss_r > 0
       |    THEN ROUND(0.5 * (yc_r * yc_r / cc_r + ys_r * ys_r / ss_r), 3)
       |  END AS power_r
       |FROM g ORDER BY rootid, band, p""".stripMargin

  // ---- A20: cross-band color via as-of match -------------------------

  /** A20 (beyond ref): nearest-epoch cross-band color — for each
    * R-band detection, the most recent N-band detection of the same
    * object at-or-before its epoch, and the flux ratio between them
    * (the color index; monotone in the g−r magnitude color without the
    * engine-divergent log10). This is the classifier feature the
    * reference assembles per-object in `ltcv.py`'s many-band frames,
    * expressed as ONE [[graft.query.Temporal.asofJoin]]: both band
    * streams shuffle once on rootid through a single carry-forward
    * window — never the per-detection correlated scan the oracle
    * spells (rank over an inequality join, quadratic per object).
    *
    * Numeric portability: mjd and flux derive from parquet integers /
    * doubles by identical arithmetic; the ratio and the epoch gap are
    * single IEEE ops on bit-identical inputs → emitted UNROUNDED.
    * Duplicate N-band epochs break ties on srcid (highest wins). */
  def a20Color(s: SparkSession, d: String): DataFrame = {
    // srcid must be UNIQUE for the as-of tiebreak and the oracle's
    // per-detection rank: (l_orderkey, l_linenumber) repeats in the
    // synthetic lineitem, but adding partkey + the exact price cents
    // is checked unique — rendered as an integer-only string so both
    // engines produce identical bytes.
    val src = lineitem(s, d).select(
      concat_ws("-", col("l_orderkey") * 10 + col("l_linenumber"),
        col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long")).as("srcid"),
      (col("l_orderkey") % 300).cast("string").as("rootid"),
      col("l_returnflag").as("band"),
      (lit(60000.0) + (col("l_partkey") % 1000) * 0.1).as("mjd"),
      (col("l_extendedprice") / 10).as("flux"))
    val r = src.filter(col("band") === "R")
      .select("rootid", "srcid", "mjd", "flux")
    val n = src.filter(col("band") === "N")
      .select(col("rootid"), col("srcid").as("n_srcid"),
        col("mjd").as("n_mjd"), col("flux").as("n_flux"))
    graft.query.Temporal.asofJoin(r, n, "rootid", "mjd", "n_mjd",
        tieBreak = Seq("n_srcid"))
      .filter(col("n_srcid").isNotNull)
      .select(col("rootid"), col("srcid"), col("mjd"), col("flux"),
        col("n_srcid"), col("n_mjd"), col("n_flux"),
        (col("flux") / col("n_flux")).as("color_ratio"),
        // mjd lives on a 0.1-day grid anchored at 60000: the big-offset
        // sum absorbs the grid's double noise (values match DuckDB's
        // decimal arithmetic bit-for-bit), but SUBTRACTING two epochs
        // cancels the anchor and exposes it — round the gap at 4 dp.
        round(col("mjd") - col("n_mjd"), 4).as("dt"))
      .orderBy("srcid")
  }

  val a20Sql: String =
    """WITH src AS (SELECT
      |    CONCAT_WS('-', l_orderkey * 10 + l_linenumber, l_partkey,
      |      CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS srcid,
      |    CAST(l_orderkey % 300 AS VARCHAR) AS rootid,
      |    l_returnflag AS band,
      |    60000.0 + (l_partkey % 1000) * 0.1 AS mjd,
      |    l_extendedprice / 10 AS flux
      |  FROM lineitem),
      |r AS (SELECT rootid, srcid, mjd, flux FROM src WHERE band = 'R'),
      |n AS (SELECT rootid, srcid AS n_srcid, mjd AS n_mjd, flux AS n_flux
      |      FROM src WHERE band = 'N'),
      |j AS (SELECT r.rootid, r.srcid, r.mjd, r.flux,
      |        n.n_srcid, n.n_mjd, n.n_flux,
      |        ROW_NUMBER() OVER (PARTITION BY r.srcid
      |          ORDER BY n.n_mjd DESC, n.n_srcid DESC) AS rk
      |      FROM r JOIN n ON r.rootid = n.rootid AND n.n_mjd <= r.mjd)
      |SELECT rootid, srcid, mjd, flux, n_srcid, n_mjd, n_flux,
      |  flux / n_flux AS color_ratio, ROUND(mjd - n_mjd, 4) AS dt
      |FROM j WHERE rk = 1 ORDER BY srcid""".stripMargin

  // ---- W9: fixed-grid interpolation ----------------------------------

  /** W9 (beyond ref): per-curve FIXED-GRID linear interpolation
    * ([[Ltcv.interpolateGrid]]) — the resampling an LSST-style feature
    * pipeline runs before fitting on a common epoch grid. Time rides
    * an exact INTEGER axis (the operator's contract: integer epochs /
    * steps / gaps replay exactly); duplicate epochs pre-collapse
    * brightest-wins; step 50 so each curve gets a handful of grid
    * epochs strictly inside its span. The interpolation weight is one
    * exact-integer division and the flux three IEEE ops on
    * bit-identical inputs → emitted UNROUNDED; grid epochs landing
    * exactly ON a detection emit that detection's flux with
    * bracket_gap 0 (the ordering-fix regression class — detections
    * sort before grid points at equal epochs in BOTH window passes).
    * Oracle mirrors the union + two-directional carry windows with
    * DuckDB's IGNORE NULLS last_value. */
  def w9InterpGrid(s: SparkSession, d: String): DataFrame = {
    val src = lineitem(s, d).select(
        (col("l_orderkey") % 300).cast("string").as("rootid"),
        col("l_returnflag").as("band"),
        (col("l_partkey") % 1000).cast("long").as("t"),
        (col("l_extendedprice") / 10).as("flux"))
      .groupBy("rootid", "band", "t")
      .agg(max("flux").as("flux"))
    Ltcv.interpolateGrid(src, Seq("rootid", "band"), "t", "flux", step = 50L)
      .orderBy("rootid", "band", "t")
  }

  val w9Sql: String =
    """WITH src0 AS (SELECT CAST(l_orderkey % 300 AS VARCHAR) AS rootid,
      |    l_returnflag AS band, CAST(l_partkey % 1000 AS BIGINT) AS t,
      |    l_extendedprice / 10 AS flux FROM lineitem),
      |src AS (SELECT rootid, band, t, MAX(flux) AS flux
      |        FROM src0 GROUP BY 1, 2, 3),
      |b AS (SELECT rootid, band, MIN(t) AS tmin, MAX(t) AS tmax
      |      FROM src GROUP BY 1, 2),
      |g AS (SELECT rootid, band,
      |        unnest(range((tmin + 49) // 50, tmax // 50 + 1)) * 50 AS t
      |      FROM b),
      |u AS (SELECT rootid, band, t, 1 AS isgrid, CAST(NULL AS DOUBLE) AS f
      |      FROM g
      |      UNION ALL
      |      SELECT rootid, band, t, 0, flux FROM src),
      |c AS (SELECT *,
      |    LAST_VALUE(CASE WHEN isgrid = 0 THEN t END IGNORE NULLS)
      |      OVER wp AS tp,
      |    LAST_VALUE(CASE WHEN isgrid = 0 THEN f END IGNORE NULLS)
      |      OVER wp AS fp,
      |    LAST_VALUE(CASE WHEN isgrid = 0 THEN t END IGNORE NULLS)
      |      OVER wn AS tn,
      |    LAST_VALUE(CASE WHEN isgrid = 0 THEN f END IGNORE NULLS)
      |      OVER wn AS fn
      |  FROM u WINDOW
      |    wp AS (PARTITION BY rootid, band ORDER BY t ASC, isgrid ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wn AS (PARTITION BY rootid, band ORDER BY t DESC, isgrid ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT rootid, band, t,
      |  CASE WHEN tn = tp THEN fp
      |       ELSE fp + (fn - fp) *
      |            (CAST(t - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE)) END
      |    AS flux_interp,
      |  CAST(tn - tp AS BIGINT) AS bracket_gap
      |FROM c
      |WHERE isgrid = 1 AND tp IS NOT NULL AND tn IS NOT NULL
      |ORDER BY rootid, band, t""".stripMargin

  // ---- A21: Stetson variability indices --------------------------------

  /** A21 (beyond ref): Stetson J/K variability indices
    * ([[Ltcv.stetsonIndices]]) on the a20 projection (unique srcid as
    * the pairing tiebreak, positive integer errors). J's pair sum is
    * sign-indefinite so its 3-dp rounding is zero-canonicalized in the
    * operator; K is a positive ratio. Both engines spell the identical
    * two-pass formula — the UNROUNDED mean feeds δ, and the smooth
    * sgn(P)·√|P| absorbs last-ulp mean noise under 3-dp rounding. */
  def a21Stetson(s: SparkSession, d: String): DataFrame = {
    val src = lineitem(s, d).select(
      concat_ws("-", col("l_orderkey") * 10 + col("l_linenumber"),
        col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long")).as("srcid"),
      (col("l_orderkey") % 300).cast("string").as("rootid"),
      col("l_returnflag").as("band"),
      (lit(60000.0) + (col("l_partkey") % 1000) * 0.1).as("mjd"),
      (col("l_extendedprice") / 10).as("flux"),
      col("l_quantity").cast("double").as("fluxerr"))
    Ltcv.stetsonIndices(src, Seq("rootid", "band"),
        "mjd", "srcid", "flux", "fluxerr")
      .orderBy("rootid", "band")
  }

  val a21Sql: String =
    """WITH src AS (SELECT
      |    CONCAT_WS('-', l_orderkey * 10 + l_linenumber, l_partkey,
      |      CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS srcid,
      |    CAST(l_orderkey % 300 AS VARCHAR) AS rootid,
      |    l_returnflag AS band,
      |    60000.0 + (l_partkey % 1000) * 0.1 AS mjd,
      |    l_extendedprice / 10 AS f,
      |    CAST(l_quantity AS DOUBLE) AS e
      |  FROM lineitem),
      |m AS (SELECT rootid, band, COUNT(*) AS n, AVG(f) AS fbar
      |      FROM src GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |d AS (SELECT s.rootid, s.band, s.mjd, s.srcid,
      |        sqrt(CAST(m.n AS DOUBLE) / (m.n - 1)) * (s.f - m.fbar) / s.e
      |          AS delta
      |      FROM src s JOIN m USING (rootid, band)),
      |p AS (SELECT *, LAG(delta) OVER (PARTITION BY rootid, band
      |        ORDER BY mjd, srcid) AS dprev FROM d),
      |ag AS (SELECT rootid, band, COUNT(*) AS ndets,
      |    SUM(CASE WHEN dprev IS NOT NULL
      |        THEN sign(dprev * delta) * sqrt(abs(dprev * delta)) END)
      |      AS jsum,
      |    SUM(CASE WHEN dprev IS NOT NULL THEN 1 ELSE 0 END) AS npairs,
      |    SUM(abs(delta)) AS abssum,
      |    SUM(delta * delta) AS sqsum
      |  FROM p GROUP BY 1, 2)
      |SELECT rootid, band, ndets,
      |  ROUND(jsum / npairs, 3) + 0.0 AS stetson_j,
      |  ROUND((abssum / ndets) / sqrt(sqsum / ndets), 3) AS stetson_k
      |FROM ag ORDER BY rootid, band""".stripMargin

  // ---- A4: cross-band rollup ----------------------------------------

  def a4Rollup(s: SparkSession, d: String): DataFrame =
    Ltcv.objStatsComb(liSources(s, d)
        .withColumn("rootid", (col("diasourceid") % 300).cast("string")))
      .select(col("rootid"), col("ndets"),
        col("firstdetmjd"), col("lastdetmjd"),
        round(col("maxdetflux"), 4).as("maxdetflux"),
        col("ndets23"), col("nsn5"))
      .orderBy("rootid")

  val a4Sql: String =
    s"""WITH src0 AS ($liSourcesSql),
       |src AS (SELECT * REPLACE (CAST(diasourceid % 300 AS VARCHAR) AS rootid) FROM src0),
       |agg AS (
       |  SELECT rootid, COUNT(*) AS ndets,
       |    CAST(SUM(CASE WHEN psfflux >= POWER(10, (23 - 31.4) / -2.5) THEN 1 ELSE 0 END) AS BIGINT) AS ndets23,
       |    CAST(SUM(CASE WHEN psfflux / psffluxerr >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS nsn5
       |  FROM src GROUP BY rootid),
       |ranked AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY rootid ORDER BY midpointmjdtai, diasourceid) AS rn_first,
       |    ROW_NUMBER() OVER (PARTITION BY rootid ORDER BY midpointmjdtai DESC, diasourceid DESC) AS rn_last,
       |    ROW_NUMBER() OVER (PARTITION BY rootid ORDER BY psfflux DESC, diasourceid DESC) AS rn_max
       |  FROM src)
       |SELECT agg.rootid, agg.ndets,
       |  fst.midpointmjdtai AS firstdetmjd, lst.midpointmjdtai AS lastdetmjd,
       |  ROUND(mx.psfflux, 4) AS maxdetflux,
       |  agg.ndets23, agg.nsn5
       |FROM agg
       |JOIN (SELECT * FROM ranked WHERE rn_first = 1) fst USING (rootid)
       |JOIN (SELECT * FROM ranked WHERE rn_last = 1) lst USING (rootid)
       |JOIN (SELECT * FROM ranked WHERE rn_max = 1) mx USING (rootid)
       |ORDER BY rootid""".stripMargin

  // ---- A12: COALESCE-merge upsert ------------------------------------

  /** existing := customers with segment nulled where 'BUILDING';
    * incoming := all customers (fills the nulls, must not overwrite the
    * rest) plus suppliers under fresh keys (pure inserts) — through the
    * real SourceImporter.mergeCoalesce. */
  def a12CoalesceMerge(s: SparkSession, d: String): DataFrame = {
    val existing = customer(s, d).select(col("c_custkey").as("k"),
      nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
      col("c_acctbal").as("bal"))
    val incoming = customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), lit(999.0).as("bal"))
      .unionByName(supplier(s, d).select(
        (col("s_suppkey") + 10000000L).as("k"),
        col("s_name").as("seg"), col("s_acctbal").as("bal")))
    SourceImporter.mergeCoalesce(existing, incoming, Seq("k"))
      .orderBy("k")
  }

  val a12Sql: String =
    """WITH e AS (SELECT c_custkey AS k, NULLIF(c_mktsegment, 'BUILDING') AS seg,
      |             c_acctbal AS bal FROM customer),
      |i AS (SELECT c_custkey AS k, c_mktsegment AS seg, 999.0 AS bal FROM customer
      |      UNION ALL
      |      SELECT s_suppkey + 10000000, s_name, s_acctbal FROM supplier),
      |upd AS (SELECT e.k, COALESCE(e.seg, i.seg) AS seg, COALESCE(e.bal, i.bal) AS bal
      |        FROM e LEFT JOIN i USING (k)),
      |ins AS (SELECT k, seg, bal FROM i WHERE k NOT IN (SELECT k FROM e))
      |SELECT k, seg, bal FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
      |ORDER BY k""".stripMargin

  // ---- A7: weighted positions ---------------------------------------

  def a7WeightedPos(s: SparkSession, d: String): DataFrame =
    Ltcv.weightedPositions(liSources(s, d)
        .withColumn("rootid", (col("diasourceid") % 100).cast("string"))
        .withColumn("psffluxerr", col("psffluxerr") * 10))
      .select(col("rootid"), col("nposdets"),
        round(col("ra"), 6).as("ra"), round(col("dec"), 6).as("dec"),
        round(col("rastd"), 6).as("rastd"), round(col("decstd"), 6).as("decstd"))
      .orderBy("rootid")

  val a7Sql: String =
    s"""WITH src0 AS ($liSourcesSql),
       |src AS (SELECT * REPLACE (CAST(diasourceid % 100 AS VARCHAR) AS rootid,
       |                          psffluxerr * 10 AS psffluxerr) FROM src0),
       |w AS (SELECT rootid, ra, dec, POWER(psfflux / psffluxerr, 2) AS w
       |      FROM src WHERE psfflux / psffluxerr > 3)
       |SELECT rootid, COUNT(*) AS nposdets,
       |  ROUND(SUM(w * ra) / SUM(w), 6) AS ra,
       |  ROUND(SUM(w * dec) / SUM(w), 6) AS dec,
       |  ROUND(SQRT(GREATEST(SUM(w * ra * ra) / SUM(w) - POWER(SUM(w * ra) / SUM(w), 2), 0)), 6) AS rastd,
       |  ROUND(SQRT(GREATEST(SUM(w * dec * dec) / SUM(w) - POWER(SUM(w * dec) / SUM(w), 2), 0)), 6) AS decstd
       |FROM w GROUP BY rootid
       |ORDER BY rootid""".stripMargin

  // ---- J6: zones-algorithm cone join --------------------------------

  /** customers and suppliers on a synthetic sky; pairs within 0.123°.
    * Spark runs the scalable zone-bucketed equi-join; the oracle brute
    * forces the same haversine predicate. */
  def j6ConeJoin(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey"),
      ((col("c_custkey") % 3600) * 0.1).as("ra"),
      ((col("c_custkey") % 1700) * 0.1 - 85.0).as("dec"))
    val p = supplier(s, d).select(col("s_suppkey"),
      ((col("s_suppkey") % 3600) * 0.1 + 0.05).as("sra"),
      ((col("s_suppkey") % 1700) * 0.1 - 85.0 + 0.03).as("sdec"))
    Spatial.coneJoin(c, p, "ra", "dec", "sra", "sdec", radiusArcsec = 0.123 * 3600)
      .select(col("c_custkey"), col("s_suppkey"),
        round(col("sep_arcsec"), 3).as("sep_arcsec"))
      .orderBy("c_custkey", "s_suppkey")
  }

  val j6Sql: String =
    """WITH c AS (SELECT c_custkey, (c_custkey % 3600) * 0.1 AS ra,
      |             (c_custkey % 1700) * 0.1 - 85.0 AS dec FROM customer),
      |p AS (SELECT s_suppkey, (s_suppkey % 3600) * 0.1 + 0.05 AS sra,
      |        (s_suppkey % 1700) * 0.1 - 85.0 + 0.03 AS sdec FROM supplier),
      |pairs AS (
      |  SELECT c_custkey, s_suppkey,
      |    DEGREES(2 * ASIN(SQRT(
      |      POWER(SIN(RADIANS(sdec - dec) / 2), 2) +
      |      COS(RADIANS(dec)) * COS(RADIANS(sdec)) *
      |      POWER(SIN(RADIANS(sra - ra) / 2), 2)))) * 3600 AS sep_arcsec
      |  FROM c CROSS JOIN p)
      |SELECT c_custkey, s_suppkey, ROUND(sep_arcsec, 3) AS sep_arcsec
      |FROM pairs WHERE sep_arcsec <= 0.123 * 3600
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  // ---- A9: latest row per group (groupby-idxmax) ----------------------

  /** Latest detection magnitude per (rootid, band) through the real
    * Spectrum.latestDetectionMags (spectrum.py:265-291's pandas
    * groupby-idxmax as one max_by pass). */
  def a9LatestPerGroup(s: SparkSession, d: String): DataFrame =
    graft.api.Spectrum.latestDetectionMags(
        liSources(s, d).withColumn("rootid", (col("diasourceid") % 200).cast("string")))
      .select(col("rootid"), col("band"), col("latest_mjd"),
        round(col("latest_mag"), 6).as("latest_mag"))
      .orderBy("rootid", "band")

  val a9Sql: String =
    s"""WITH src0 AS ($liSourcesSql),
       |src AS (SELECT * REPLACE (CAST(diasourceid % 200 AS VARCHAR) AS rootid) FROM src0)
       |SELECT rootid, band, midpointmjdtai AS latest_mjd,
       |  ROUND(-2.5 * LOG10(psfflux) + 31.4, 6) AS latest_mag
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rootid, band
       |        ORDER BY midpointmjdtai DESC, diasourceid DESC) AS rn
       |      FROM src)
       |WHERE rn = 1
       |ORDER BY rootid, band""".stripMargin

  // ---- S1: SNANA-shaped batch load -----------------------------------

  /** orders → HEAD, lineitem → PHOT, through the real SnanaLoader
    * (ZP rescale, visit synthesis, photflag split, per-object id
    * sequence); oracle replicates the arithmetic in SQL. */
  def s1SnanaLoad(s: SparkSession, d: String): DataFrame = {
    val head = orders(s, d).select(
      col("o_orderkey").as("SNID"),
      ((col("o_orderkey") % 360) * 0.5).as("RA"),
      ((col("o_orderkey") % 170) * 0.5 - 42.0).as("DEC"),
      lit(0L).as("PTROBS_MIN"), lit(0L).as("PTROBS_MAX"))
    val phot = lineitem(s, d).select(
      col("l_orderkey").as("SNID"),
      col("l_extendedprice").as("MJD"),
      col("l_returnflag").as("BAND"),
      (col("l_quantity") * 10).as("FLUXCAL"),
      col("l_quantity").as("FLUXCALERR"),
      when(col("l_quantity") >= 25, 4096).otherwise(0).as("PHOTFLAG"))
    SnanaLoader.load(head, phot, "bpv-s1").diasource
      .select(col("diasourceid"), col("diaobjectid"), col("visit"), col("band"),
        col("midpointmjdtai"), round(col("psfflux"), 2).as("psfflux"),
        col("ra"), col("dec"))
      .orderBy("diasourceid")
  }

  val s1Sql: String =
    """WITH phot AS (
      |  SELECT l_orderkey AS snid, l_extendedprice AS mjd, l_returnflag AS band,
      |    l_quantity * 10 AS fluxcal, l_quantity AS fluxcalerr,
      |    CASE WHEN l_quantity >= 25 THEN 4096 ELSE 0 END AS photflag
      |  FROM lineitem),
      |seq AS (
      |  SELECT *,
      |    CAST(FLOOR(mjd * 20000) AS BIGINT) AS visit,
      |    CAST(fluxcal * POWER(10, (31.4 - 27.5) / 2.5) AS FLOAT) AS psfflux,
      |    CAST(fluxcalerr * POWER(10, (31.4 - 27.5) / 2.5) AS FLOAT) AS psffluxerr,
      |    ROW_NUMBER() OVER (PARTITION BY snid
      |      ORDER BY mjd, CAST(FLOOR(mjd * 20000) AS BIGINT), band,
      |        CAST(fluxcal * POWER(10, (31.4 - 27.5) / 2.5) AS FLOAT),
      |        CAST(fluxcalerr * POWER(10, (31.4 - 27.5) / 2.5) AS FLOAT),
      |        photflag) - 1 AS s
      |  FROM phot)
      |SELECT snid * 100000 + s AS diasourceid, snid AS diaobjectid, visit, band,
      |  mjd AS midpointmjdtai, ROUND(psfflux, 2) AS psfflux,
      |  (snid % 360) * 0.5 AS ra, (snid % 170) * 0.5 - 42.0 AS dec
      |FROM seq
      |WHERE (photflag & 4096) != 0
      |ORDER BY diasourceid""".stripMargin

  // ---- S2: DP1 nested-parquet load ------------------------------------

  /** Build the DP1 nested layout (object rows with diaSource /
    * diaObjectForcedSource record arrays) from lineitem, then run the
    * real Dp1Loader explode+rename. The oracle is the flat projection
    * the nest/unnest round-trip must reproduce.
    *
    * The nested fixture is MATERIALIZED once per dataset (deterministic
    * content, no seed): in production the nested parquet IS the input
    * file, so re-synthesizing it from lineitem on every execution would
    * charge the loader for a collect_list shuffle it never performs —
    * repeat runs measure what S2 is: a nested-parquet scan + explode. */
  def s2Dp1Load(s: SparkSession, d: String): DataFrame = {
    // keyed on the SOURCE table's content signature: a regenerated
    // dataset rebuilds the fixture instead of serving a stale one
    // (s2 is oracled — a stale fixture would hash-mismatch)
    val fixDir = s"${System.getProperty("java.io.tmpdir")}/graft_dp1_${
      graft.Tables.tableSignature(d, "lineitem")}"
    if (!new java.io.File(s"$fixDir/_SUCCESS").exists())
      s2NestedFixture(s, d).write.mode("overwrite").parquet(fixDir)
    val out = Dp1Loader.load(s.read.parquet(fixDir), "bpv-dp1")
    s2Flat(out)
  }

  private def s2NestedFixture(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.groupBy(col("l_orderkey")).agg(
        collect_list(struct(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("diaSourceId"),
          (col("l_partkey") % 100).as("visit"),
          col("l_returnflag").as("band"),
          col("l_extendedprice").as("midpointMjdTai"),
          (col("l_quantity") * 10).cast("float").as("psfFlux"),
          col("l_quantity").cast("float").as("psfFluxErr"),
          (col("l_partkey") * 1e-4).as("ra"),
          (col("l_suppkey") * 1e-4).as("dec"))).as("diaSource"),
        collect_list(struct(
          (col("l_orderkey") * 100 + col("l_linenumber")).as("diaForcedSourceId"),
          (col("l_partkey") % 100).as("visit"),
          col("l_linestatus").as("band"),
          col("l_extendedprice").as("midpointMjdTai"),
          (col("l_discount") * 1000).cast("float").as("psfFlux"),
          lit(1.0f).as("psfFluxErr"))).as("diaObjectForcedSource"))
      .select(col("l_orderkey").as("diaObjectId"),
        ((col("l_orderkey") % 360) * 0.5).as("ra"),
        ((col("l_orderkey") % 170) * 0.5 - 42.0).as("dec"),
        col("diaSource"), col("diaObjectForcedSource"))
  }

  private def s2Flat(out: Loaded): DataFrame =
    out.diasource
      .select(col("diasourceid"), col("diaobjectid"), col("visit"), col("band"),
        col("midpointmjdtai"), round(col("psfflux"), 2).as("psfflux"),
        col("ra"), col("dec"))
      .unionByName(out.diaforcedsource
        .select(col("diaforcedsourceid").as("diasourceid"), col("diaobjectid"),
          col("visit"), col("band"), col("midpointmjdtai"),
          round(col("psfflux"), 2).as("psfflux"), col("ra"), col("dec")))
      .orderBy("diasourceid", "visit", "band")

  val s2Sql: String =
    """SELECT l_orderkey * 10 + l_linenumber AS diasourceid,
      |  l_orderkey AS diaobjectid, l_partkey % 100 AS visit,
      |  l_returnflag AS band, l_extendedprice AS midpointmjdtai,
      |  ROUND(CAST(l_quantity * 10 AS FLOAT), 2) AS psfflux,
      |  l_partkey * 1e-4 AS ra, l_suppkey * 1e-4 AS dec
      |FROM lineitem
      |UNION ALL
      |SELECT l_orderkey * 100 + l_linenumber, l_orderkey, l_partkey % 100,
      |  l_linestatus, l_extendedprice,
      |  ROUND(CAST(l_discount * 1000 AS FLOAT), 2),
      |  NULL, NULL
      |FROM lineitem
      |ORDER BY diasourceid, visit, band""".stripMargin

  // ---- T6: hot-transient recency window on events --------------------

  /** "objects with activity in the last N days of mjd_now": users with
    * an event in the last 2 days before the cut, full event history up
    * to the cut for those users (ltcv.py:1467-1507 semantics). */
  def t6HotWindow(s: SparkSession, d: String): DataFrame = {
    val now = lit("2024-01-20 00:00:00").cast("timestamp")
    val ev = events(s, d).filter(col("ts") <= now)
    val hot = ev.filter(col("ts") >= lit("2024-01-18 00:00:00").cast("timestamp"))
      .select("user_id").distinct()
    ev.join(hot, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"))
      .orderBy("user_id", "event_id")
  }

  val t6Sql: String =
    """SELECT user_id, event_id, event_type, ROUND(value, 4) AS value
      |FROM events
      |WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
      |  AND user_id IN (
      |    SELECT user_id FROM events
      |    WHERE ts >= TIMESTAMP '2024-01-18 00:00:00'
      |      AND ts <= TIMESTAMP '2024-01-20 00:00:00')
      |ORDER BY user_id, event_id""".stripMargin

  // ---- B1: broker classifier envelope ---------------------------------

  /** events → alert packets → the real wrangle → diasource_brokerinfo
    * staging rows (classifications serialized into the `info` JSON
    * envelope) → BrokerInfo.explodeClassifications → per-class rollup.
    * Exercises the brokerinfo collection split end-to-end
    * (brokerconsumer.py:625-649 + the getbrokerinfo read path); the
    * oracle replays the same classification arithmetic in SQL. */
  def b1BrokerInfo(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType => AT}
    import graft.streaming.AlertStream
    val ev = events(s, d)
    val alerts = ev.select(
      col("event_id").as("alertId"),
      struct(
        col("event_id").as("diaSourceId"), col("user_id").as("diaObjectId"),
        (col("event_id") % 100).as("visit"), lit("r").as("band"),
        (lit(60000.0) + col("value")).as("midpointMjdTai"),
        lit(1.0f).as("psfFlux"), lit(0.1f).as("psfFluxErr"),
        ((col("user_id") % 360) * 0.5).as("ra"),
        ((col("user_id") % 170) * 0.5 - 42.0).as("dec"),
        lit(null).cast("float").as("snr"),
        lit(null).cast("float").as("scienceFlux"),
        lit(null).cast("float").as("scienceFluxErr"),
        lit(null).cast("float").as("extendedness"),
        lit(null).cast("float").as("reliability")).as("diaSource"),
      lit(null).cast(AT(AlertStream.sourceStruct)).as("prvDiaSources"),
      lit(null).cast(AT(AlertStream.forcedStruct)).as("prvDiaForcedSources"),
      struct(col("user_id").as("diaObjectId"),
        ((col("user_id") % 360) * 0.5).as("ra"),
        ((col("user_id") % 170) * 0.5 - 42.0).as("dec")).as("diaObject"),
      lit(null).cast("binary").as("cutoutDifference"),
      lit(null).cast("binary").as("cutoutScience"),
      lit(null).cast("binary").as("cutoutTemplate"),
      array(
        struct((col("event_id") % 10).cast("int").as("classId"),
          round(col("value"), 4).as("probability")),
        struct((lit(10) + col("user_id") % 5).cast("int").as("classId"),
          (get_json_object(col("props"), "$.k").cast("int") / 100.0)
            .as("probability"))).as("classifications"))
    val w = AlertStream.wrangle(alerts, "bpv-b1")
    graft.api.BrokerInfo.explodeClassifications(w.brokerinfo)
      .groupBy("classid")
      .agg(count(lit(1)).as("n_msgs"),
        round(avg("probability"), 6).as("avg_prob"),
        round(sum("probability"), 4).as("sum_prob"))
      .orderBy("classid")
  }

  val b1Sql: String =
    """WITH cls AS (
      |  SELECT CAST(event_id % 10 AS INT) AS classid,
      |         ROUND(value, 4) AS probability
      |  FROM events
      |  UNION ALL
      |  SELECT CAST(10 + user_id % 5 AS INT) AS classid,
      |         CAST(json_extract_string(props, '$.k') AS INT) / 100.0 AS probability
      |  FROM events)
      |SELECT classid, COUNT(*) AS n_msgs,
      |  ROUND(AVG(probability), 6) AS avg_prob,
      |  ROUND(SUM(probability), 4) AS sum_prob
      |FROM cls GROUP BY classid ORDER BY classid""".stripMargin

  // ---- HG1: host-galaxy import + prio-ranked match --------------------

  /** customer → diaobjects carrying nearbyextobj{1..3} references,
    * supplier → the upstream host catalog, through the real
    * HostGalaxy chain (anti-join import, unpivot match, argmax best
    * host — dr_importer.py:44-78, db refactor.sql:113-167). Oracle
    * replays the arithmetic; prio is unique per object so the argmax
    * needs no uuid tiebreak on the oracle side. */
  def hg1HostMatch(s: SparkSession, d: String): DataFrame = {
    import graft.host.HostGalaxy
    val objs = customer(s, d).select(
      col("c_custkey").as("diaobjectid"),
      ((col("c_custkey") % 100) + 1).cast("string").as("nearbyextobj1"),
      when(col("c_custkey") % 3 =!= 0, ((col("c_custkey") * 7) % 100) + 1)
        .cast("string").as("nearbyextobj2"),
      when(col("c_custkey") % 5 === 0, ((col("c_custkey") * 13) % 100) + 1)
        .cast("string").as("nearbyextobj3"))
    val cat = supplier(s, d).select(
      col("s_suppkey").cast("string").as("host_id"),
      ((col("s_suppkey") % 360) * 0.7).as("ra"),
      ((col("s_suppkey") % 160) * 0.5 - 40.0).as("dec"),
      to_json(struct(col("s_acctbal"))).as("info"))
    val none = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.schema.Schemas.hostGalaxy)
    val hosts = HostGalaxy.importHosts(none, objs, cat, "tpch", "bpv-hg")
    val matches = HostGalaxy.matchHosts(objs, hosts, "tpch", "bpv-hg")
    HostGalaxy.bestHost(matches, hosts)
      .select(col("diaobjectid"), col("host_id"),
        col("prio").cast("int").as("prio"), col("n_hosts"),
        round(col("host_ra"), 4).as("host_ra"),
        round(col("host_dec"), 4).as("host_dec"))
      .orderBy("diaobjectid")
  }

  val hg1Sql: String =
    """WITH obj AS (
      |  SELECT c_custkey AS diaobjectid,
      |    CAST((c_custkey % 100) + 1 AS VARCHAR) AS h0,
      |    CASE WHEN c_custkey % 3 != 0
      |      THEN CAST(((c_custkey * 7) % 100) + 1 AS VARCHAR) END AS h1,
      |    CASE WHEN c_custkey % 5 = 0
      |      THEN CAST(((c_custkey * 13) % 100) + 1 AS VARCHAR) END AS h2
      |  FROM customer),
      |pairs0 AS (
      |  SELECT diaobjectid, h0 AS host_id, 0 AS prio FROM obj
      |  UNION ALL SELECT diaobjectid, h1, 1 FROM obj WHERE h1 IS NOT NULL
      |  UNION ALL SELECT diaobjectid, h2, 2 FROM obj WHERE h2 IS NOT NULL),
      |pairs AS (
      |  SELECT diaobjectid, host_id, MIN(prio) AS prio
      |  FROM pairs0 GROUP BY 1, 2),
      |hosts AS (
      |  SELECT CAST(s_suppkey AS VARCHAR) AS host_id,
      |    (s_suppkey % 360) * 0.7 AS host_ra,
      |    (s_suppkey % 160) * 0.5 - 40 AS host_dec
      |  FROM supplier),
      |m AS (SELECT p.diaobjectid, p.host_id, p.prio, h.host_ra, h.host_dec
      |      FROM pairs p JOIN hosts h USING (host_id)),
      |r AS (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY diaobjectid ORDER BY prio) AS rn,
      |    COUNT(*) OVER (PARTITION BY diaobjectid) AS n_hosts
      |  FROM m)
      |SELECT diaobjectid, host_id, CAST(prio AS INT) AS prio, n_hosts,
      |  ROUND(host_ra, 4) AS host_ra, ROUND(host_dec, 4) AS host_dec
      |FROM r WHERE rn = 1 ORDER BY diaobjectid""".stripMargin

  // ---- A10/A11: staging dedup + keep-existing merge -------------------

  /** lineitem → staging docs with heavy key duplication and tied
    * timestamps, through the real first-seen dedup (whose ordering key
    * is (ingest_ts, payload) — the tied-timestamp rows exercise the
    * deterministic payload tiebreak). Oracle replays the ordering with
    * a window. */
  def a10FirstSeen(s: SparkSession, d: String): DataFrame = {
    val staged = lineitem(s, d).select(
      (col("l_orderkey") % 500).as("diaobjectid"),
      lit("bpv").as("base_procver_id"),
      col("l_extendedprice").as("val"),
      col("l_linenumber").cast("long").as("src"),
      timestamp_seconds(col("l_suppkey") % 5).as("ingest_ts"))
    SourceImporter.dedupFirstSeen(staged, Seq("diaobjectid", "base_procver_id"))
      .select(col("diaobjectid"), col("val"), col("src"))
      .orderBy("diaobjectid")
  }

  val a10Sql: String =
    """WITH staged AS (
      |  SELECT l_orderkey % 500 AS diaobjectid, l_extendedprice AS val,
      |    CAST(l_linenumber AS BIGINT) AS src, l_suppkey % 5 AS ts
      |  FROM lineitem),
      |r AS (SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY diaobjectid ORDER BY ts, val, src) AS rn
      |  FROM staged)
      |SELECT diaobjectid, val, src FROM r WHERE rn = 1
      |ORDER BY diaobjectid""".stripMargin

  /** Overlapping order sets through the real ON CONFLICT DO NOTHING
    * merge: existing rows win, only genuinely new keys insert. */
  def a11KeepExisting(s: SparkSession, d: String): DataFrame = {
    val existing = orders(s, d).filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("id"),
        col("o_totalprice").as("v"), lit("existing").as("origin"))
    val incoming = orders(s, d).filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("id"),
        (col("o_totalprice") + 1).as("v"), lit("incoming").as("origin"))
    SourceImporter.mergeKeepExisting(existing, incoming, Seq("id"))
      .orderBy("id")
  }

  val a11Sql: String =
    """WITH e AS (SELECT o_orderkey AS id, o_totalprice AS v,
      |    'existing' AS origin FROM orders WHERE o_orderkey % 2 = 0),
      |i AS (SELECT o_orderkey AS id, o_totalprice + 1 AS v,
      |    'incoming' AS origin FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT * FROM e
      |UNION ALL
      |SELECT * FROM i WHERE id NOT IN (SELECT id FROM e)
      |ORDER BY id""".stripMargin

  // ---- S9: alert-producer unsent selection ----------------------------

  /** lineitem → ppdb-shaped detections with every third id already
    * sent, through the real AlertProducer.alertsToSend (horizon = max
    * sent mjd + addedDays; anti-join on the sent table —
    * projectsim.py:423-483). The reconstruct+encode half of S9 is
    * byte-level avro and spec-verified instead (StreamingSpec's
    * encode/decode round trip). */
  def s9UnsentAlerts(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.AlertProducer
    val sources = lineitem(s, d).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("diasourceid"),
      (col("l_orderkey") % 1000).as("diaobjectid"),
      (col("l_partkey") % 100).as("visit"),
      col("l_returnflag").as("band"),
      col("l_extendedprice").as("midpointmjdtai"))
    val sent = sources.filter(col("diasourceid") % 3 === 0)
      .select(col("diasourceid"), lit(null).cast("timestamp").as("senttime"))
    AlertProducer.alertsToSend(sources, sent, addedDays = 1.0)
      .select(col("diasourceid"), col("midpointmjdtai").as("mjd"))
      .orderBy("diasourceid")
  }

  val s9Sql: String =
    """WITH src AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS diasourceid,
      |    l_extendedprice AS mjd
      |  FROM lineitem),
      |thr AS (SELECT MAX(mjd) + 1.0 AS t FROM src WHERE diasourceid % 3 = 0)
      |SELECT diasourceid, mjd
      |FROM src, thr
      |WHERE diasourceid % 3 != 0 AND mjd < t
      |ORDER BY diasourceid""".stripMargin

  // ---- st4: the full broker loop under the oracle --------------------

  /** ST4: produce → wire → consume → silver, end to end. A
    * deterministic alert batch derives from orders (1/37th of
    * orderkeys — a consume batch, not a corpus), is encoded by the
    * REAL avro producer ([[graft.streaming.AvroAlerts.encode]]),
    * framed Confluent-style, published onto the Pub/Sub-shaped custom
    * V2 source ([[graft.streaming.PubSubLikeSource]]), and consumed by
    * a REAL Structured Streaming query whose foreachBatch runs the
    * production path: framing decode → alert wrangle → idempotent
    * silver merge ([[graft.merge.SourceImporter.importBatchWithDeltas]]
    * + [[graft.streaming.SilverStore.saveDelta]]). Two waves exercise
    * cross-batch merges, and wave 2 REDELIVERS part of wave 1 — the
    * at-least-once duplicates the merge contract (T2) must drop, which
    * the oracle proves by stating the silver table as exactly one row
    * per derived alert. All derived values sit on integer/0.1/0.25
    * lattices, so the silver columns replay bit-identically in SQL. */
  def st4PubsubAlerts(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.{AlertStream, AvroAlerts, Brokers, PubSubLikeSource, SilverStore}
    val aSchema = AlertStream.alertSchema
    val k = col("o_orderkey")
    val band = when(k % 3 === 0, "g").when(k % 3 === 1, "r").otherwise("i")
    val srcType = aSchema("diaSource").dataType
    val src = struct(
      (k * 10).as("diaSourceId"), (k % 50).as("diaObjectId"),
      (k % 97).as("visit"), band.as("band"),
      (lit(60000.0) + (k % 1000) * 0.1).as("midpointMjdTai"),
      (lit(100.0) + (k % 5000) * 0.25).cast("float").as("psfFlux"),
      lit(1.0f).as("psfFluxErr"),
      ((k % 50) * 0.01).as("ra"), ((k % 50) * 0.01).as("dec"),
      lit(null).cast("float").as("snr"),
      lit(null).cast("float").as("scienceFlux"),
      lit(null).cast("float").as("scienceFluxErr"),
      lit(null).cast("float").as("extendedness"),
      lit(null).cast("float").as("reliability")).cast(srcType)
    // k % 50 != 0 keeps every derived id off the bad-row set (P5
    // rejects id 0: k = 0 would make diasourceid 0 AND diaobjectid 0;
    // any k % 50 = 0 makes diaobjectid 0) — rejection has its own spec,
    // this entry oracles the merge pipeline
    val alerts = orders(s, d).filter(k % 37 === 0 && k % 50 =!= 0).select(
      k.as("alertId"), src.as("diaSource"),
      lit(null).cast(aSchema("prvDiaSources").dataType).as("prvDiaSources"),
      lit(null).cast(aSchema("prvDiaForcedSources").dataType).as("prvDiaForcedSources"),
      struct((k % 50).as("diaObjectId"), ((k % 50) * 0.01).as("ra"),
        ((k % 50) * 0.01).as("dec")).as("diaObject"),
      lit(null).cast("binary").as("cutoutDifference"),
      lit(null).cast("binary").as("cutoutScience"),
      lit(null).cast("binary").as("cutoutTemplate"),
      lit(null).cast(aSchema("classifications").dataType).as("classifications"))
    // producer-encoded wire bytes; bounded collect (|orders|/37 — a
    // consume batch, ~400 messages at sf0.01)
    val wire = AvroAlerts.encode(s, alerts).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val prefix = Array[Byte](0, 0, 0, 0, 42) // Confluent magic + schema id
    val queue = "st4-" + java.util.UUID.randomUUID().toString
    def pub(rows: Seq[(Long, Array[Byte])]): Unit = rows.foreach { case (_, v) =>
      PubSubLikeSource.publish(queue, "lsst-alerts", null, prefix ++ v) }
    val (w1, w2) = wire.toSeq.partition(_._1 % 2 == 1)

    val tmp = java.nio.file.Files.createTempDirectory("st4").toString
    val store = new SilverStore(s"$tmp/silver")
    try {
      pub(w1)
      val q = PubSubLikeSource.readStream(s, queue, numPartitions = 4)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val decoded = Brokers.decode(s,
            batch.select(col("topic"), col("value")), "value",
            Brokers.ConfluentWire)
          val w = AlertStream.wrangle(decoded, "bpv-ps", "Pitt-Google", "lsst-alerts")
          val staged = Seq(w.objects, w.sources, w.forced, w.sourcesExtra,
            w.forcedExtra, w.brokerinfo, w.thumbnails)
          staged.foreach(_.persist())
          try {
            val (_, deltas) = graft.merge.SourceImporter.importBatchWithDeltas(
              store.load(s), w.objects, w.sources, w.forced,
              stagedSourcesExtra = Some(w.sourcesExtra),
              stagedForcedExtra = Some(w.forcedExtra),
              stagedBrokerinfo = Some(w.brokerinfo),
              stagedThumbnails = Some(w.thumbnails))
            store.saveDelta(deltas)
          } finally staged.foreach(_.unpersist())
        }
        .start()
      try {
        q.processAllAvailable()
        pub(w2)
        pub(w1.take(10)) // at-least-once: wave 1's head redelivered
        q.processAllAvailable()
      } finally q.stop() // a failed merge must not leave a live stream thread
      store.load(s).diasource
        .select(col("diasourceid"), col("diaobjectid"), col("visit"),
          col("band"), col("midpointmjdtai"), col("psfflux"))
        .orderBy("diasourceid")
        .localCheckpoint(true)
    } finally {
      graft.util.Local.deleteRecursively(tmp)
      PubSubLikeSource.clear(queue)
    }
  }

  val st4Sql: String =
    """SELECT o_orderkey * 10 AS diasourceid,
      |  o_orderkey % 50 AS diaobjectid,
      |  o_orderkey % 97 AS visit,
      |  CASE o_orderkey % 3 WHEN 0 THEN 'g' WHEN 1 THEN 'r' ELSE 'i' END AS band,
      |  60000.0 + (o_orderkey % 1000) * 0.1 AS midpointmjdtai,
      |  CAST(100.0 + (o_orderkey % 5000) * 0.25 AS FLOAT) AS psfflux
      |FROM orders WHERE o_orderkey % 37 = 0 AND o_orderkey % 50 != 0
      |ORDER BY diasourceid""".stripMargin

  // ---- a22: the lightcurve API path end-to-end ----------------------

  /** A deterministically derived FASTDB catalog for driving
    * [[graft.api.LtcvApi]] under the oracle. Engineered identity
    * pathology (reference src/ltcv.py:474-493 / conftest.py:273-296):
    * rootid = 'r' || (diaobjectid % 150), so every root below r100 has
    * 2-3 member diaobjectids — the split-identity shape objid
    * expansion exists for. Every payload column is a pure function of
    * the dedup ordering key (diasourceid), so the synthetic lineitem's
    * duplicate (orderkey, linenumber) pairs produce IDENTICAL rows and
    * the A1 argmax tiebreak stays total (a1PriorityDedup's note).
    * Detections drop k%7=0 rows and forced keeps k%7<=3, so the patch
    * join sees all three categories (k%7 in 1-3: both; 4-6:
    * detection-only ispatch; 0: forced-only) — the subset moduli must
    * be COPRIME to 400, or membership would be a function of
    * diaobjectid and whole cohorts would lose one side (k%2 was: 400
    * is even, so odd roots never had forced rows). All derived doubles
    * sit on exact 0.1/0.25 lattices computed by one IEEE op order in
    * both engines. */
  private[queries] def apiCatalog(s: SparkSession, d: String): graft.query.Catalog = {
    val k = col("l_orderkey") * 10 + col("l_linenumber")
    val sfx = col("l_suppkey") % 3
    val band = when(k % 3 === 0, "g").when(k % 3 === 1, "r").otherwise("i")
    def phot(idName: String, fluxShift: Double) = lineitem(s, d).select(
      (k * 3 + sfx).as(idName),
      concat(lit("bpv"), sfx.cast("string")).as("base_procver_id"),
      (k % 400).as("diaobjectid"),
      (k % 97).as("visit"),
      band.as("band"),
      (lit(60000.0) + (k % 1000) * 0.1).as("midpointmjdtai"),
      (lit(fluxShift) + (k % 5000) * 0.25 + sfx).as("psfflux"),
      (lit(1.0) + (k % 50) * 0.5).as("psffluxerr"),
      ((k % 360) + sfx * 0.001).as("ra"),
      ((k % 170) - lit(85.0) + sfx * 0.001).as("dec"))
    val dia = orders(s, d).select(
      (col("o_orderkey") % 400).as("diaobjectid"),
      concat(lit("r"), ((col("o_orderkey") % 400) % 150).cast("string")).as("rootid"),
      concat(lit("bpv"), (col("o_orderkey") % 3).cast("string")).as("base_procver_id"))
    val tables = Seq("diaobject", "diasource", "diaforcedsource")
    val dims = graft.procver.ProcVer.fromRows(s,
      basePv = for (i <- 0 to 2; t <- tables) yield (s"bpv$i", s"bpv$i", t),
      pv = Seq(("pv", "pv")),
      links = for (i <- 0 to 2; t <- tables) yield ("pv", s"bpv$i", t, i),
      aliases = Nil)
    graft.query.Catalog(
      rootDiaobject = dia.select("rootid").distinct(),
      diaobject = dia,
      diaobjectPosition = s.emptyDataFrame,
      diasource = phot("diasourceid", 100.0).filter(k % 7 =!= 0),
      diaforcedsource = phot("diaforcedsourceid", 1100.0).filter(k % 7 <= 3),
      dims = dims)
  }

  /** SQL spellings of [[apiCatalog]]'s derivations (shared by the a22
    * oracle). */
  private val apiDsSql =
    """SELECT (l_orderkey*10 + l_linenumber)*3 + l_suppkey%3 AS pid,
      |  'bpv' || CAST(l_suppkey%3 AS VARCHAR) AS base_procver_id,
      |  (l_orderkey*10 + l_linenumber) % 400 AS diaobjectid,
      |  (l_orderkey*10 + l_linenumber) % 97 AS visit,
      |  CASE (l_orderkey*10 + l_linenumber) % 3
      |    WHEN 0 THEN 'g' WHEN 1 THEN 'r' ELSE 'i' END AS band,
      |  60000.0 + ((l_orderkey*10 + l_linenumber) % 1000) * 0.1 AS midpointmjdtai,
      |  ((l_orderkey*10 + l_linenumber) % 5000) * 0.25 + l_suppkey%3 AS fluxbase,
      |  1.0 + ((l_orderkey*10 + l_linenumber) % 50) * 0.5 AS psffluxerr,
      |  ((l_orderkey*10 + l_linenumber) % 360) + l_suppkey%3 * 0.001 AS ra,
      |  ((l_orderkey*10 + l_linenumber) % 170) - 85.0 + l_suppkey%3 * 0.001 AS dec,
      |  l_orderkey*10 + l_linenumber AS k
      |FROM lineitem""".stripMargin

  /** GET /ltcv/getltcv for a mixed id request (3 diaobjectids + 1
    * rootid) through the REAL API stack: objid expansion to rootid
    * cohorts (split identity: each requested id pulls in its root's
    * other members), per-table A1 priority dedup of detections AND
    * forced photometry, J2 patch join, time-travel + band cuts pushed
    * to the scans, ordered lightcurve out — the src/ltcv.py:294-924
    * path as one call. */
  def a22ManyLtcvs(s: SparkSession, d: String): DataFrame =
    graft.api.LtcvApi.getLtcvs(apiCatalog(s, d), "pv",
        diaobjectids = Seq(7L, 160L, 311L), rootids = Seq("r5"),
        mjdNow = Some(60075.05), bands = Seq("g", "r"), whichPhot = "patch")
      .select(col("rootid"), col("visit"), col("band"),
        col("midpointmjdtai"), col("psfflux"), col("psffluxerr"),
        col("diaobjectid"), col("detflux"), col("detfluxerr"),
        col("isdet"), col("ispatch"))
      .orderBy("rootid", "midpointmjdtai", "visit")

  val a22Sql: String =
    s"""WITH ph AS ($apiDsSql),
       |ds AS (SELECT pid AS diasourceid, base_procver_id, diaobjectid,
       |         visit, band, midpointmjdtai,
       |         100.0 + fluxbase AS psfflux, psffluxerr
       |       FROM ph WHERE k % 7 != 0
       |         AND midpointmjdtai <= 60075.05 AND band IN ('g','r')),
       |fs AS (SELECT pid AS diaforcedsourceid, base_procver_id, diaobjectid,
       |         visit, band, midpointmjdtai,
       |         1100.0 + fluxbase AS psfflux, psffluxerr
       |       FROM ph WHERE k % 7 <= 3
       |         AND midpointmjdtai <= 60075.05 AND band IN ('g','r')),
       |objmap AS (SELECT DISTINCT o_orderkey % 400 AS diaobjectid,
       |    'r' || CAST((o_orderkey % 400) % 150 AS VARCHAR) AS rootid
       |  FROM orders),
       |wanted AS (SELECT DISTINCT rootid FROM objmap
       |  WHERE diaobjectid IN (7, 160, 311) OR rootid IN ('r5')),
       |ids AS (SELECT m.diaobjectid, m.rootid
       |  FROM objmap m JOIN wanted w USING (rootid)),
       |src AS (SELECT * FROM (
       |    SELECT d.*, i.rootid,
       |      ROW_NUMBER() OVER (PARTITION BY i.rootid, d.visit
       |        ORDER BY CAST(SUBSTR(d.base_procver_id, 4) AS INT) DESC,
       |                 d.diasourceid DESC) AS rn
       |    FROM ds d JOIN ids i USING (diaobjectid))
       |  WHERE rn = 1),
       |fps AS (SELECT * FROM (
       |    SELECT f.*, i.rootid,
       |      ROW_NUMBER() OVER (PARTITION BY i.rootid, f.visit
       |        ORDER BY CAST(SUBSTR(f.base_procver_id, 4) AS INT) DESC,
       |                 f.diaforcedsourceid DESC) AS rn
       |    FROM fs f JOIN ids i USING (diaobjectid))
       |  WHERE rn = 1)
       |SELECT COALESCE(f.rootid, s.rootid) AS rootid,
       |  COALESCE(f.visit, s.visit) AS visit,
       |  COALESCE(f.band, s.band) AS band,
       |  COALESCE(f.midpointmjdtai, s.midpointmjdtai) AS midpointmjdtai,
       |  COALESCE(f.psfflux, s.psfflux) AS psfflux,
       |  COALESCE(f.psffluxerr, s.psffluxerr) AS psffluxerr,
       |  COALESCE(f.diaobjectid, s.diaobjectid) AS diaobjectid,
       |  s.psfflux AS detflux, s.psffluxerr AS detfluxerr,
       |  s.rootid IS NOT NULL AS isdet,
       |  (s.rootid IS NOT NULL AND f.rootid IS NULL) AS ispatch
       |FROM fps f FULL OUTER JOIN src s
       |  ON f.rootid = s.rootid AND f.visit = s.visit
       |ORDER BY rootid, midpointmjdtai, visit""".stripMargin

  // ---- A23: object-info API (both weighted-position modes) ----------

  /** diaobject_position rows derived from part: one row per
    * (diaobjectid, base_procver) with ra/dec functions of that pair
    * alone (so re-occurrences dedup to identical rows), covering only
    * ids with `id % 5 != 4` — and members of one root share `id % 5`
    * (150 ≡ 0 mod 5), so roots with `N % 5 == 4` have NO stored
    * position at any SF and must take the weighted-source fallback. */
  private def apiPositions(s: SparkSession, d: String): DataFrame = {
    val m = col("p_partkey") % 400
    val pv = col("p_partkey") % 3
    part(s, d).select(
        m.as("diaobjectid"),
        concat(lit("bpv"), pv.cast("string")).as("base_procver_id"),
        (((m * 3 + pv) % 3600) * 0.1).as("ra"),
        (((m * 7 + pv) % 1700) * 0.1 - lit(85.0)).as("dec"))
      .filter(col("diaobjectid") % 5 =!= 4)
      .distinct()
  }

  private val apiPosSql =
    """SELECT DISTINCT p_partkey % 400 AS diaobjectid,
      |  'bpv' || CAST(p_partkey % 3 AS VARCHAR) AS base_procver_id,
      |  ((p_partkey % 400) * 3 + p_partkey % 3) % 3600 * 0.1 AS ra,
      |  ((p_partkey % 400) * 7 + p_partkey % 3) % 1700 * 0.1 - 85.0 AS dec
      |FROM part WHERE (p_partkey % 400) % 5 != 4""".stripMargin

  /** GET /ltcv/getobjectinfos (src/ltcv.py:38-291) through the REAL
    * API both ways at once: `useWeightedSourcePositions` (stored
    * diaobject_position first — highest-priority version per member,
    * first non-null per root — with the (S/N)²-weighted detection
    * fallback for roots with no stored position) joined against
    * `alwaysUseWeightedSourcePositions` (stored positions ignored
    * entirely). The request mixes diaobjectids and rootids and
    * includes roots on BOTH fallback sides (r4/r29-class roots have
    * no stored positions by construction). Member-id arrays render as
    * sorted comma-joined strings (the s8 rule). */
  def a23ObjectInfos(s: SparkSession, d: String): DataFrame = {
    val cat = apiCatalog(s, d).copy(diaobjectPosition = apiPositions(s, d))
    val objids = Seq(3L, 158L, 304L)
    val roots = Seq("r7", "r29")
    val a = graft.api.LtcvApi.getObjectInfos(cat, "pv",
      diaobjectids = objids, rootids = roots, useWeightedSourcePositions = true)
    val b = graft.api.LtcvApi.getObjectInfos(cat, "pv",
      diaobjectids = objids, rootids = roots, alwaysUseWeightedSourcePositions = true)
    a.select(col("rootid"),
        concat_ws(",", col("diaobjectids")).as("member_ids"),
        size(col("diaobjectids")).cast("long").as("n_objs"),
        Num.rnd0(col("ra"), 6).as("ra"), Num.rnd0(col("dec"), 6).as("dec"),
        Num.rnd0(col("rastd"), 6).as("rastd"),
        Num.rnd0(col("decstd"), 6).as("decstd"),
        Num.rnd0(col("ra_dec_cov"), 6).as("cov"))
      .join(b.select(col("rootid"),
        Num.rnd0(col("ra"), 6).as("ra_w"), Num.rnd0(col("dec"), 6).as("dec_w"),
        Num.rnd0(col("rastd"), 6).as("rastd_w"),
        Num.rnd0(col("decstd"), 6).as("decstd_w"),
        Num.rnd0(col("ra_dec_cov"), 6).as("cov_w")), Seq("rootid"))
      .orderBy("rootid")
  }

  val a23Sql: String =
    s"""WITH ph AS ($apiDsSql),
       |pos AS ($apiPosSql),
       |objmap AS (SELECT DISTINCT o_orderkey % 400 AS diaobjectid,
       |    'r' || CAST((o_orderkey % 400) % 150 AS VARCHAR) AS rootid
       |  FROM orders),
       |wanted AS (SELECT DISTINCT rootid FROM objmap
       |  WHERE diaobjectid IN (3, 158, 304) OR rootid IN ('r7', 'r29')),
       |ids AS (SELECT m.diaobjectid, m.rootid
       |  FROM objmap m JOIN wanted w USING (rootid)),
       |bestpos AS (SELECT diaobjectid, ra, dec FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY diaobjectid
       |      ORDER BY CAST(SUBSTR(base_procver_id, 4) AS INT) DESC,
       |               base_procver_id DESC) AS rn FROM pos) WHERE rn = 1),
       |rootpos AS (SELECT rootid, ra, dec FROM (
       |    SELECT i.rootid, p.ra, p.dec,
       |      ROW_NUMBER() OVER (PARTITION BY i.rootid
       |        ORDER BY (p.ra IS NULL), i.diaobjectid) AS rn
       |    FROM ids i LEFT JOIN bestpos p USING (diaobjectid)) WHERE rn = 1),
       |members AS (SELECT rootid,
       |    array_to_string(list_sort(list(diaobjectid)), ',') AS member_ids,
       |    CAST(COUNT(*) AS BIGINT) AS n_objs
       |  FROM ids GROUP BY rootid),
       |ds AS (SELECT pid AS srcid, base_procver_id, diaobjectid, visit,
       |    midpointmjdtai, 100.0 + fluxbase AS psfflux, psffluxerr, ra, dec
       |  FROM ph WHERE k % 7 != 0),
       |src AS (SELECT * FROM (SELECT d.*, i.rootid, ROW_NUMBER() OVER (
       |      PARTITION BY i.rootid, d.visit
       |      ORDER BY CAST(SUBSTR(d.base_procver_id, 4) AS INT) DESC,
       |               d.srcid DESC) AS rn
       |    FROM ds d JOIN ids i USING (diaobjectid)) WHERE rn = 1),
       |wp AS (SELECT rootid,
       |    SUM(w * ra) / SUM(w) AS wra,
       |    SUM(w * dec) / SUM(w) AS wdec,
       |    SQRT(GREATEST(SUM(w * ra * ra) / SUM(w)
       |      - POWER(SUM(w * ra) / SUM(w), 2), 0)) AS wrastd,
       |    SQRT(GREATEST(SUM(w * dec * dec) / SUM(w)
       |      - POWER(SUM(w * dec) / SUM(w), 2), 0)) AS wdecstd,
       |    SUM(w * ra * dec) / SUM(w)
       |      - SUM(w * ra) * SUM(w * dec) / (SUM(w) * SUM(w)) AS wcov
       |  FROM (SELECT rootid, ra, dec, POWER(psfflux / psffluxerr, 2) AS w
       |        FROM src WHERE psfflux / psffluxerr > 3)
       |  GROUP BY rootid)
       |SELECT m.rootid, m.member_ids, m.n_objs,
       |  ROUND(COALESCE(r.ra, w.wra), 6) + 0.0 AS ra,
       |  ROUND(COALESCE(r.dec, w.wdec), 6) + 0.0 AS dec,
       |  ROUND(CASE WHEN r.ra IS NULL THEN w.wrastd END, 6) + 0.0 AS rastd,
       |  ROUND(CASE WHEN r.ra IS NULL THEN w.wdecstd END, 6) + 0.0 AS decstd,
       |  ROUND(CASE WHEN r.ra IS NULL THEN w.wcov END, 6) + 0.0 AS cov,
       |  ROUND(w.wra, 6) + 0.0 AS ra_w, ROUND(w.wdec, 6) + 0.0 AS dec_w,
       |  ROUND(w.wrastd, 6) + 0.0 AS rastd_w,
       |  ROUND(w.wdecstd, 6) + 0.0 AS decstd_w,
       |  ROUND(w.wcov, 6) + 0.0 AS cov_w
       |FROM members m
       |LEFT JOIN rootpos r USING (rootid)
       |LEFT JOIN wp w USING (rootid)
       |ORDER BY rootid""".stripMargin

  // ---- SP1: the full spectrum-cycle workflow -------------------------

  /** Spectrum-request tables derived from customer/supplier/nation:
    * multiple wants per (root, requester) at sf≥0.01 so the
    * DISTINCT-ON step has real work; claims and reported spectra hit
    * a subset of roots so both anti-joins cut. */
  private def sp1Wanted(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      concat(lit("r"), (col("c_custkey") % 150).cast("string")).as("root_diaobject_id"),
      (col("c_custkey") % 5 === 0).as("is_host"),
      ((col("c_custkey") % 360) + lit(0.25)).as("ra"),
      ((col("c_custkey") % 170) - lit(85.0) + lit(0.25)).as("dec"),
      concat(lit("req"), (col("c_custkey") % 3).cast("string")).as("requester"),
      (col("c_custkey") % 7).as("priority"),
      (lit(60000.0) + ((col("c_custkey") * 13) % 700) * 0.1).as("wanttime"))

  private val sp1WantedSql =
    """SELECT 'r' || CAST(c_custkey % 150 AS VARCHAR) AS root_diaobject_id,
      |  (c_custkey % 5 = 0) AS is_host,
      |  (c_custkey % 360) + 0.25 AS ra,
      |  (c_custkey % 170) - 85.0 + 0.25 AS dec,
      |  'req' || CAST(c_custkey % 3 AS VARCHAR) AS requester,
      |  c_custkey % 7 AS priority,
      |  60000.0 + ((c_custkey * 13) % 700) * 0.1 AS wanttime
      |FROM customer""".stripMargin

  /** GET /spectrum/spectrawanted — the FULL what_spectra_are_wanted
    * report (src/spectrum.py:23-334) with EVERY filter engaged at
    * once: wanttime window + claim anti-join (plantime > 60040) +
    * reported-spectrum anti-join (mjd in [60030, now]) + limiting
    * magnitude 25.8 on the newest point (forced-wins-if-newer) +
    * detection since 60010, over the a22 catalog's photometry with
    * procver priority dedup, through [[graft.api.Spectrum
    * .wantedSpectraReport]]. Weighted mean positions round at 6 dp
    * with sign-of-zero canonicalized (dec straddles 0); mags at 6 dp
    * (a single log10 per value — only 1-ulp libm noise). */
  def sp1WantedSpectra(s: SparkSession, d: String): DataFrame = {
    val planned = supplier(s, d).select(
      concat(lit("r"), (col("s_suppkey") % 150).cast("string")).as("root_diaobject_id"),
      (col("s_suppkey") % 2 === 0).as("is_host"),
      (lit(60000.0) + ((col("s_suppkey") * 11) % 800) * 0.1).as("plantime"))
    val info = nation(s, d).select(
      concat(lit("r"), ((col("n_nationkey") * 7) % 150).cast("string")).as("root_diaobject_id"),
      (col("n_nationkey") % 2 === 0).as("is_host"),
      (lit(60000.0) + col("n_nationkey") * 3.0).as("mjd"))
    graft.api.Spectrum.wantedSpectraReport(
        apiCatalog(s, d), "pv", sp1Wanted(s, d), planned, info,
        mjdNow = 60068.0, wantSince = Some(60005.0),
        notClaimSince = Some(60040.0), noSpecSince = Some(60030.0),
        detSince = Some(60010.0), limMag = Some(25.8))
      .select(col("root_diaobject_id"), col("requester"), col("priority"),
        col("wanttime"), col("diaobjectid"), col("is_host"),
        col("ra"), col("dec"),
        Num.rnd0(col("diaobj_meanra"), 6).as("diaobj_meanra"),
        Num.rnd0(col("diaobj_meandec"), 6).as("diaobj_meandec"),
        col("src_mjd"), col("src_band"), round(col("src_mag"), 6).as("src_mag"),
        col("frced_mjd"), col("frced_band"),
        round(col("frced_mag"), 6).as("frced_mag"))
      .orderBy("root_diaobject_id", "requester", "is_host")
  }

  val sp1Sql: String =
    s"""WITH ph AS ($apiDsSql),
       |wtab AS ($sp1WantedSql),
       |ptab AS (SELECT 'r' || CAST(s_suppkey % 150 AS VARCHAR) AS root_diaobject_id,
       |    (s_suppkey % 2 = 0) AS is_host,
       |    60000.0 + ((s_suppkey * 11) % 800) * 0.1 AS plantime
       |  FROM supplier),
       |itab AS (SELECT 'r' || CAST((n_nationkey * 7) % 150 AS VARCHAR) AS root_diaobject_id,
       |    (n_nationkey % 2 = 0) AS is_host,
       |    60000.0 + n_nationkey * 3.0 AS mjd
       |  FROM nation),
       |objmap AS (SELECT DISTINCT o_orderkey % 400 AS diaobjectid,
       |    'r' || CAST((o_orderkey % 400) % 150 AS VARCHAR) AS rootid
       |  FROM orders),
       |lw AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY root_diaobject_id, requester, is_host
       |      ORDER BY wanttime DESC, priority DESC, ra DESC, dec DESC) AS rn
       |    FROM wtab WHERE wanttime <= 60068.0 AND wanttime >= 60005.0)
       |  WHERE rn = 1),
       |nospec AS (SELECT w.* FROM lw w
       |  WHERE NOT EXISTS (SELECT 1 FROM ptab p
       |      WHERE p.root_diaobject_id = w.root_diaobject_id
       |        AND p.is_host = w.is_host AND p.plantime > 60040.0)
       |    AND NOT EXISTS (SELECT 1 FROM itab i
       |      WHERE i.root_diaobject_id = w.root_diaobject_id
       |        AND i.is_host = w.is_host AND i.mjd >= 60030.0 AND i.mjd <= 60068.0)),
       |ids AS (SELECT m.diaobjectid, m.rootid FROM objmap m
       |  WHERE m.rootid IN (SELECT DISTINCT root_diaobject_id FROM nospec)),
       |ds AS (SELECT pid AS srcid, base_procver_id, diaobjectid, visit, band,
       |    midpointmjdtai, 100.0 + fluxbase AS psfflux, psffluxerr, ra, dec
       |  FROM ph WHERE k % 7 != 0 AND midpointmjdtai <= 60068.0),
       |fs AS (SELECT pid AS srcid, base_procver_id, diaobjectid, visit, band,
       |    midpointmjdtai, 1100.0 + fluxbase AS psfflux, psffluxerr
       |  FROM ph WHERE k % 7 <= 3 AND midpointmjdtai <= 60068.0),
       |src AS (SELECT * FROM (SELECT d.*, i.rootid, ROW_NUMBER() OVER (
       |      PARTITION BY i.rootid, d.visit
       |      ORDER BY CAST(SUBSTR(d.base_procver_id, 4) AS INT) DESC,
       |               d.srcid DESC) AS rn
       |    FROM ds d JOIN ids i USING (diaobjectid)) WHERE rn = 1),
       |fps AS (SELECT * FROM (SELECT f.*, i.rootid, ROW_NUMBER() OVER (
       |      PARTITION BY i.rootid, f.visit
       |      ORDER BY CAST(SUBSTR(f.base_procver_id, 4) AS INT) DESC,
       |               f.srcid DESC) AS rn
       |    FROM fs f JOIN ids i USING (diaobjectid)) WHERE rn = 1),
       |sb AS (SELECT rootid, band, midpointmjdtai AS mjd,
       |    CASE WHEN psfflux > 0 THEN -2.5 * LOG10(psfflux) + 31.4
       |         ELSE 99.0 END AS mag
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rootid, band
       |      ORDER BY midpointmjdtai DESC, srcid DESC) AS brn FROM src)
       |  WHERE brn = 1),
       |fb AS (SELECT rootid, band, midpointmjdtai AS mjd,
       |    CASE WHEN psfflux > 0 THEN -2.5 * LOG10(psfflux) + 31.4
       |         ELSE 99.0 END AS mag
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rootid, band
       |      ORDER BY midpointmjdtai DESC, srcid DESC) AS brn FROM fps)
       |  WHERE brn = 1),
       |sl AS (SELECT rootid, mjd AS src_mjd, band AS src_band, mag AS src_mag
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rootid
       |      ORDER BY mjd DESC, band DESC) AS arn FROM sb) WHERE arn = 1),
       |fl AS (SELECT rootid, mjd AS frced_mjd, band AS frced_band, mag AS frced_mag
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rootid
       |      ORDER BY mjd DESC, band DESC) AS arn FROM fb) WHERE arn = 1),
       |lim AS (SELECT COALESCE(s.rootid, f.rootid) AS rootid
       |  FROM sl s FULL OUTER JOIN fl f ON s.rootid = f.rootid
       |  WHERE (CASE WHEN (s.src_mag IS NULL AND f.frced_mag IS NOT NULL)
       |           OR (s.src_mag IS NOT NULL AND f.frced_mag IS NOT NULL
       |               AND f.frced_mjd > s.src_mjd)
       |         THEN f.frced_mag ELSE s.src_mag END) <= 25.8),
       |wp AS (SELECT rootid,
       |    ROUND(SUM(w * ra) / SUM(w), 6) + 0.0 AS diaobj_meanra,
       |    ROUND(SUM(w * dec) / SUM(w), 6) + 0.0 AS diaobj_meandec
       |  FROM (SELECT rootid, ra, dec, POWER(psfflux / psffluxerr, 2) AS w
       |        FROM src WHERE psfflux / psffluxerr > 3)
       |  GROUP BY rootid),
       |oi AS (SELECT i.rootid, MIN(i.diaobjectid) AS diaobjectid
       |  FROM ids i GROUP BY i.rootid)
       |SELECT n.root_diaobject_id, n.requester, n.priority, n.wanttime,
       |  oi.diaobjectid, n.is_host, n.ra, n.dec,
       |  wp.diaobj_meanra, wp.diaobj_meandec,
       |  s.src_mjd, s.src_band, ROUND(s.src_mag, 6) AS src_mag,
       |  f.frced_mjd, f.frced_band, ROUND(f.frced_mag, 6) AS frced_mag
       |FROM nospec n
       |JOIN lim ON lim.rootid = n.root_diaobject_id
       |JOIN (SELECT * FROM sl WHERE src_mjd >= 60010.0) s
       |  ON s.rootid = n.root_diaobject_id
       |LEFT JOIN fl f ON f.rootid = n.root_diaobject_id
       |LEFT JOIN oi ON oi.rootid = n.root_diaobject_id
       |LEFT JOIN wp ON wp.rootid = n.root_diaobject_id
       |ORDER BY root_diaobject_id, requester, is_host""".stripMargin

  // ---- SP2: spectrum-info search --------------------------------------

  /** Full spectruminfo table derived from orders: nullable z/classid
    * (the reference's _nullcheck'd optional fields), four facilities,
    * three classes — so every predicate kind in the searchspec has
    * rows on both sides. */
  private def sp1SpecInfoFull(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey").as("specinfo_id"),
      concat(lit("r"), (col("o_orderkey") % 150).cast("string")).as("root_diaobject_id"),
      when(col("o_orderkey") % 4 === 0, "keck-lris")
        .when(col("o_orderkey") % 4 === 1, "gemini-gmos")
        .when(col("o_orderkey") % 4 === 2, "vlt-xshooter")
        .otherwise("palomar-dbsp").as("facility"),
      (lit(60000.0) + (col("o_orderkey") % 500) * 0.2).as("mjd"),
      when(col("o_orderkey") % 11 === 0, lit(null).cast("double"))
        .otherwise((col("o_orderkey") % 80) * 0.01).as("z"),
      when(col("o_orderkey") % 13 === 0, lit(null).cast("long"))
        .otherwise(lit(2220L) + col("o_orderkey") % 6).as("classid"),
      concat(lit("SN "), when(col("o_orderkey") % 3 === 0, "Ia")
        .when(col("o_orderkey") % 3 === 1, "II").otherwise("Ibc"))
        .as("class_description"),
      (col("o_orderkey") % 7 === 0).as("is_host"),
      (lit(60050.0) + (col("o_orderkey") % 300) * 0.3).as("inserted_at"))

  private val sp2InfoSql =
    """SELECT o_orderkey AS specinfo_id,
      |  'r' || CAST(o_orderkey % 150 AS VARCHAR) AS root_diaobject_id,
      |  CASE o_orderkey % 4 WHEN 0 THEN 'keck-lris' WHEN 1 THEN 'gemini-gmos'
      |    WHEN 2 THEN 'vlt-xshooter' ELSE 'palomar-dbsp' END AS facility,
      |  60000.0 + (o_orderkey % 500) * 2e-1 AS mjd,
      |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |    ELSE (o_orderkey % 80) * 1e-2 END AS z,
      |  CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |    ELSE 2220 + o_orderkey % 6 END AS classid,
      |  'SN ' || CASE o_orderkey % 3 WHEN 0 THEN 'Ia' WHEN 1 THEN 'II'
      |    ELSE 'Ibc' END AS class_description,
      |  (o_orderkey % 7 = 0) AS is_host,
      |  60050.0 + (o_orderkey % 300) * 3e-1 AS inserted_at
      |FROM orders""".stripMargin

  /** GET /spectrum/getknownspectruminfo (src/spectrum.py:342-386)
    * through the REAL SearchSpec builder with every predicate kind at
    * once: substr OR-list on facility, minmax window on mjd, max on
    * nullable z (NULL comparisons drop rows identically in both
    * engines), isin on nullable classid, equality on is_host, and the
    * reference's `since` backwards-compat alias (→ inserted_at_min). */
  def sp2SpectrumInfoSearch(s: SparkSession, d: String): DataFrame =
    graft.api.Spectrum.getSpectrumInfo(sp1SpecInfoFull(s, d), Map(
        "facility_contains" -> Seq("keck", "gemini"),
        "mjd_min" -> 60020.0, "mjd_max" -> 60090.0,
        "z_max" -> 0.5,
        "classid" -> Seq(2221L, 2223L, 2224L),
        "is_host" -> false,
        "since" -> 60060.0))
      .orderBy("specinfo_id")

  val sp2Sql: String =
    s"""WITH si AS ($sp2InfoSql)
       |SELECT * FROM si
       |WHERE (facility LIKE '%keck%' OR facility LIKE '%gemini%')
       |  AND mjd >= 60020.0 AND mjd <= 60090.0
       |  AND z <= 0.5
       |  AND classid IN (2221, 2223, 2224)
       |  AND is_host = FALSE
       |  AND inserted_at >= 60060.0
       |ORDER BY specinfo_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a10_first_seen" -> (a10FirstSeen _),
    "a11_keep_existing" -> (a11KeepExisting _),
    "s9_unsent_alerts" -> (s9UnsentAlerts _),
    "hg1_host_match" -> (hg1HostMatch _),
    "b1_brokerinfo" -> (b1BrokerInfo _),
    "a1_priority_dedup" -> (a1PriorityDedup _),
    "j2_patch_join" -> (j2PatchJoin _),
    "a2_objstats" -> (a2ObjStats _),
    "a13_ltcv_features" -> (a13LtcvFeatures _),
    "w5_binned_ltcv" -> (w5BinnedLtcv _),
    "w6_rolling_ltcv" -> (w6RollingLtcv _),
    "a14_phase_fold" -> (a14PhaseFold _),
    "a15_cadence" -> (a15Cadence _),
    "a16_structure_func" -> (a16StructureFunc _),
    "a17_periodogram" -> (a17Periodogram _),
    "a18_eta_variability" -> (a18EtaVariability _),
    "a19_lomb_scargle" -> (a19LombScargle _),
    "a20_color" -> (a20Color _),
    "w9_interp_grid" -> (w9InterpGrid _),
    "a21_stetson" -> (a21Stetson _),
    "a22_many_ltcvs" -> (a22ManyLtcvs _),
    "a23_object_infos" -> (a23ObjectInfos _),
    "sp1_wanted_spectra" -> (sp1WantedSpectra _),
    "sp2_spectrum_info" -> (sp2SpectrumInfoSearch _),
    "st4_pubsub_alerts" -> (st4PubsubAlerts _),
    "a4_rollup" -> (a4Rollup _),
    "a12_coalesce_merge" -> (a12CoalesceMerge _),
    "a7_weighted_pos" -> (a7WeightedPos _),
    "a9_latest_per_group" -> (a9LatestPerGroup _),
    "j6_cone_join" -> (j6ConeJoin _),
    "s1_snana_load" -> (s1SnanaLoad _),
    "s2_dp1_load" -> (s2Dp1Load _),
    "t6_hot_window" -> (t6HotWindow _))

  def oracles: Map[String, String] = Map(
    "a10_first_seen" -> a10Sql,
    "a11_keep_existing" -> a11Sql,
    "s9_unsent_alerts" -> s9Sql,
    "hg1_host_match" -> hg1Sql,
    "b1_brokerinfo" -> b1Sql,
    "a1_priority_dedup" -> a1Sql,
    "j2_patch_join" -> j2Sql,
    "a2_objstats" -> a2Sql,
    "a13_ltcv_features" -> a13Sql,
    "w5_binned_ltcv" -> w5Sql,
    "w6_rolling_ltcv" -> w6Sql,
    "a14_phase_fold" -> a14Sql,
    "a15_cadence" -> a15Sql,
    "a16_structure_func" -> a16Sql,
    "a17_periodogram" -> a17Sql,
    "a18_eta_variability" -> a18Sql,
    "a19_lomb_scargle" -> a19Sql,
    "a20_color" -> a20Sql,
    "w9_interp_grid" -> w9Sql,
    "a21_stetson" -> a21Sql,
    "a22_many_ltcvs" -> a22Sql,
    "a23_object_infos" -> a23Sql,
    "sp1_wanted_spectra" -> sp1Sql,
    "sp2_spectrum_info" -> sp2Sql,
    "st4_pubsub_alerts" -> st4Sql,
    "a4_rollup" -> a4Sql,
    "a12_coalesce_merge" -> a12Sql,
    "a7_weighted_pos" -> a7Sql,
    "a9_latest_per_group" -> a9Sql,
    "j6_cone_join" -> j6Sql,
    "s1_snana_load" -> s1Sql,
    "s2_dp1_load" -> s2Sql,
    "t6_hot_window" -> t6Sql)
}
