package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.{Catalog, Ltcv}

/** The lightcurve web-API surface (src/webserver/ltcvapp.py:340-364,
  * server.py:298-311) as library calls. JSON/NaN-stripping serialization
  * is the HTTP layer's concern; these return DataFrames.
  */
object LtcvApi {

  /** GET /ltcv/getltcv — §3.1. `objids` may be diaobjectids (ints) or
    * rootids (uuid strings), exactly like the reference's id sniffing
    * (ltcvapp.py:19-94). */
  def getLtcvs(cat: Catalog, procver: String,
      diaobjectids: Seq[Long] = Nil, rootids: Seq[String] = Nil,
      mjdNow: Option[Double] = None, bands: Seq[String] = Nil,
      whichPhot: String = "patch"): DataFrame =
    Ltcv.objectLtcvs(cat, procver, diaobjectids, rootids, mjdNow, bands, whichPhot)

  /** Per-rootid object info: member diaobjectids + best position
    * (get_object_infos, src/ltcv.py:38-291 — DISTINCT ON + position
    * LEFT JOIN collapsed into one pass). Position: highest-priority
    * diaobject_position row per diaobjectid, then the first per rootid
    * preferring non-null positions (the reference's DISTINCT ON
    * arbitrariness made deterministic).
    *
    * `useWeightedSourcePositions` (src/ltcv.py:826-878): roots whose
    * position is still null after the diaobject_position lookup get the
    * (S/N)²-weighted mean of their detections' positions
    * ([[Ltcv.weightedPositions]], S/N > 3).
    * `alwaysUseWeightedSourcePositions` ignores diaobject_position
    * entirely, exactly like the reference flag. */
  def getObjectInfos(cat: Catalog, procverId: String,
      diaobjectids: Seq[Long] = Nil, rootids: Seq[String] = Nil,
      useWeightedSourcePositions: Boolean = false,
      alwaysUseWeightedSourcePositions: Boolean = false,
      includeHostinfo: Boolean = false): DataFrame = {
    // no ids requested = ALL objects, the same convention getLtcvs
    // uses — previously this path silently returned zero rows
    val ids =
      if (diaobjectids.nonEmpty || rootids.nonEmpty)
        Ltcv.expandObjids(cat, procverId, diaobjectids, rootids)
      else Ltcv.objMap(cat, procverId)
    val prios = cat.dims.priorities(procverId, "diaobject")
    // semi-join FIRST: the best-position aggregate must scan only the
    // requested objects, not the whole catalog (a 3-object request
    // previously shuffled every position row); tiebreak on
    // base_procver_id so equal-priority versions resolve
    // deterministically, like priorityDedup
    val pos = cat.diaobjectPosition
      .join(ids.select("diaobjectid").distinct(), Seq("diaobjectid"), "left_semi")
      .join(broadcast(prios), Seq("base_procver_id"))
      .groupBy("diaobjectid")
      .agg(max_by(struct(col("ra"), col("dec")),
        struct(col("priority"), col("base_procver_id"))).as("_p"))
      .select(col("diaobjectid"), col("_p.ra").as("ra"), col("_p.dec").as("dec"))
    val base = ids.join(pos, Seq("diaobjectid"), "left_outer")
      .groupBy("rootid")
      .agg(sort_array(collect_list(col("diaobjectid"))).as("diaobjectids"),
        min_by(struct(col("ra"), col("dec")),
          struct(col("ra").isNull, col("diaobjectid"))).as("_pos"))
      .select(col("rootid"), col("diaobjectids"),
        col("_pos.ra").as("ra"), col("_pos.dec").as("dec"))
    val positioned =
    if (!(useWeightedSourcePositions || alwaysUseWeightedSourcePositions)) base
    else {
      val known =
        if (alwaysUseWeightedSourcePositions)
          base.withColumn("ra", lit(null).cast("double"))
            .withColumn("dec", lit(null).cast("double"))
        else base
      // weighted positions come from the *same rootids'* deduped
      // detections; `ids` is small (the expanded request), so the
      // photometry scan it semi-joins is the only big input.
      val wp = Ltcv.weightedPositions(
          Ltcv.sources(cat, procverId, objids = Some(ids)))
        .select(col("rootid"), col("ra").as("_wra"), col("dec").as("_wdec"),
          col("rastd").as("_wrastd"), col("decstd").as("_wdecstd"),
          col("ra_dec_cov").as("_wcov"))
      // uncertainty columns exist only on the weighted path (the
      // reference's objinfo carries raerr/decerr/ra_dec_cov alongside
      // ra/dec); rows whose position came from diaobject_position keep
      // them null rather than mixing estimators
      known.join(wp, Seq("rootid"), "left_outer")
        .select(col("rootid"), col("diaobjectids"),
          coalesce(col("ra"), col("_wra")).as("ra"),
          coalesce(col("dec"), col("_wdec")).as("dec"),
          when(col("ra").isNull, col("_wrastd")).as("rastd"),
          when(col("ra").isNull, col("_wdecstd")).as("decstd"),
          when(col("ra").isNull, col("_wcov")).as("ra_dec_cov"))
    }
    if (!includeHostinfo) positioned
    else (cat.hostGalaxy, cat.diaobjectHostMatch) match {
      case (Some(hosts), Some(matches)) =>
        // ltcvapp's include_hostinfo: attach the best (lowest-prio)
        // host's columns per root. Matches are diaobjectid-keyed and
        // span base procvers — restrict to versions under the REQUESTED
        // procver first, like every other path in this call (an
        // experimental version's match must not win the argmax) — then
        // lift to rootid through the expanded id set and argmax once
        // more; both argmaxes are partial-aggregating min_by, no
        // window sort.
        val inProcver = matches.join(
          broadcast(prios.select("base_procver_id")),
          Seq("base_procver_id"), "left_semi")
        val best = graft.host.HostGalaxy.bestHost(inProcver, hosts)
        val perRoot = ids.join(best, Seq("diaobjectid"))
          .groupBy("rootid")
          .agg(min_by(struct(col("host_id"), col("prio"), col("host_ra"),
            col("host_dec"), col("info")),
            struct(col("prio"), col("host_galaxy_id"))).as("_h"))
          .select(col("rootid"),
            col("_h.host_id").as("hostgal_id"),
            col("_h.prio").as("hostgal_prio"),
            col("_h.host_ra").as("hostgal_ra"),
            col("_h.host_dec").as("hostgal_dec"),
            col("_h.info").as("hostgal_info"))
        positioned.join(perRoot, Seq("rootid"), "left_outer")
      // a catalog without a host import returns infos unchanged — the
      // reference errors instead, but absent tables here are a typed
      // None, not a broken deployment
      case _ => positioned
    }
  }

  /** GET a random object (ltcvapp.py:133-145's ORDER BY random()
    * LIMIT 1), seedable for reproducibility. */
  def randomObject(cat: Catalog, procverId: String, seed: Long = -1L): String = {
    val m = Ltcv.objMap(cat, procverId).select("rootid").distinct()
    val shuffled = if (seed >= 0) m.orderBy(rand(seed)) else m.orderBy(rand())
    shuffled.limit(1).collect().headOption
      .getOrElse(throw new NoSuchElementException(
        s"no objects under processing version '$procverId'"))
      .getString(0)
  }

  /** A5 — exact count and optimizer-estimated count of the deduped
    * detections under a procver (server.py:120-203; the estimate path
    * reads plan statistics instead of EXPLAIN json). */
  def countSources(cat: Catalog, procverId: String): (Long, BigInt) = {
    val src = Ltcv.sources(cat, procverId)
    val est = src.queryExecution.optimizedPlan.stats.rowCount
      .getOrElse(BigInt(-1))
    (src.count(), est)
  }
}
