package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** S9 — the alert producer: select not-yet-sent detections,
  * reconstruct full alert packets (source + previous-source and
  * previous-forced windows + object), avro-encode, and mark sent
  * (src/services/projectsim.py:174-268 reconstruct, 423-493
  * find/mark; `ppdb_alerts_sent` db/2025-03-21_001_alert.sql).
  *
  * The reference reconstructs one alert per round-trip (three indexed
  * queries per source); Spark-first, the whole batch reconstructs in
  * two range joins on diaobjectid (the J7 shape: equi-key shuffle +
  * mjd window predicate, AQE-splittable) and two sorted collect_lists
  * — per-alert cost is amortized into set operations, which is why the
  * same code serves a million-alert backfill.
  */
object AlertProducer {

  /** find_alerts_to_send: unsent detections with midpointmjdtai below
    * the send horizon — horizon = `throughday`, or (max mjd among
    * already-sent sources, else min mjd overall) + `addedDays`. The
    * horizon is one scalar: computing it is a metadata-cheap agg, not
    * a per-row subquery. Sent-ness keys on diasourceid
    * (2025-03-21_001_alert.sql's index). */
  def alertsToSend(sources: DataFrame, sent: DataFrame,
      addedDays: Double = 1.0, throughday: Option[Double] = None): DataFrame = {
    val thru = throughday.orElse {
      val sentMax = sources
        .join(sent.select("diasourceid"), Seq("diasourceid"), "left_semi")
        .agg(max("midpointmjdtai")).head().get(0)
      val base =
        if (sentMax != null) Some(sentMax.asInstanceOf[Double])
        // an empty source table has no horizon — and nothing to send
        else Option(sources.agg(min("midpointmjdtai")).head().get(0))
          .map(_.asInstanceOf[Double])
      base.map(_ + addedDays)
    }
    val unsent = sources
      .join(sent.select("diasourceid"), Seq("diasourceid"), "left_anti")
    thru.map(t => unsent.filter(col("midpointmjdtai") < t))
      .getOrElse(unsent.limit(0))
  }

  private def srcStruct(prefix: Column): Column = struct(
    prefix.getField("diasourceid").as("diaSourceId"),
    prefix.getField("diaobjectid").as("diaObjectId"),
    prefix.getField("visit").as("visit"),
    prefix.getField("band").as("band"),
    prefix.getField("midpointmjdtai").as("midpointMjdTai"),
    prefix.getField("psfflux").as("psfFlux"),
    prefix.getField("psffluxerr").as("psfFluxErr"),
    prefix.getField("ra").as("ra"), prefix.getField("dec").as("dec"),
    lit(null).cast("float").as("snr"),
    lit(null).cast("float").as("scienceFlux"),
    lit(null).cast("float").as("scienceFluxErr"),
    lit(null).cast("float").as("extendedness"),
    lit(null).cast("float").as("reliability"))

  /** Reconstruct [[AlertStream.alertSchema]] rows for each row of
    * `toSend`. Previous sources: same object, mjd in
    * [mjd − prevSrcDays, mjd), different visit, mjd-ascending
    * (projectsim.py:174-188). Previous forced: mjd in
    * (mjd − prevFrcedDays, mjd − prevFrcedGapDays)
    * (projectsim.py:190-211, the gap models forced-photometry lag).
    *
    * INPUT CONTRACT: pass procver-RESOLVED frames (one row per
    * physical source/object — the reference producer reads the
    * un-versioned PPDB sim tables; in this engine that means
    * priority-deduped views, e.g. Ltcv.priorityDedup output). The
    * joins key on the physical ids, so a multi-procver frame would
    * duplicate every packet and its history arrays once per version.
    *
    * An anchor whose object row is missing still emits (diaObject
    * carries the id with null position) — an inner join here would
    * silently drop the alert, and since only emitted alerts are
    * marked sent, it would be re-selected and re-dropped forever. */
  def reconstruct(toSend: DataFrame, sources: DataFrame, forced: DataFrame,
      objects: DataFrame, prevSrcDays: Double = 365.0,
      prevFrcedDays: Double = 365.0, prevFrcedGapDays: Double = 0.0): DataFrame = {
    val anchor = toSend.select(
      col("diasourceid").as("_aid"), col("diaobjectid").as("_objid"),
      col("visit").as("_visit"), col("midpointmjdtai").as("_mjd"),
      srcStruct(struct(toSend.columns.map(col): _*)).as("_src"))

    val s = sources.select(struct(sources.columns.map(col): _*).as("_s"))
    val prvS = anchor.join(s,
        col("_s.diaobjectid") === col("_objid") &&
        col("_s.midpointmjdtai") >= col("_mjd") - prevSrcDays &&
        col("_s.midpointmjdtai") < col("_mjd") &&
        col("_s.visit") =!= col("_visit"))
      .groupBy("_aid")
      .agg(sort_array(collect_list(struct(
        col("_s.midpointmjdtai").as("_m"), srcStruct(col("_s")).as("_v")))).as("_l"))
      .select(col("_aid"), transform(col("_l"), x => x.getField("_v")).as("_prvS"))

    val f = forced.select(struct(forced.columns.map(col): _*).as("_f"))
    val prvF = anchor.join(f,
        col("_f.diaobjectid") === col("_objid") &&
        col("_f.midpointmjdtai") > col("_mjd") - prevFrcedDays &&
        col("_f.midpointmjdtai") < col("_mjd") - prevFrcedGapDays)
      .groupBy("_aid")
      .agg(sort_array(collect_list(struct(
        col("_f.midpointmjdtai").as("_m"), struct(
          col("_f.diaforcedsourceid").as("diaForcedSourceId"),
          col("_f.diaobjectid").as("diaObjectId"),
          col("_f.visit").as("visit"), col("_f.band").as("band"),
          col("_f.midpointmjdtai").as("midpointMjdTai"),
          col("_f.psfflux").as("psfFlux"), col("_f.psffluxerr").as("psfFluxErr"),
          lit(null).cast("float").as("scienceFlux"),
          lit(null).cast("float").as("scienceFluxErr")).as("_v")))).as("_l"))
      .select(col("_aid"), transform(col("_l"), x => x.getField("_v")).as("_prvF"))

    val obj = objects.select(col("diaobjectid").as("_objid"),
      struct(col("diaobjectid").as("diaObjectId"),
        col("ra").as("ra"), col("dec").as("dec")).as("_obj"))

    anchor
      .join(prvS, Seq("_aid"), "left_outer")
      .join(prvF, Seq("_aid"), "left_outer")
      .join(obj, Seq("_objid"), "left_outer")
      .withColumn("_obj", coalesce(col("_obj"),
        struct(col("_objid").as("diaObjectId"),
          lit(null).cast("double").as("ra"),
          lit(null).cast("double").as("dec"))))
      .select(
        col("_aid").as("alertId"),
        col("_src").as("diaSource"),
        // empty windows → null, matching the reference's
        // "if len(...) > 0 else None"
        when(size(col("_prvS")) > 0, col("_prvS"))
          .cast(ArrayType(AlertStream.sourceStruct)).as("prvDiaSources"),
        when(size(col("_prvF")) > 0, col("_prvF"))
          .cast(ArrayType(AlertStream.forcedStruct)).as("prvDiaForcedSources"),
        col("_obj").as("diaObject"),
        // the reference staples a constant FITS blob onto every alert;
        // real cutouts live in the thumbnails silver table and can be
        // joined in by diasourceid when emitting to a real broker
        lit(null).cast("binary").as("cutoutDifference"),
        lit(null).cast("binary").as("cutoutScience"),
        lit(null).cast("binary").as("cutoutTemplate"),
        lit(null).cast(ArrayType(AlertStream.classificationStruct))
          .as("classifications"))
  }

  /** Reconstruct + avro-encode: (alertId, value) binary packets. */
  def emit(spark: SparkSession, toSend: DataFrame, sources: DataFrame,
      forced: DataFrame, objects: DataFrame): DataFrame =
    AvroAlerts.encode(spark,
      reconstruct(toSend, sources, forced, objects))

  /** update_alertssent: append one sent row per emitted alert.
    * `senttime` is caller-supplied so replays stay deterministic.
    * Accepts either the selection frame (diasourceid) or [[emit]]'s
    * output, whose alertId IS the diasourceid ([[reconstruct]] sets
    * alertId = the triggering detection's id). */
  def markSent(sent: DataFrame, emitted: DataFrame,
      senttime: java.sql.Timestamp): DataFrame = {
    val idCol =
      if (emitted.columns.contains("diasourceid")) col("diasourceid")
      else col("alertId").as("diasourceid")
    sent.unionByName(emitted.select(idCol, lit(senttime).as("senttime")))
  }
}
