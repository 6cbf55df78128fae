package graft.schema

import org.apache.spark.sql.types._

/** Fixed schemas for every FASTDB table (single source of truth).
  *
  * The reference reflects these dynamically from Postgres
  * `information_schema` (src/db.py:874-903); our schema set is closed so
  * we declare them once. Type mapping per SURVEY.md §1.4: uuid → 36-char
  * STRING, jsonb → STRING (json), real → FLOAT, double precision →
  * DOUBLE, timestamptz → TIMESTAMP (session TZ pinned UTC).
  *
  * DDL provenance: db/2026-02-02_refactor.sql (post-refactor shape),
  * db/2025-02-18_001_init.sql, db/2026-02-26_omfg.sql (PK reversions),
  * db/2026-03-09_brokerinfo_prvid.sql, db/2025-04-25-spectrumcycle.sql.
  */
object Schemas {

  // ---- processing-version machinery (refactor.sql:20-101) ----

  /** base_processing_version: one per (version, table); photometric rows
    * carry base_procver_id. */
  val baseProcessingVersion: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("_table", StringType, nullable = false),
    StructField("notes", StringType, nullable = true)))

  /** processing_version: the user-facing name. */
  val processingVersion: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("description", StringType, nullable = false)))

  /** base_procver_of_procver: priority-ordered base versions per
    * (procver, table) — higher priority wins (refactor.sql:26,99-101). */
  val baseProcverOfProcver: StructType = StructType(Seq(
    StructField("procver_id", StringType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("_table", StringType, nullable = false),
    StructField("priority", IntegerType, nullable = false)))

  /** processing_version_alias (2025-04-25-spectrumcycle.sql:4-10). */
  val processingVersionAlias: StructType = StructType(Seq(
    StructField("description", StringType, nullable = false),
    StructField("procver_id", StringType, nullable = false)))

  // ---- object identity (init.sql:102-107; refactor.sql:242-244) ----

  /** root_diaobject: the *true* object identity (alert-stream
    * diaobjectids are unreliable — docs/overview.rst:32). */
  val rootDiaObject: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("ra", DoubleType, nullable = true),
    StructField("dec", DoubleType, nullable = true)))

  val diaObject: StructType = StructType(Seq(
    StructField("diaobjectid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("rootid", StringType, nullable = false)))

  /** diaobject_position (refactor.sql:172-200). */
  val diaObjectPosition: StructType = StructType(Seq(
    StructField("diaobjectid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("raerr", FloatType, nullable = true),
    StructField("decerr", FloatType, nullable = true),
    StructField("ra_dec_cov", FloatType, nullable = true),
    StructField("created_at", TimestampType, nullable = true)))

  // ---- photometry (refactor.sql:258-331, 395-442) ----

  /** diasource: detections. PK (diasourceid, base_procver_id);
    * per-(rootid, visit) uniqueness enforced at query time by the
    * priority dedup, not by storage (2026-03-03_remove_constraints.sql). */
  val diaSource: StructType = StructType(Seq(
    StructField("diasourceid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("diaobjectid", LongType, nullable = false),
    StructField("visit", LongType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("midpointmjdtai", DoubleType, nullable = false),
    StructField("psfflux", FloatType, nullable = true),
    StructField("psffluxerr", FloatType, nullable = true),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("raerr", FloatType, nullable = true),
    StructField("decerr", FloatType, nullable = true),
    StructField("ra_dec_cov", FloatType, nullable = true)))

  /** diasource_extra: the wide/rare columns (refactor.sql:295-331).
    * Parquet column pruning makes the split unnecessary physically; kept
    * as a schema boundary to match ingestion semantics (SURVEY.md §1.5). */
  val diaSourceExtra: StructType = StructType(Seq(
    StructField("diasourceid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("detector", ShortType, nullable = true),
    StructField("x", FloatType, nullable = true),
    StructField("y", FloatType, nullable = true),
    StructField("xerr", FloatType, nullable = true),
    StructField("yerr", FloatType, nullable = true),
    StructField("x_y_cov", FloatType, nullable = true),
    StructField("psflnl", FloatType, nullable = true),
    StructField("psfchi2", FloatType, nullable = true),
    StructField("psfndata", IntegerType, nullable = true),
    StructField("snr", FloatType, nullable = true),
    StructField("scienceflux", FloatType, nullable = true),
    StructField("sciencefluxerr", FloatType, nullable = true),
    StructField("templateflux", FloatType, nullable = true),
    StructField("templatefluxerr", FloatType, nullable = true),
    StructField("extendedness", FloatType, nullable = true),
    StructField("reliability", FloatType, nullable = true),
    StructField("ixx", FloatType, nullable = true),
    StructField("iyy", FloatType, nullable = true),
    StructField("ixy", FloatType, nullable = true),
    StructField("ixxpsf", FloatType, nullable = true),
    StructField("iyypsf", FloatType, nullable = true),
    StructField("ixypsf", FloatType, nullable = true),
    StructField("flags", IntegerType, nullable = true),
    StructField("pixelflags", IntegerType, nullable = true),
    StructField("apflux", FloatType, nullable = true),
    StructField("apfluxerr", FloatType, nullable = true),
    StructField("bboxsize", IntegerType, nullable = true),
    StructField("timeprocessedmjdtai", DoubleType, nullable = true),
    StructField("timewithdrawnmjdtai", DoubleType, nullable = true),
    StructField("parentdiasourceid", LongType, nullable = true)))

  /** diaforcedsource: forced photometry. PK reverted to
    * (diaforcedsourceid, base_procver_id) by 2026-02-26_omfg.sql:20,27. */
  val diaForcedSource: StructType = StructType(Seq(
    StructField("diaforcedsourceid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("diaobjectid", LongType, nullable = false),
    StructField("visit", LongType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("midpointmjdtai", DoubleType, nullable = false),
    StructField("psfflux", FloatType, nullable = true),
    StructField("psffluxerr", FloatType, nullable = true),
    StructField("ra", DoubleType, nullable = true),
    StructField("dec", DoubleType, nullable = true)))

  val diaForcedSourceExtra: StructType = StructType(Seq(
    StructField("diaforcedsourceid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("detector", ShortType, nullable = true),
    StructField("scienceflux", FloatType, nullable = true),
    StructField("sciencefluxerr", FloatType, nullable = true),
    StructField("timeprocessedmjdtai", DoubleType, nullable = true),
    StructField("timewithdrawnmjdtai", DoubleType, nullable = true)))

  /** diasource_brokerinfo (refactor.sql:363-370 + 2026-02-25/26 +
    * 2026-03-09 migrations). info is a JSON string. */
  val diaSourceBrokerInfo: StructType = StructType(Seq(
    StructField("brokername", StringType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("diasourceid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("diaobjectid", LongType, nullable = false),
    StructField("msgtime", TimestampType, nullable = true),
    StructField("receivedtime", TimestampType, nullable = true),
    StructField("importtime", TimestampType, nullable = true),
    StructField("prv_diasourceid", ArrayType(LongType), nullable = true),
    StructField("prv_diaforcedsourceid", ArrayType(LongType), nullable = true),
    StructField("info", StringType, nullable = true)))

  /** Cutout thumbnails. The reference keeps these only in the mongo
    * staging `_thumbnails` collections (brokerconsumer.py:565-575,
    * 37-103) as opaque FITS/binary blobs; here they are a first-class
    * opaque-binary silver table (SURVEY.md multimodal-columns design:
    * binary payload + typed metadata, decode deferred to
    * [[graft.pipeline.Multimodal]]). */
  val thumbnails: StructType = StructType(Seq(
    StructField("diasourceid", LongType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("diaobjectid", LongType, nullable = false),
    StructField("cutoutdifference", BinaryType, nullable = true),
    StructField("cutoutscience", BinaryType, nullable = true),
    StructField("cutouttemplate", BinaryType, nullable = true)))

  // ---- host galaxies (refactor.sql:113-167) ----

  val hostGalaxy: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("host_catalog", StringType, nullable = false),
    StructField("host_id", StringType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("ra", DoubleType, nullable = true),
    StructField("dec", DoubleType, nullable = true),
    StructField("info", StringType, nullable = true)))

  val diaObjectHostMatch: StructType = StructType(Seq(
    StructField("diaobjectid", LongType, nullable = false),
    StructField("host_galaxy_id", StringType, nullable = false),
    StructField("base_procver_id", StringType, nullable = false),
    StructField("prio", ShortType, nullable = true)))

  // ---- spectrum cycle (2025-04-25-spectrumcycle.sql:13-58) ----

  val wantedSpectra: StructType = StructType(Seq(
    StructField("wantspec_id", StringType, nullable = false),
    StructField("root_diaobject_id", StringType, nullable = false),
    StructField("wanttime", TimestampType, nullable = true),
    StructField("user_id", StringType, nullable = true),
    StructField("requester", StringType, nullable = false),
    StructField("priority", ShortType, nullable = true),
    StructField("ra", DoubleType, nullable = true),
    StructField("dec", DoubleType, nullable = true),
    StructField("is_host", BooleanType, nullable = true)))

  val plannedSpectra: StructType = StructType(Seq(
    StructField("plannedspec_id", StringType, nullable = false),
    StructField("root_diaobject_id", StringType, nullable = false),
    StructField("facility", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = true),
    StructField("plantime", TimestampType, nullable = true),
    StructField("comment", StringType, nullable = true),
    StructField("is_host", BooleanType, nullable = true)))

  val spectrumInfo: StructType = StructType(Seq(
    StructField("specinfo_id", StringType, nullable = false),
    StructField("root_diaobject_id", StringType, nullable = false),
    StructField("facility", StringType, nullable = false),
    StructField("inserted_at", TimestampType, nullable = true),
    StructField("mjd", FloatType, nullable = true),
    StructField("z", FloatType, nullable = true),
    StructField("classid", IntegerType, nullable = true),
    StructField("ra", DoubleType, nullable = true),
    StructField("dec", DoubleType, nullable = true),
    StructField("is_host", BooleanType, nullable = true),
    StructField("class_description", StringType, nullable = true)))

  // ---- async query queue (init.sql:403-414) ----

  val queryQueue: StructType = StructType(Seq(
    StructField("queryid", StringType, nullable = false),
    StructField("userid", StringType, nullable = true),
    StructField("submitted", TimestampType, nullable = false),
    StructField("started", TimestampType, nullable = true),
    StructField("finished", TimestampType, nullable = true),
    StructField("error", BooleanType, nullable = true),
    StructField("errortext", StringType, nullable = true),
    StructField("queries", ArrayType(StringType), nullable = false),
    StructField("subdicts", ArrayType(StringType), nullable = true),
    StructField("format", StringType, nullable = true)))

  /** Table-name → schema registry (mirrors src/db.py:59-68's list). */
  val all: Map[String, StructType] = Map(
    "base_processing_version" -> baseProcessingVersion,
    "processing_version" -> processingVersion,
    "base_procver_of_procver" -> baseProcverOfProcver,
    "processing_version_alias" -> processingVersionAlias,
    "root_diaobject" -> rootDiaObject,
    "diaobject" -> diaObject,
    "diaobject_position" -> diaObjectPosition,
    "diasource" -> diaSource,
    "diasource_extra" -> diaSourceExtra,
    "diaforcedsource" -> diaForcedSource,
    "diaforcedsource_extra" -> diaForcedSourceExtra,
    "diasource_brokerinfo" -> diaSourceBrokerInfo,
    "thumbnails" -> thumbnails,
    "host_galaxy" -> hostGalaxy,
    "diaobject_host_match" -> diaObjectHostMatch,
    "wantedspectra" -> wantedSpectra,
    "plannedspectra" -> plannedSpectra,
    "spectruminfo" -> spectrumInfo,
    "query_queue" -> queryQueue)
}
