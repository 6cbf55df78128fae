package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.merge.SourceImporter
import graft.merge.SourceImporter.ImportResult

/** §3.3 — alert-stream ingestion as Structured Streaming.
  *
  * Reference chain: Kafka avro → Mongo staging → cron importer
  * (brokerconsumer.py / source_importer.py). Spark-native chain:
  * `readStream` (any source) → wrangle into typed row streams →
  * `foreachBatch` silver merge. This environment ships no Kafka/avro
  * connector jars, so the bundled source here is a schema'd parquet
  * *file* stream — swapping in `readStream.format("kafka")` +
  * `from_avro(...)` changes only `reader()`; wrangle and merge are
  * source-agnostic. foreachBatch (not continuous) is load-bearing:
  * root-object association is sequential across batches (T7).
  */
object AlertStream {

  /** Essential fields of an lsst.v10_0 alert packet
    * (share/avsc/lsst.v10_0.alert.avsc; 12 top-level fields of which
    * cutouts/ss are payload we pass through as opaque nulls here). */
  val sourceStruct: StructType = StructType(Seq(
    StructField("diaSourceId", LongType), StructField("diaObjectId", LongType),
    StructField("visit", LongType), StructField("band", StringType),
    StructField("midpointMjdTai", DoubleType),
    StructField("psfFlux", FloatType), StructField("psfFluxErr", FloatType),
    StructField("ra", DoubleType), StructField("dec", DoubleType)))

  val forcedStruct: StructType = StructType(Seq(
    StructField("diaForcedSourceId", LongType), StructField("diaObjectId", LongType),
    StructField("visit", LongType), StructField("band", StringType),
    StructField("midpointMjdTai", DoubleType),
    StructField("psfFlux", FloatType), StructField("psfFluxErr", FloatType)))

  val alertSchema: StructType = StructType(Seq(
    StructField("alertId", LongType),
    StructField("diaSource", sourceStruct),
    StructField("prvDiaSources", ArrayType(sourceStruct)),
    StructField("prvDiaForcedSources", ArrayType(forcedStruct)),
    StructField("diaObject", StructType(Seq(
      StructField("diaObjectId", LongType),
      StructField("ra", DoubleType), StructField("dec", DoubleType))))))

  final case class Wrangled(objects: DataFrame, sources: DataFrame,
      forced: DataFrame)

  /** brokerconsumer.py:534-649's alert_wrangler: split each alert into
    * object/source/forced staging rows (current + previous sources —
    * at-least-once duplicates are expected and removed by the merge). */
  def wrangle(alerts: DataFrame, baseProcverId: String): Wrangled = {
    val ts = current_timestamp()
    val objects = alerts.select(
      col("diaObject.diaObjectId").as("diaobjectid"),
      lit(baseProcverId).as("base_procver_id"),
      col("diaObject.ra").as("ra"), col("diaObject.dec").as("dec"),
      ts.as("ingest_ts"))

    def srcRow(c: org.apache.spark.sql.Column) = struct(
      c.getField("diaSourceId").as("diasourceid"),
      c.getField("diaObjectId").as("diaobjectid"),
      c.getField("visit").as("visit"), c.getField("band").as("band"),
      c.getField("midpointMjdTai").as("midpointmjdtai"),
      c.getField("psfFlux").as("psfflux"), c.getField("psfFluxErr").as("psffluxerr"),
      c.getField("ra").as("ra"), c.getField("dec").as("dec"))

    val stagedSourceType = ArrayType(StructType(Seq(
      StructField("diasourceid", LongType), StructField("diaobjectid", LongType),
      StructField("visit", LongType), StructField("band", StringType),
      StructField("midpointmjdtai", DoubleType),
      StructField("psfflux", FloatType), StructField("psffluxerr", FloatType),
      StructField("ra", DoubleType), StructField("dec", DoubleType))))
    val sources = alerts.select(explode(concat(
        array(srcRow(col("diaSource"))),
        coalesce(transform(col("prvDiaSources"), srcRow _),
          array().cast(stagedSourceType))))
        .as("s"))
      .select(col("s.*"))
      .withColumn("base_procver_id", lit(baseProcverId))
      // position errors arrive only via non-alert channels; the silver
      // schema keeps them nullable (Schemas.diaSource)
      .withColumn("raerr", lit(null).cast("float"))
      .withColumn("decerr", lit(null).cast("float"))
      .withColumn("ra_dec_cov", lit(null).cast("float"))
      .withColumn("ingest_ts", ts)

    val forced = alerts.select(explode(coalesce(col("prvDiaForcedSources"),
        array().cast(ArrayType(forcedStruct)))).as("f"))
      .select(
        col("f.diaForcedSourceId").as("diaforcedsourceid"),
        col("f.diaObjectId").as("diaobjectid"),
        col("f.visit").as("visit"), col("f.band").as("band"),
        col("f.midpointMjdTai").as("midpointmjdtai"),
        col("f.psfFlux").as("psfflux"), col("f.psfFluxErr").as("psffluxerr"),
        lit(null).cast("double").as("ra"), lit(null).cast("double").as("dec"))
      .withColumn("base_procver_id", lit(baseProcverId))
      .withColumn("ingest_ts", ts)

    Wrangled(objects, sources, forced)
  }

  /** File-source alert stream → foreachBatch silver merge into `store`.
    * `maxFilesPerTrigger` plays the role of the reference's 1000-msg
    * consume batches (T1). Blocks until `processAllAvailable` if
    * `awaitAll`. */
  def run(spark: SparkSession, inputDir: String, store: SilverStore,
      baseProcverId: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 10, awaitAll: Boolean = false): StreamingQuery = {
    val stream = spark.readStream.schema(alertSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = wrangle(batch, baseProcverId)
        val merged = SourceImporter.importBatch(
          store.load(spark), w.objects, w.sources, w.forced)
        store.save(merged)
      }
      .start()
    if (awaitAll) { q.processAllAvailable(); q.stop() }
    q
  }
}
