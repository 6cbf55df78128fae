package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Broker-classifier message access (GET ltcv/getbrokerinfo —
  * src/webserver/ltcvapp.py + the diasource_brokerinfo table,
  * FIXTURES.md §1.2). `info` is an opaque JSON payload whose shape is
  * broker-specific; fetch passes it through, and
  * [[explodeClassifications]] handles the common envelope
  * (fastdb.v10_0_0.BrokerMessage: classifications =
  * [{classId, probability}, ...]).
  */
object BrokerInfo {

  /** Broker messages for a set of detections, newest first per
    * (broker, topic, source). */
  def fetch(brokerinfo: DataFrame, diasourceids: Seq[Long],
      brokername: Option[String] = None): DataFrame = {
    val base = brokerinfo.filter(col("diasourceid").isin(diasourceids: _*))
    brokername.map(b => base.filter(col("brokername") === b)).getOrElse(base)
      .orderBy(col("diasourceid"), col("brokername"), col("topic"), desc("msgtime"))
  }

  /** Flatten the classification envelope into one row per
    * (message, classId): json array → explode → typed columns.
    * `explode_outer`: a message whose info carries no (or unparseable)
    * classifications still surfaces, with null classid/probability —
    * silently dropping it would understate per-source message counts. */
  def explodeClassifications(messages: DataFrame): DataFrame = {
    val cls = from_json(get_json_object(col("info"), "$.classifications"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "array<struct<classId:int,probability:double>>"))
    messages
      .withColumn("_c", explode_outer(cls))
      .select(col("brokername"), col("topic"), col("diasourceid"),
        col("diaobjectid"), col("msgtime"),
        col("_c.classId").as("classid"),
        col("_c.probability").as("probability"))
  }
}
