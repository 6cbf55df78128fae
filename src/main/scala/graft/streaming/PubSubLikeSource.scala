package graft.streaming

import java.util
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 micro-batch source with the KAFKA ENVELOPE
  * schema — the connector a production deployment writes for a broker
  * Spark has no source for. The reference's Pitt-Google consumer
  * (src/services/brokerconsumer.py:1058-1146) is exactly that case:
  * LSST alerts over Google Pub/Sub, for which no Spark connector
  * exists — the Kafka brokers are one jar away
  * ([[Brokers.kafkaSource]]), but the Pub/Sub path needs THIS: a
  * `MicroBatchStream` that tracks offsets, plans partitions per
  * trigger, replays from a checkpoint, and emits the same envelope
  * columns downstream decode already consumes, so
  * [[Brokers.decode]] / [[AlertStream.wrangle]] run unchanged.
  *
  * The TRANSPORT is stubbed with an in-process queue
  * ([[PubSubLikeSource.publish]]) because the sandbox ships no Google
  * client libraries (the same clearly-marked-stub rule as the
  * multimodal codec layer): a deployment replaces the queue reads in
  * [[PubSubLikeSource.MemReaderFactory]] with subscriber pulls and
  * the offset bookkeeping with ack-id watermarks. Everything Spark
  * sees — offsets, partition planning, checkpoint replay, the
  * envelope schema — is the real V2 surface, exercised end-to-end by
  * StreamingSpec.
  *
  * Scale notes: `planInputPartitions` splits the trigger's offset
  * range into `numPartitions` contiguous slices, so a hot trigger
  * fans out across executors instead of serializing in one task;
  * offsets are a strictly increasing long (publish order), so
  * checkpoint replay after a crash re-reads exactly the uncommitted
  * suffix — at-least-once into the idempotent merges downstream
  * (SURVEY §2.9 T2's contract).
  */
class PubSubLikeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PubSubLikeSource.envelopeSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PubSubLikeSource.MemTable(
      Option(properties.get("queue")).getOrElse(
        throw new IllegalArgumentException(
          "option 'queue' (the in-process queue name) is required")),
      Option(properties.get("numpartitions")).map(_.toInt).getOrElse(4))
}

object PubSubLikeSource {

  /** The Kafka envelope, verbatim — downstream framing decode and
    * wrangle consume (topic, value) and never see which wire the
    * bytes arrived on. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  final case class Msg(topic: String, key: Array[Byte], value: Array[Byte],
      timestampMicros: Long)

  // transport stub: named in-process queues (local / test harness; a
  // deployment's subscriber client replaces this object)
  private val queues = TrieMap.empty[String, ArrayBuffer[Msg]]

  def publish(queue: String, topic: String, key: Array[Byte],
      value: Array[Byte], timestampMicros: Long = 0L): Unit = {
    val q = queues.getOrElseUpdate(queue, ArrayBuffer.empty)
    q.synchronized { q += Msg(topic, key, value, timestampMicros) }
  }

  def clear(queue: String): Unit = queues.remove(queue): Unit

  private def sizeOf(queue: String): Long =
    queues.get(queue).map(q => q.synchronized(q.length.toLong)).getOrElse(0L)

  private def slice(queue: String, from: Long, until: Long): Seq[Msg] =
    queues.get(queue)
      .map(q => q.synchronized(q.slice(from.toInt, until.toInt).toVector))
      .getOrElse(Vector.empty)

  /** `readStream` on this source, by fully-qualified class name (the
    * jar-less registration path, like `format("kafka")` resolves by
    * name in production). */
  def readStream(spark: org.apache.spark.sql.SparkSession, queue: String,
      numPartitions: Int = 4): org.apache.spark.sql.DataFrame =
    spark.readStream.format(classOf[PubSubLikeSource].getName)
      .option("queue", queue)
      .option("numpartitions", numPartitions.toString)
      .load()

  private class LongOffset(val n: Long) extends Offset {
    override def json(): String = n.toString
  }

  private class MemTable(queue: String, numPartitions: Int)
      extends Table with SupportsRead {
    override def name(): String = s"pubsublike:$queue"
    override def schema(): StructType = envelopeSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = envelopeSchema
          override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
            new MemStream(queue, numPartitions)
        }
      }
  }

  private class MemStream(queue: String, numPartitions: Int)
      extends MicroBatchStream {
    override def latestOffset(): Offset = new LongOffset(sizeOf(queue))
    override def initialOffset(): Offset = new LongOffset(0L)
    override def deserializeOffset(json: String): Offset =
      new LongOffset(json.toLong)
    // the transport stub keeps everything; a subscriber client would
    // ack through `end` here
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val (s, e) = (start.asInstanceOf[LongOffset].n, end.asInstanceOf[LongOffset].n)
      val total = e - s
      if (total <= 0) Array.empty
      else {
        val n = math.min(numPartitions.toLong, total).toInt
        (0 until n).map { i =>
          val from = s + total * i / n
          val until = s + total * (i + 1) / n
          MemRange(queue, i, from, until): InputPartition
        }.toArray
      }
    }
    override def createReaderFactory(): PartitionReaderFactory = MemReaderFactory
  }

  private final case class MemRange(queue: String, sparkPartition: Int,
      from: Long, until: Long) extends InputPartition

  private object MemReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val r = p.asInstanceOf[MemRange]
      // in-process queue read; a deployment pulls from the subscriber
      // here instead
      val msgs = slice(r.queue, r.from, r.until).iterator.zipWithIndex
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean =
          if (!msgs.hasNext) false
          else {
            val (m, i) = msgs.next()
            cur = new GenericInternalRow(Array[Any](
              m.key, m.value, UTF8String.fromString(m.topic),
              r.sparkPartition, r.from + i, m.timestampMicros, 0))
            true
          }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }
}
