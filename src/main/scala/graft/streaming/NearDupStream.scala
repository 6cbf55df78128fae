package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Components, Dedup}

/** Cross-batch NEAR-dup for a streamed corpus — the paraphrase-level
  * counterpart of [[StreamingDedup]], built as `foreachBatch` glue
  * around [[Dedup.incrementalMinhash]]: the accumulated corpus lives as
  * a persisted LSH band-posting + shingle-set index on disk, each
  * micro-batch probes it (and itself), and only NOVEL documents append
  * new postings. The corpus text is never rescanned; per-batch cost is
  * O(batch) shingling + ids-only probe joins — the same shape a nightly
  * batch append would run, so stream and batch ingestion share one
  * dedup definition.
  *
  * State layout: one segment directory per micro-batch
  * (`dir/buckets/b<id>`, `dir/shingles/b<id>`), written with overwrite —
  * a foreachBatch retry of batch N rewrites exactly its own segment, so
  * at-least-once delivery cannot duplicate postings (the SilverStore
  * segment idea, without the manifest since segments here are
  * append-only and self-identifying).
  *
  * Decisions are pairwise, like [[Dedup.incrementalExact]]'s labels:
  * `dup_corpus` (near-dups an already-indexed doc), `dup_batch`
  * (near-dups a smaller-id doc in the same batch), else `kept`. A
  * pipeline wanting transitive clusters feeds the emitted pairs to
  * [[graft.pipeline.Components]] downstream.
  */
object NearDupStream {

  final case class Params(shingleWords: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5)

  /** Segment subdirectories that actually committed (`_SUCCESS`
    * present) — a crash mid-write leaves a marker-less directory,
    * which a bare glob read would trip over forever. `below` restricts
    * to segments from batches strictly earlier than the given id: a
    * RETRY of a batch whose own segment already committed must not see
    * itself in the index (every doc would match its replayed twin and
    * the "kept" rewrite would empty the segment). */
  private def committedSegments(root: String, below: Option[Long]): Seq[String] =
    Option(new java.io.File(root).listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isDirectory && new java.io.File(f, "_SUCCESS").exists())
      .filter { f =>
        val id = scala.util.Try(f.getName.drop(1).toLong).toOption
        below.forall(b => id.forall(_ < b))
      }
      .map(_.getAbsolutePath).sorted

  /** Accumulated index across committed segments (strictly before
    * `below` when given); typed-empty (via a zero-row slice of `like`)
    * when no committed segment exists. */
  def loadIndex(spark: SparkSession, dir: String, like: DataFrame,
      idCol: String, textCol: String, p: Params,
      below: Option[Long] = None): Dedup.NearDupIndex = {
    val (b, sh) = (committedSegments(s"$dir/buckets", below),
      committedSegments(s"$dir/shingles", below))
    if (b.nonEmpty && sh.nonEmpty)
      Dedup.NearDupIndex(spark.read.parquet(b: _*), spark.read.parquet(sh: _*))
    else
      Dedup.minhashIndex(like.limit(0), idCol, textCol,
        p.shingleWords, p.numHashes, p.bands)
  }

  /** Score one micro-batch against the accumulated corpus, append the
    * novel docs' postings, and return (idCol, decision) for every
    * batch row. Call from `foreachBatch` with the sink-provided batch
    * id; ids must be globally unique across the stream ([[Dedup
    * .withShingles]]' contract). */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      dir: String, batchId: Long, p: Params = Params(),
      liveClusters: Boolean = false): DataFrame = {
    val spark = batch.sparkSession
    // the index view excludes this batch's own (possibly already
    // committed) segment, so a foreachBatch RETRY recomputes the same
    // decisions instead of matching its replayed twin
    val index = loadIndex(spark, dir, batch, idCol, textCol, p,
      below = Some(batchId))
    val (pairs0, sigs) = Dedup.incrementalMinhashWithSigs(batch, idCol,
      textCol, index, p.shingleWords, p.numHashes, p.bands, p.threshold)
    val pairs = pairs0.persist()
    if (liveClusters)
      updateClusterState(spark, dir, pairs, idCol, batchId)
    // strongest applicable label per batch doc: corpus beats batch
    val perDoc = pairs.groupBy(col("id_b").as(idCol))
      .agg(max(when(col("origin") === "corpus", 2).otherwise(1)).as("_lvl"))
    val decisions = batch.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("decision",
        when(col("_lvl") === 2, lit("dup_corpus"))
          .when(col("_lvl") === 1, lit("dup_batch"))
          .otherwise(lit("kept")))
      .select(col(idCol), col("decision"))
    // decisions are STATE like the postings (the dedup log a pipeline
    // audits), and writing them materializes every plan this batch
    // needs — so all caches this call created can be released before
    // returning; nothing leaks across a long-lived stream's batches
    decisions.write.mode("overwrite").parquet(s"$dir/decisions/b$batchId")
    val committed = spark.read.parquet(s"$dir/decisions/b$batchId")
    // the batch was already shingled once: derive the new segment from
    // the signature frame by kept-id semi-join, no second tokenize
    val keptIds = committed.filter(col("decision") === "kept").select(col(idCol))
    val segSigs = sigs.join(keptIds, Seq(idCol), "left_semi")
    Dedup.lshBuckets(segSigs, p.bands, p.numHashes / p.bands)
      .select(col("_band"), col("_bucket"), col(idCol))
      .write.mode("overwrite").parquet(s"$dir/buckets/b$batchId")
    segSigs.select(col(idCol), col("_shingles"))
      .write.mode("overwrite").parquet(s"$dir/shingles/b$batchId")
    pairs.unpersist(blocking = false)
    sigs.unpersist(blocking = false)
    committed
  }

  /** LIVE duplicate clusters: fold the batch's verified pairs into the
    * versioned (id, cluster) map via [[Components.updateClusters]] —
    * only clusters the batch touches recompute; everything else passes
    * through. One full map version per batch (`clusters/v<id>`),
    * overwrite-idempotent under retries like the posting segments; the
    * latest committed version is the serving state. Returns the new
    * map. The map holds every doc that has ever appeared in a pair —
    * docs with no duplicate are implicit singletons (cluster = own id),
    * the same convention [[graft.pipeline.Components.dedupClusters]]
    * exposes. */
  def updateClusterState(spark: SparkSession, dir: String,
      pairs: DataFrame, idCol: String, batchId: Long): DataFrame = {
    import spark.implicits._
    // fold on the latest version STRICTLY BELOW this batch: a retry
    // whose own v<batchId> already committed must neither read the
    // directory it is about to overwrite (Spark refuses to overwrite a
    // path being read) nor fold its pairs in twice — recomputing from
    // the predecessor is idempotent by construction
    val prev = latestClusters(spark, dir, below = Some(batchId))
      .getOrElse(Seq.empty[(Long, Long)].toDF(idCol, "cluster"))
    val next = Components.updateClusters(prev, idCol, "cluster",
      pairs, "id_a", "id_b")
    next.write.mode("overwrite").parquet(s"$dir/clusters/v$batchId")
    Components.release(next)
    spark.read.parquet(s"$dir/clusters/v$batchId")
  }

  /** The highest committed cluster-map version (strictly below the
    * given batch id when set), if any. */
  def latestClusters(spark: SparkSession, dir: String,
      below: Option[Long] = None): Option[DataFrame] = {
    val root = new java.io.File(s"$dir/clusters")
    val versions = Option(root.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.getName.startsWith("v") &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f => scala.util.Try(f.getName.drop(1).toLong).toOption.map(_ -> f))
      .filter { case (v, _) => below.forall(v < _) }
    versions.sortBy(_._1).lastOption
      .map { case (_, f) => spark.read.parquet(f.getAbsolutePath) }
  }
}
