package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbour search: a k-means
  * coarse quantizer partitions the corpus into `nlist` cells; a query
  * probes its `nprobe` nearest cells and ranks candidates by exact
  * cosine. The other canonical ANN scale path next to
  * [[Similarity.annTopK]] (hyperplane LSH): IVF adapts to the data
  * distribution (clustered embeddings → tight cells) where LSH is
  * data-oblivious.
  *
  * Embeddings are unit-normalized before clustering so euclidean
  * k-means cells align with cosine neighbourhoods. Training is MLlib's
  * distributed k-means (seeded, deterministic); cell assignment is a
  * model transform; the probe list is a broadcast join against the
  * (tiny) centroid table. At 100 TB the corpus would persist bucketed
  * by cell id so a probe reads only its cells' files.
  */
object IvfAnn {

  final case class Index(assigned: DataFrame, centroids: DataFrame)

  /** Cluster the corpus: returns corpus rows + `_cell`, and the
    * centroid table (cell, center: array<double>).
    *
    * The quantizer trains on a bounded sample squeezed into few
    * partitions: k-means wall time on a small-to-medium corpus is
    * dominated by per-iteration job scheduling (k-means‖ init alone
    * launches ~5 jobs), not arithmetic, and at 100 TB training on the
    * full corpus is not even desirable — the standard IVF recipe
    * trains the coarse quantizer on a sample and `transform`s the full
    * corpus, which is exactly what this does. Random init + fixed seed
    * keeps the index deterministic; the recall spec guards quality. */
  def buildIndex(corpus: DataFrame, idCol: String, embCol: String,
      nlist: Int, seed: Long = 42L, maxTrainRows: Int = 20000): Index = {
    val n = Similarity.normalized(corpus.select(col(idCol), col(embCol)), embCol, "_ne")
      .withColumn("_features", array_to_vector(col("_ne")))
    // sample, never prefix: corpora are usually laid out in ingestion
    // order, and a limit() would train the quantizer on one region of
    // the distribution. Seeded hash of the id is deterministic across
    // runs and partitionings (unlike sample(), whose draw depends on
    // row order within partitions).
    val total = corpus.count()
    val train0 =
      if (total <= maxTrainRows) n
      else {
        // expected sample ≈ 1.1 × maxTrainRows REGARDLESS of corpus
        // size: compute the keep fraction in floating point and ceil —
        // flooring the quotient to a 1-in-10000 minimum would make the
        // sample grow linearly with the corpus (total/10000 rows at
        // web scale), and integer `*11/10` truncates away the 10%
        // headroom for small quotients
        val keep = math.min(10000L, math.max(1L,
          math.ceil(maxTrainRows.toDouble * 10000 / total * 1.1).toLong))
        n.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(10000L)) < keep)
      }
    val train = train0.select("_features").coalesce(4).cache()
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setInitMode("random").setMaxIter(10)
      .setFeaturesCol("_features").setPredictionCol("_cell")
      .fit(train)
    train.unpersist()
    val assigned = model.transform(n)
      .select(col(idCol), col("_ne"), col("_cell"))
      .persist()
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("_cell", "_center")
    Index(assigned, centroids)
  }

  /** Persist an index: the assigned corpus laid out PARTITIONED BY
    * cell id — so a probe's `_cell` equi-join prunes to its cells'
    * files (dynamic partition pruning against the broadcast probe
    * list) instead of scanning the corpus — plus the tiny centroid
    * table. The whole index commits via [[graft.util.Stage]]: both
    * tables are written under a staging dir and published by one
    * atomic rename, so readers never see an assigned table without
    * its centroids (or vice versa) and concurrent builders race
    * safely on any Hadoop filesystem. At 100 TB the same layout
    * holds; you'd additionally bucket within cells by id for
    * co-located candidate joins.
    *
    * `nlist` is REQUIRED (there is deliberately no 2-arg overload):
    * every artifact carries its requested resolution as an
    * `NLIST_<n>` marker file inside the staged tree (atomic with it).
    * The built centroid COUNT can be legitimately smaller than the
    * requested nlist (MLlib k-means on a corpus with fewer clusters
    * than cells returns fewer centers), so the count alone cannot
    * distinguish "same request, sparse data" from "stale index built
    * at a coarser resolution" — a markerless artifact would let
    * [[loadOrBuild]]'s `loaded <= nlist` fallback accept a silently
    * coarser index, the exact gap the marker closes. */
  def save(index: Index, dir: String, nlist: Int): Unit = {
    require(nlist > 0, s"nlist must be positive (got $nlist) — every " +
      "saved index carries its NLIST marker")
    val spark = index.assigned.sparkSession
    graft.util.Stage.publish(spark, dir, "centroids/_SUCCESS") { staging =>
      index.assigned.write.mode("overwrite")
        .partitionBy("_cell").parquet(s"$staging/assigned")
      graft.util.Stage.fs(spark, dir)
        .create(new org.apache.hadoop.fs.Path(s"$staging/NLIST_$nlist"))
        .close()
      // centroids LAST: its _SUCCESS is the commit marker
      index.centroids.write.mode("overwrite").parquet(s"$staging/centroids")
    }
  }

  def isSaved(spark: SparkSession, dir: String): Boolean =
    graft.util.Stage.isCommitted(spark, dir, "centroids/_SUCCESS")

  /** Reload a saved index. Probing a loaded index pays only the probe
    * cost — quantizer training and cell assignment happened at
    * [[save]] time, which is the deploy shape: build the index once,
    * serve top-k queries against the persisted cells.
    * `schemas` (assigned, centroids — [[indexSchemas]]' shape): the
    * layout is fixed by construction, so callers that know it skip the
    * footer-inference scheduler job each schemaless read fires. */
  def load(spark: SparkSession, dir: String,
      schemas: Option[(org.apache.spark.sql.types.StructType,
        org.apache.spark.sql.types.StructType)] = None): Index =
    Index(
      schemas.fold(spark.read)(s => spark.read.schema(s._1))
        .parquet(s"$dir/assigned"),
      schemas.fold(spark.read)(s => spark.read.schema(s._2))
        .parquet(s"$dir/centroids"))

  /** The two frame schemas a persisted index reads back with —
    * plan-only (a zero-row slice of the corpus through the same
    * normalize projection [[buildIndex]] runs; `_cell` is the int
    * k-means prediction, `_center` the int-keyed centroid array). */
  def indexSchemas(corpus: DataFrame, idCol: String, embCol: String):
      (org.apache.spark.sql.types.StructType,
       org.apache.spark.sql.types.StructType) = {
    import org.apache.spark.sql.types._
    val assigned = Similarity.normalized(
        corpus.limit(0).select(col(idCol), col(embCol)), embCol, "_ne")
      .withColumn("_cell", lit(0))
      .select(col(idCol), col("_ne"), col("_cell")).schema
    val centroids = StructType(Seq(StructField("_cell", IntegerType),
      StructField("_center", ArrayType(DoubleType))))
    (assigned, centroids)
  }

  /** Canonical per-dataset scratch location for a shared demo index —
    * s3_ann_ivf and s4's re-rank path use the same (nlist = 16,
    * default seed) index, so whichever runs first builds it and later
    * consumers read it, exactly like two production consumers sharing
    * one persisted quantizer. Keyed by the embeddings table's CONTENT
    * signature, not just the path: a regenerated dataset at the same
    * path gets a fresh index instead of stale cell assignments. Also
    * keyed by `nlist`, so an index built at one resolution is never
    * silently served to a caller asking for another. */
  def scratchDir(dataset: String, nlist: Int = 16): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_${
      graft.Tables.tableSignature(dataset, "embeddings")}_n$nlist"

  /** Load the index at `dir` if present, else build it from `corpus`
    * and persist it there. Either way the returned index reads from
    * the persisted cell-partitioned layout (and the build path frees
    * its in-memory assignment cache after writing). */
  def loadOrBuild(corpus: DataFrame, idCol: String, embCol: String,
      nlist: Int, dir: String): Index = {
    val spark = corpus.sparkSession
    if (!isSaved(spark, dir)) {
      val built = buildIndex(corpus, idCol, embCol, nlist)
      save(built, dir, nlist)
      built.assigned.unpersist()
    }
    val ix = load(spark, dir, Some(indexSchemas(corpus, idCol, embCol)))
    // The centroid table has at most nlist rows by construction, but a
    // parquet read carries no static row bound (maxRows = None), so
    // the probe-list cross join downstream would be indistinguishable
    // in the plan from a corpus-quadratic one. Stamp the known bound
    // onto the plan with a semantically-no-op limit: GlobalLimit(nlist)
    // makes the broadcast side's boundedness statically provable.
    // Guard the no-op claim via the NLIST marker [[save]] stamped
    // (atomic with the artifact): it records the REQUESTED resolution,
    // so a stale index built at a DIFFERENT nlist — larger (the limit
    // would silently truncate: probes assigned among a prefix of cells
    // while `assigned` carries all of them) or smaller (silently
    // coarser quantization, degraded recall) — is rejected loudly.
    // This also covers losing the publish race to a different-nlist
    // writer at the same explicit dir: the winner's marker disagrees.
    // The marker check is a metadata probe, not a count job; a
    // markerless LEGACY artifact falls back to the truncation-safety
    // count bound (scratchDir keys by nlist, so canonical locations
    // can't serve a coarser index either way).
    val f = graft.util.Stage.fs(spark, dir)
    if (!f.exists(new org.apache.hadoop.fs.Path(dir, s"NLIST_$nlist"))) {
      val others = f.globStatus(new org.apache.hadoop.fs.Path(dir, "NLIST_*"))
      require(others == null || others.isEmpty,
        s"index at $dir was built at ${others.head.getPath.getName} but " +
          s"nlist=$nlist was requested — rebuild or key the location by nlist")
      val loaded = ix.centroids.count()
      require(loaded <= nlist,
        s"legacy index at $dir has $loaded cells but nlist=$nlist was " +
          "requested — the limit would truncate it; rebuild the index")
    }
    ix.copy(centroids = ix.centroids.limit(nlist))
  }

  /** Top-k per query over the `nprobe` nearest cells. */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id",
      qIdCol: String = "q_vec_id", qEmbCol: String = "q_embedding"): DataFrame = {
    val qn = Similarity.normalized(queries.select(col(qIdCol), col(qEmbCol)),
      qEmbCol, "_qne")
    // probe list: nprobe nearest centroids per query (centroid table is
    // tiny — nlist rows — so this is a broadcast nested loop over it)
    val wProbe = Window.partitionBy(qIdCol).orderBy(desc("_csim"), col("_cell"))
    val probes = qn.crossJoin(broadcast(index.centroids))
      .withColumn("_csim", Similarity.dot(col("_qne"), col("_center")))
      .withColumn("_crank", row_number().over(wProbe))
      .filter(col("_crank") <= nprobe)
      .select(col(qIdCol), col("_qne"), col("_cell"))
    val w = Window.partitionBy(qIdCol).orderBy(desc("sim"), col(idCol))
    index.assigned.join(broadcast(probes), Seq("_cell"))
      .filter(col(qIdCol) =!= col(idCol))
      .withColumn("sim", Similarity.dot(col("_qne"), col("_ne")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("sim"), col("rank"))
  }
}
