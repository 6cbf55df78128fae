package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PCA whitening for embedding columns — the OPQ-style preconditioner
  * a vector pipeline runs before product quantization: rotate into the
  * eigenbasis of the corpus covariance and rescale each component to
  * unit variance, so the PQ subspaces see decorrelated, equal-energy
  * coordinates instead of whatever axes the encoder happened to emit
  * (correlated axes are the main source of PQ distortion — Jégou et
  * al. 2011 §V, and the standard faiss `PCAMatrix` preprocessing).
  *
  * Spark shape: the sufficient statistics (n, Σx, ΣxxT) are ONE
  * per-partition fold — each task accumulates a local dim×dim Gram
  * matrix and emits a single row, the classic MLlib RowMatrix
  * covariance recipe — so the driver combines #partitions·dim² doubles
  * (a few MB at dim 64) and eigendecomposes a dim×dim matrix locally.
  * The transform is a per-row matrix multiply in `mapPartitions` with
  * the (dim² + dim)-double model in the task closure: no shuffle on
  * either side. Floating-point sums depend on partition grouping, so
  * whitened values are reproducible to ulps, not bits — every
  * guarantee is therefore stated with tolerances (spec), and the
  * battery surfaces the stable spectrum summary rather than raw
  * coordinates.
  */
object Whitening {

  /** mean + principal axes (descending eigenvalue) + per-component
    * whitening scales 1/√(λ+eps). */
  final case class Model(dim: Int, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double],
      scales: Array[Double])

  final case class VecRow(id: Long, emb: Seq[Double])

  /** Fit on the embedding column (optionally a sampled frame — the
    * covariance of a large uniform sample is the standard estimator at
    * scale). One corpus pass; the per-partition (n, Σx, ΣxxT) rows are
    * combined DISTRIBUTIVELY (element index → sum), so the driver
    * receives exactly dim + dim² doubles no matter how many partitions
    * the corpus has — collecting one Gram row per partition would be
    * gigabytes at 100 TB partition counts. Driver work is O(dim³) for
    * the eigendecomposition. */
  def fit(df: DataFrame, idCol: String, embCol: String, dim: Int,
      eps: Double = 1e-9): Model = {
    val (n, mean, covUpper) = covStats(df, idCol, embCol, dim)
    require(n >= 2, s"whitening needs >= 2 vectors, got $n")
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = covUpper(i * dim + j)
        cov(i, j) = v; cov(j, i) = v
        j += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov)
    // breeze returns ascending eigenvalues; flip to descending
    val order = (0 until dim).sortBy(k => -es.eigenvalues(k))
    val eigenvalues = order.map(k => math.max(es.eigenvalues(k), 0.0)).toArray
    val components = order.map(k =>
      Array.tabulate(dim)(r => es.eigenvectors(r, k))).toArray
    Model(dim, mean, components, eigenvalues,
      eigenvalues.map(l => 1.0 / math.sqrt(l + eps)))
  }

  /** One-pass distributed covariance sufficient statistics: each task
    * folds its rows into a local (n, Σx, upper-triangular ΣxxT) and the
    * partials combine DISTRIBUTIVELY (element index → sum), so the
    * driver receives exactly dim + dim² doubles regardless of
    * partition count. Returns (n, mean, population covariance as a
    * row-major array with only i ≤ j cells populated). */
  private def covStats(df: DataFrame, idCol: String, embCol: String,
      dim: Int): (Long, Array[Double], Array[Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .as[VecRow]
      .mapPartitions { it =>
        val sum = new Array[Double](dim)
        val gram = new Array[Double](dim * dim) // row-major upper used
        var n = 0L
        it.foreach { r =>
          val x = r.emb
          require(x.length == dim, s"vector ${r.id} has dim ${x.length}, expected $dim")
          var i = 0
          while (i < dim) {
            val xi = x(i)
            sum(i) += xi
            var j = i
            while (j < dim) { gram(i * dim + j) += xi * x(j); j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single((n, sum.toSeq, gram.toSeq))
      }
      .toDF("_n", "_sum", "_gram")
      .persist() // #partitions tiny rows, read by the three folds below
    val n = {
      val r = parts.agg(org.apache.spark.sql.functions.sum(col("_n"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    def combine(c: String, len: Int): Array[Double] = {
      val out = new Array[Double](len)
      parts.select(posexplode(col(c)))
        .groupBy("pos").agg(org.apache.spark.sql.functions.sum(col("col")).as("v"))
        .collect()
        .foreach(r => out(r.getInt(0)) = r.getDouble(1))
      out
    }
    val sum = combine("_sum", dim)
    val gram = combine("_gram", dim * dim)
    parts.unpersist(blocking = false)
    val mean = sum.map(_ / n)
    val cov = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        cov(i * dim + j) = gram(i * dim + j) / n - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** The whitening CONTRACT as data: the population covariance of the
    * whitened corpus, which must be the identity (diagonal λ/(λ+eps) ≈
    * 1, off-diagonal rotation residue ~1e-12) — rounded at 4 dp this
    * is an engine-independent constant, so the diagnostic oracle-checks
    * even though no SQL engine replays the eigendecomposition behind
    * it. Same distributed stats pass as [[fit]]; driver materializes
    * dim² doubles. Returns (i, j, cov) for i ≤ j, i/j in component
    * order. */
  def whitenedCovariance(df: DataFrame, idCol: String, embCol: String,
      model: Model): Seq[(Int, Int, Double)] = {
    val wh = transform(df, idCol, embCol, model, "whitened")
    val (_, _, cov) = covStats(wh, idCol, "whitened", model.dim)
    for (i <- 0 until model.dim; j <- i until model.dim)
      yield (i, j, cov(i * model.dim + j))
  }

  /** Whiten: out_k = scale_k · ⟨x − mean, component_k⟩. Per-row
    * matrix multiply where the rows live; model in the closure. */
  def transform(df: DataFrame, idCol: String, embCol: String,
      model: Model, outCol: String = "whitened"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .as[VecRow]
      .mapPartitions { it =>
        it.map { r =>
          val x = r.emb
          val out = new Array[Double](model.dim)
          var k = 0
          while (k < model.dim) {
            val w = model.components(k)
            var s = 0.0
            var i = 0
            while (i < model.dim) { s += (x(i) - model.mean(i)) * w(i); i += 1 }
            out(k) = s * model.scales(k)
            k += 1
          }
          (r.id, out.toSeq)
        }
      }
      .toDF("id", outCol)
      .withColumnRenamed("id", idCol)
  }

  /** Stable spectrum summary for reporting: per component, the
    * eigenvalue (corpus variance along that axis) and the cumulative
    * explained-variance fraction. */
  def spectrum(model: Model): Seq[(Int, Double, Double)] = {
    val total = model.eigenvalues.sum
    var cum = 0.0
    model.eigenvalues.toSeq.zipWithIndex.map { case (l, k) =>
      cum += l
      (k, l, if (total > 0) cum / total else 0.0)
    }
  }
}
