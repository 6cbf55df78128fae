package graft.pipeline

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the learned counterpart of the
  * hand-weighted [[TextAnalysis.qualityScore]] heuristic, and the
  * shape real pretraining pipelines use for quality filtering
  * (a cheap linear/fasttext-style model over document statistics,
  * trained on a labeled seed set, applied to the full corpus).
  *
  * Features are the cheap per-row statistics the scan stage already
  * computes (token count, punctuation density, stopword ratio, mean
  * token length, digit density) — pure column expressions, so
  * featurization runs inside the parquet scan at 100 TB with no
  * shuffle. Training is MLlib's distributed LBFGS logistic regression
  * on the (comparatively tiny) labeled seed; scoring broadcasts the
  * fitted coefficient vector back into a column expression, so
  * inference is ALSO scan-stage — the corpus never shuffles for
  * either step.
  */
object QualityClassifier {

  /** The fixed feature surface. Every entry is bounded (ratios, or
    * saturating caps) so LBFGS sees comparable scales without a
    * separate normalization pass. Exposed as individual columns so
    * [[score]] can combine them without an array construction —
    * `element_at(array(...), i)` is not simplified by Catalyst, so a
    * dot product phrased through it would rebuild the whole feature
    * array once per coefficient. */
  def featureCols(text: Column): Seq[Column] = {
    val nTok = TextAnalysis.tokenCount(text).cast("double")
    val nChar = greatest(length(text).cast("double"), lit(1.0))
    Seq(
      least(nTok / 100.0, lit(1.0)),
      TextAnalysis.punctCount(text).cast("double") / nChar,
      TextAnalysis.stopwordCount(text, TextAnalysis.EnStopwords).cast("double")
        / greatest(nTok, lit(1.0)),
      least(nChar / greatest(nTok, lit(1.0)) / 10.0, lit(1.0)),
      size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double") / nChar)
  }

  /** The feature surface as one array<double> column (training shape). */
  def features(text: Column): Column = array(featureCols(text): _*)

  final case class Model(coefficients: Array[Double], intercept: Double)

  /** Fit on a labeled seed frame (`labelCol` ∈ {0.0, 1.0}). Seeded and
    * order-insensitive up to float association; the spec pins the
    * decisions, not the coefficient bits. */
  def train(seed: DataFrame, textCol: String, labelCol: String): Model = {
    val ds = seed.select(array_to_vector(features(col(textCol))).as("features"),
      col(labelCol).cast("double").as("label"))
      .persist()
    // Each LBFGS iteration is one treeAggregate job over the seed; a
    // small seed scattered across the session's default parallelism
    // pays ~input-partition-count task launches per iteration for
    // microseconds of math each. Size partitions to the seed (64k
    // rows/partition), so a 2.5k-row seed fits one task per iteration
    // while a 10M-row seed still trains distributed.
    val n = ds.count()
    val fitOn = ds.coalesce(math.max(1, (n / 65536).toInt))
    val m = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      .fit(fitOn)
    ds.unpersist(blocking = false)
    Model(m.coefficients.toArray, m.intercept)
  }

  /** Persist a fitted model as one JSON line (coefficients +
    * intercept, full double precision via raw bits — the decimal text
    * round-trip could perturb a decision at the boundary). Train once
    * on the labeled seed, [[load]] in every scoring job. */
  def save(model: Model, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val j = model.coefficients.map(d =>
      java.lang.Long.toString(java.lang.Double.doubleToLongBits(d)))
      .mkString("[", ",", "]")
    java.nio.file.Files.write(p,
      s"""{"coefficients":$j,"intercept":${
        java.lang.Double.doubleToLongBits(model.intercept)}}""".getBytes("UTF-8"))
  }

  def load(path: String): Model = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val coef = "\\[(.*)\\]".r.findFirstMatchIn(s).get.group(1)
      .split(",").filter(_.nonEmpty)
      .map(b => java.lang.Double.longBitsToDouble(b.trim.toLong))
    val icp = "\"intercept\":(-?\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
    Model(coef, java.lang.Double.longBitsToDouble(icp))
  }

  /** Scoring as a pure column expression: σ(w·f + b) from the
    * broadcast-as-literals fitted model — no UDF, no MLlib transform
    * on the corpus path, codegen end to end. */
  def score(text: Column, model: Model): Column = {
    val fs = featureCols(text)
    // zip would silently truncate on a drifted artifact (stale model
    // after a feature-surface change, or a corrupt file load() still
    // parsed) and mis-score the whole corpus — fail loudly instead
    require(model.coefficients.length == fs.length,
      s"model has ${model.coefficients.length} coefficients but the " +
        s"feature surface has ${fs.length} — retrain or reload the artifact")
    val z = fs.zip(model.coefficients).map { case (f, w) =>
      f * w
    }.reduce(_ + _) + model.intercept
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Train on the seed, score the corpus: adds `p_good`. */
  def trainAndScore(corpus: DataFrame, textCol: String,
      seed: DataFrame, seedTextCol: String, labelCol: String): DataFrame =
    corpus.withColumn("p_good", score(col(textCol),
      train(seed, seedTextCol, labelCol)))
}
