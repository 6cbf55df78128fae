package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ) of embedding columns — the OTHER
  * standard 100 TB embedding compression next to product quantization
  * ([[PqAnn]]): per-dimension min/max bounds, each float becomes one
  * byte code = floor((x − mn)/(mx − mn)·255 + ½), a 4× (float32) /
  * 8× (float64) shrink with no codebook training, no seed, and exact
  * reconstruction arithmetic — which is why every vector store ships
  * it as the default compression tier. PQ wins at higher ratios; SQ
  * wins on simplicity, decode speed (one FMA per dim), and zero
  * training cost.
  *
  * Scale shape:
  *  - bounds are a posexplode → per-dim min/max aggregate: map-side
  *    combine reduces each partition to `dim` rows before the
  *    exchange, so the shuffle carries partitions·dim tiny rows, never
  *    the corpus;
  *  - the driver collects exactly `dim` (mn, mx) pairs — bounded by
  *    embedding dimensionality, not corpus size (same bounded-collect
  *    class as the BPE vocabulary);
  *  - encoding is a scan-stage array transform against the
  *    literal-array bounds: no join, no shuffle, whole-stage codegen.
  *
  * Everything is exact integer codes plus deterministic IEEE double
  * arithmetic → the DuckDB oracle replays codes bit-for-bit and the
  * reconstruction error to rounding precision.
  */
object ScalarQuant {

  /** Per-dimension (min, max) bounds over the corpus, as two
    * dim-length arrays (0-indexed). One aggregate job; the collect is
    * `dim` rows. */
  def fitBounds(emb: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = emb.select(posexplode(col(vecCol)).as(Seq("_i", "_x")))
      .groupBy("_i").agg(min(col("_x").cast("double")).as("_mn"),
        max(col("_x").cast("double")).as("_mx"))
      .orderBy("_i").collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Encode every vector against the given bounds: adds `codes`
    * (array<long>, each in [0, 255]) and `sq_err` (sequential-fold sum
    * of squared reconstruction error — a left fold, so the value is
    * order-deterministic). A degenerate dimension (mx = mn) codes to 0
    * and reconstructs to mn exactly. */
  def encode(emb: DataFrame, vecCol: String,
      mins: Array[Double], maxs: Array[Double]): DataFrame = {
    val mnA = lit(mins)
    val mxA = lit(maxs)
    def mn(i: Column) = element_at(mnA, (i + 1).cast("int"))
    def mx(i: Column) = element_at(mxA, (i + 1).cast("int"))
    val codes = transform(col(vecCol), (x, i) =>
      when(mx(i) === mn(i), lit(0L))
        .otherwise(floor((x.cast("double") - mn(i)) / (mx(i) - mn(i)) * 255 + 0.5)))
    val withCodes = emb.withColumn("codes", codes)
    val diffs = transform(col(vecCol), (x, i) => {
      val recon = when(mx(i) === mn(i), mn(i))
        .otherwise(mn(i) +
          element_at(col("codes"), (i + 1).cast("int")).cast("double") / 255.0 *
            (mx(i) - mn(i)))
      val d = x.cast("double") - recon
      d * d
    })
    withCodes.withColumn("sq_err",
      aggregate(diffs, lit(0.0), (acc, v) => acc + v))
  }

  /** Fit + encode in one call (bounds from the input corpus itself). */
  def quantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (mins, maxs) = fitBounds(emb, vecCol)
    encode(emb, vecCol, mins, maxs)
      .select(col(idCol), col("codes"), col("sq_err"))
  }
}
