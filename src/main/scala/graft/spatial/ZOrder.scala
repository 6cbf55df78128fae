package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for two-dimensional data skipping —
  * the storage-side complement of the zones cone JOIN: zones make the
  * join's shuffle keys spatial; this makes the FILES spatial, so a
  * box/cone predicate prunes most of a 100 TB catalog before a single
  * row is read. Sorting by interleaved (ra, dec) bits gives every
  * output file a tight bounding box in BOTH dimensions (a plain sort
  * by ra alone leaves each file spanning all of dec), and parquet
  * min/max statistics — file- and row-group-level — then skip
  * everything a predicate's box does not intersect. This is the
  * standard lakehouse OPTIMIZE ZORDER recipe, expressed as plain
  * Spark: quantize → interleave bits → range-repartition + in-partition
  * sort on the key. Everything is a codegen'd column expression; the
  * only exchange is the range repartition that the layout IS.
  */
object ZOrder {

  /** Morton key: `bits`-bit quantizations of x and y over their fixed
    * domains, bit-interleaved (x even bits, y odd). Out-of-domain
    * values clamp to the edge cells. 2·bits ≤ 62. */
  def zValue(x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val cells = (1L << bits).toDouble
    def quant(c: Column, lo: Double, hi: Double): Column =
      least(greatest(floor((c - lo) / (hi - lo) * cells), lit(0.0)),
        lit(cells - 1)).cast("long")
    val qx = quant(x, xMin, xMax)
    val qy = quant(y, yMin, yMax)
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The sky-domain key for (ra, dec) columns. */
  def skyKey(ra: Column, dec: Column, bits: Int = 16): Column =
    zValue(ra, 0.0, 360.0, dec, -90.0, 90.0, bits)

  /** Lay a frame out along the curve: range-repartition into
    * `numFiles` key ranges and sort within each — every output
    * partition (→ parquet file) covers a contiguous curve segment,
    * i.e. a small spatial box. Write the result with
    * `.write.parquet(...)`; the `_zkey` column is dropped (parquet
    * stats on the ra/dec columns themselves do the pruning). */
  def layout(df: DataFrame, ra: String, dec: String,
      numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("_zkey", skyKey(col(ra), col(dec), bits))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")

  /** Per-file bounding boxes of a written layout — the skipping
    * diagnostic: the mean fractional box area is what a box query's
    * expected touched-file fraction tracks. */
  def fileBoxes(spark: org.apache.spark.sql.SparkSession, path: String,
      ra: String, dec: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(ra)).as("ra_min"), max(col(ra)).as("ra_max"),
        min(col(dec)).as("dec_min"), max(col(dec)).as("dec_max"))
      .withColumn("frac_area",
        (col("ra_max") - col("ra_min")) * (col("dec_max") - col("dec_min"))
          / (360.0 * 180.0))
}
