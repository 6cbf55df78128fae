package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard packing + split assignment for training-data export — the
  * step between "filtered corpus" and "bytes on disk for the trainer".
  *
  * A trainer wants shards of ~equal token mass in a stable document
  * order; a pipeline wants train/val/test membership that does not
  * move when the corpus is re-run or re-sharded. Both are layout
  * decisions, so both are computed WITHOUT a global sort bottleneck:
  * [[packByTokenBudget]] is the classic two-phase distributed prefix
  * sum (per-partition running sums + a tiny partition-offset table)
  * and [[hashSplit]] is a pure per-row hash — no shuffle at all.
  */
object Sharding {

  /** Assign each doc (ordered by `idCol`) to the shard holding its
    * first token: shard = floor(tokens_before_doc / budget). Shards
    * are contiguous in id order and reach at least `budget` tokens
    * before the next one starts (a doc straddling a boundary belongs
    * to the shard where it starts, like a record straddling a block).
    *
    * Scale shape: the naive `SUM(tok) OVER (ORDER BY id)` window is a
    * SINGLE TASK holding the whole corpus — the classic accidental
    * serialization. This is the two-phase prefix sum instead:
    * range-repartition by id (partitions become id-contiguous), run
    * per-partition prefix sums in parallel, and pass only the
    * per-partition TOTALS — one row per partition — through the serial
    * window to become start offsets, broadcast back. At 100 TB the
    * serial step sees a few thousand rows, never the corpus.
    *
    * The range exchange feeds two subtrees (rows and totals) but
    * canonicalizes identically, so Spark computes it once and reuses
    * it (ReusedExchange); RangePartitioner's boundary sampling is
    * seed-deterministic, so `spark_partition_id` agrees between the
    * subtrees even if recomputed.
    */
  def packByTokenBudget(docs: DataFrame, idCol: String, tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val t = docs.select(col(idCol), tokens.cast("long").as("n_tokens"))
      .repartitionByRange(col(idCol))
      .withColumn("_pid", spark_partition_id())
    val wLocal = Window.partitionBy("_pid").orderBy(idCol)
    val withLocal = t.withColumn("_cum_local", sum("n_tokens").over(wLocal))
    // one row per partition: the only serial window in the plan
    val wOff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy("_pid").agg(sum("n_tokens").as("_ptot"))
      .withColumn("_off", coalesce(sum("_ptot").over(wOff), lit(0L)))
      .select("_pid", "_off")
    withLocal.join(broadcast(offsets), Seq("_pid"))
      .withColumn("cum_tokens", col("_off") + col("_cum_local"))
      // integral `div`, not a double quotient: a double can land a
      // half-ulp under an exact multiple and floor off by one once
      // cum_tokens outgrows the 2^53 mantissa
      .withColumn("shard", expr(s"(cum_tokens - n_tokens) div ${budget}L"))
      .select(col(idCol), col("n_tokens"), col("cum_tokens"), col("shard"))
  }

  /** Deterministic, engine-portable train/val/test assignment from the
    * first hex nibble of md5(id): 0–b → train (12/16), c–d → val
    * (2/16), e–f → test (2/16). A pure per-row expression: re-running
    * the pipeline — on any engine with a standard md5 — never moves a
    * document between splits, the property seeded `rand()` sampling
    * lacks (Spark's sample() changes membership with partitioning). */
  def hashSplit(id: Column): Column = {
    val nib = substring(md5(id.cast("string")), 1, 1)
    when(nib.isin("c", "d"), lit("val"))
      .when(nib.isin("e", "f"), lit("test"))
      .otherwise(lit("train"))
  }
}
