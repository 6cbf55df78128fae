package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregations.
  *
  * AQE handles skewed *joins* at runtime; for skewed *groupBy* keys
  * (one transient with millions of forced-photometry rows, one LSH
  * bucket holding a template page duplicated across the crawl), salting
  * splits each hot key into `buckets` subkeys, partially aggregates,
  * then merges — two small shuffles instead of one unbounded partition.
  *
  * Works for any algebraic aggregate expressible as (partial, merge)
  * pairs — counts and sums here, which covers the engine's stats ops.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * `sums`: (outputName → column to sum). Also emits `count` if
    * `withCount`. Result equals a direct
    * `df.groupBy(keys).agg(sum/count)` for any data, but bounded per-
    * task state under arbitrary key skew.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String],
      sums: Seq[(String, Column)], buckets: Int = 32,
      withCount: Boolean = true): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id(), lit(buckets)))
    val partialAggs =
      sums.map { case (n, c) => sum(c).as(s"_p_$n") } ++
        (if (withCount) Seq(count(lit(1)).as("_p_cnt")) else Nil)
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sums.map { case (n, _) => sum(col(s"_p_$n")).as(n) } ++
        (if (withCount) Seq(sum(col("_p_cnt")).as("count")) else Nil)
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
