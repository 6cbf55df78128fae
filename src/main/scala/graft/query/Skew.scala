package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregations.
  *
  * AQE handles skewed *joins* at runtime. For skewed *groupBy* keys the
  * first question is whether the aggregate PARTIALLY COMBINES: sums,
  * counts, min/max and friends already aggregate map-side, so a hot key
  * sends one partial row per map task to the reducer — salting those
  * only adds a second shuffle for nothing. The aggregates that actually
  * melt a reducer under skew are the NON-combinable ones whose buffer
  * grows with input rows: `collect_list`/`collect_set` (one transient
  * with millions of forced-photometry rows in the a8 export shape, one
  * LSH bucket holding a template page duplicated across the crawl).
  *
  * For those, salting splits each hot key into `buckets` subkeys,
  * collects per subkey in parallel, then merges the (already
  * list-compressed) partials — per-task buffer is bounded by the hot
  * key's rows / buckets instead of all of them.
  */
object Skew {

  /** Two-phase salted `collect_list`, sorted for determinism.
    *
    * `values`: the column to collect. Result equals
    * `df.groupBy(keys).agg(array_sort(collect_list(values)))` for any
    * data — collect per (key, salt) first, then flatten the partial
    * lists — but the per-task aggregation state under a hot key is
    * `rows/buckets` elements instead of unbounded. The final
    * `array_sort` makes the output independent of which salt bucket
    * delivered first (the a8 ordered-ARRAY_AGG contract). */
  def saltedCollectList(df: DataFrame, keys: Seq[String], values: Column,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id(), lit(buckets)))
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(collect_list(values).as("_part"))
    partial.groupBy(keys.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("_part")))).as("values"))
  }
}
