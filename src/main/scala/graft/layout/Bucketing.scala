package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed physical layout — the shuffle-elimination lever for the
  * repeated big⋈big joins a 100 TB warehouse runs every day (the
  * reference leans on PostgreSQL btree clustering for the same access
  * pattern — the keyed bulk lookups across src/services). Writing both
  * join sides bucketed AND bucket-sorted by the join key means every
  * subsequent join co-locates matching keys by FILE, so the sort-merge
  * join reads both sides with NO exchange — the only shuffle left in a
  * typical join+rollup plan is the final group-cardinality aggregate.
  * At 100 TB that turns the daily fact⋈fact join from a full-corpus
  * network shuffle into a local merge. (A partition-local Sort remains
  * in the plan: since SPARK-28113 the scan only advertises bucket-sort
  * order under spark.sql.legacy.bucketedTableScan.outputOrdering,
  * because a bucket spread over several files would need a merge; the
  * sort runs over already-sorted runs and costs no network.)
  *
  * Tables persist as EXTERNAL parquet with bucket metadata in the
  * session catalog; a fresh session re-attaches to the files via
  * CREATE TABLE ... CLUSTERED BY ... LOCATION (bucket info lives in
  * the catalog, not the files — re-registering with the same spec is
  * what makes the layout durable across sessions). Scratch locations
  * are keyed by the SOURCE table's content signature (the
  * IvfAnn.scratchDir convention) so a regenerated dataset rebuilds
  * instead of serving stale buckets.
  */
object Bucketing {

  /** Canonical scratch location for a bucketed copy of `table`. */
  def scratchDir(dataset: String, table: String, key: String,
      nBuckets: Int): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_bkt_${table}_${key}_" +
      s"${nBuckets}_${graft.Tables.tableSignature(dataset, table)}"

  /** Catalog-safe table name bound to the same signature. */
  def tableName(dataset: String, table: String, key: String,
      nBuckets: Int): String =
    s"graft_bkt_${table}_${key}_${nBuckets}_" +
      graft.Tables.tableSignature(dataset, table)

  private def isSaved(dir: String): Boolean =
    new java.io.File(dir, "_SUCCESS").exists()

  /** Return `name` as a bucketed table, materializing `df` on first
    * use: write once (bucketBy + sortBy on `key`, one file per bucket
    * via the pre-repartition, so the scan needs no per-bucket merge
    * sort), re-attach on every later session. Idempotent across
    * concurrent sessions the same way the IVF index is: the _SUCCESS
    * marker gates the build.
    */
  def bucketedTable(spark: SparkSession, name: String, df: => DataFrame,
      key: String, nBuckets: Int, dir: String): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      if (!isSaved(dir)) {
        df.repartition(nBuckets, col(key))
          .write.bucketBy(nBuckets, key).sortBy(key)
          .option("path", dir).mode("overwrite").saveAsTable(name)
      } else {
        // bucket metadata is catalog state; re-declare it over the
        // existing files. CLUSTERED BY requires an explicit column
        // list, so read the schema back from the parquet footers.
        val ddl = spark.read.parquet(dir).schema.toDDL
        spark.sql(
          s"""CREATE TABLE $name ($ddl) USING parquet
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $nBuckets BUCKETS
             |LOCATION '$dir'""".stripMargin)
      }
    }
    spark.table(name)
  }
}
