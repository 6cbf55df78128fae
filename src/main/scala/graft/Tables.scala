package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Readers for the driver-provided synthetic parquet tables
  * (TESTDATA.md: TPC-H-ish star schema + events/documents/embeddings).
  *
  * Each accessor reads `dir/<name>.parquet` lazily; Catalyst prunes
  * columns and pushes filters into the parquet scan, so reading "the
  * table" costs only what the query actually touches.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred schema per (path, content signature): a schemaless
    * parquet read fires one footer-inference job EVERY time the table
    * is loaded — for a battery child that reads the same table cold +
    * 2-3 warm runs, that's pure scheduler overhead on every run after
    * the first. Keyed on [[tableSignature]] so a regenerated dataset
    * at the same path re-infers instead of serving a stale schema. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = s"$path|${tableSignature(dir, name)}"
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Register every table as a temp view so the ad-hoc SQL surface
    * (graft.api.QueryQueue / spark.sql) can reference them by name. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = n match {
        case "events" => events(spark, dir)
        case "documents" => documents(spark, dir)
        case "embeddings" => embeddings(spark, dir)
        case other => table(spark, dir, other)
      }
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts normalization — schema-adaptive because the driver has
    * shipped this column as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across dataset generations. Either way the
    * result is a session-UTC microsecond TimestampType column:
    *
    *  - NANOS: Spark's vectorized reader rejects nanos outright, so
    *    read them as long (legacy conf; SESSION-wide — every later
    *    nanos-parquet read also arrives as long, which is the behavior
    *    this engine wants everywhere) and convert with INTEGER
    *    division: `/ 1000` promotes to double, and 2026-era nanosecond
    *    epochs (~1.8e18) exceed 2^53, so the double path lands up to a
    *    microsecond off DuckDB's exact integer truncation.
    *  - MICROS (isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ; cast
    *    to TimestampType, which under the fixed UTC session timezone
    *    relabels the same wall-clock instant (no value shift) and
    *    matches DuckDB's naive reading of the file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** The ts-normalization half of [[events]], schema-dispatched so it
    * applies identically to a batch read and a readStream over the
    * same files (the caller sets the nanosAsLong conf before reading). */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  /** documents/embeddings arrive as one small parquet file → one input
    * split → every downstream per-row computation (shingling, hashing,
    * dot products) runs on a single core. Spread them across the
    * cluster's parallelism up front; the shuffled bytes are trivial
    * next to the per-row work these tables feed. On a real cluster the
    * table would already arrive in many splits and this repartition
    * collapses to a cheap rebalance. */
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)

  /** Content signature of a source table's files (names, lengths,
    * mtimes — no data read). Derived artifacts cached outside the
    * dataset dir (the persisted IVF index, the DP1 nested fixture) key
    * their scratch location on this, so a REGENERATED dataset at the
    * same path can never serve a stale artifact — the signature
    * changes, the artifact rebuilds. */
  def tableSignature(dir: String, name: String): String = {
    val root = new java.io.File(s"$dir/$name.parquet")
    val files: Seq[java.io.File] =
      if (root.isDirectory) Option(root.listFiles()).map(_.toSeq).getOrElse(Nil)
      else if (root.isFile) Seq(root)
      else Nil
    val desc = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .sorted.mkString("|")
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$dir/$name|$desc").toLong & 0xFFFFFFFFL)
  }
}
