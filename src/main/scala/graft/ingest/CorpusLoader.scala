package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingestion — the raw-text entry point of a training-data
  * pipeline (Common Crawl derivatives, chat logs, scraped corpora all
  * arrive as newline-delimited JSON long before they are parquet).
  *
  * Two scale rules are load-bearing here:
  *  - **The schema is EXPLICIT, never inferred.** `inferSchema` is a
  *    full extra pass over the corpus before the real one — at 100 TB
  *    that doubles the ingest read, and a single odd value late in the
  *    data can silently widen a column type and break every downstream
  *    consumer. Callers declare what they expect; anything that doesn't
  *    parse lands in quarantine instead of mutating the schema.
  *  - **PERMISSIVE + corrupt-record quarantine, not fail-fast or
  *    silent drop.** One mangled crawl line must not kill a 10k-file
  *    batch job (FAILFAST), and DROPMALFORMED destroys the evidence.
  *    Malformed lines keep their raw text in `_corrupt` so an audit
  *    can count, sample, and re-parse them.
  *
  * The parsed frame carries `_corrupt` (null for clean rows). The
  * intended flow is [[landBronze]] → [[good]]/[[quarantine]]: parse
  * once, land columnar bronze, split from bronze — see [[landBronze]]
  * for why raw-json quarantine scans are both uneconomical and
  * illegal in Spark.
  */
object CorpusLoader {

  val CorruptCol = "_corrupt"

  /** Read newline-delimited JSON at `path` with the EXPLICIT `schema`.
    * Returns one row per input line: clean rows have `_corrupt` null,
    * malformed rows have their raw line in `_corrupt` and nulls
    * elsewhere. Scale shape: one pass, splittable per file, the
    * projection of declared columns reaches the text scan. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the loader adds it")
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Parse the JSONL at `path` ONCE and land it as parquet at
    * `bronzeDir` (the `_corrupt` column included), returning the
    * bronze frame. This is the medallion landing step, and it is
    * load-bearing twice over: (a) economics — every downstream
    * consumer reads columnar bronze instead of re-parsing text JSON
    * per query, which at 100 TB is the difference between one parse
    * and N; (b) Spark legality — scans of RAW json whose only
    * referenced column is the corrupt-record column are disallowed
    * (`QUERY_ONLY_CORRUPT_RECORD_COLUMN`), so quarantine
    * counts/filters must run against a materialized copy; bronze IS
    * that copy (the usual `.cache()` workaround is not a workaround at
    * corpus scale). */
  def landBronze(spark: SparkSession, path: String, schema: StructType,
      bronzeDir: String): DataFrame = {
    readJsonl(spark, path, schema).write.mode("overwrite").parquet(bronzeDir)
    spark.read.parquet(bronzeDir)
  }

  /** Read CSV at `path` with the EXPLICIT `schema` — the other wire
    * format raw corpora arrive in (TSV/CSV dumps, metadata sidecars).
    * Same two scale rules as [[readJsonl]]: no inferSchema pass, and
    * PERMISSIVE + corrupt-record quarantine (a row with an unparseable
    * typed field OR the wrong token count keeps its raw line in
    * `_corrupt`). CSV is positional: the schema's field ORDER must
    * match the file's column order (`header = true` only skips the
    * header line, it does not reorder).
    *
    * NEWLINE CONTRACT: with the default `multiLine = false`, records
    * are physical lines — a quoted field containing an embedded
    * newline (which Spark's own CSV WRITER happily produces) is split
    * into two malformed lines that land in quarantine, silently
    * inflating the quarantine count instead of erroring. Callers must
    * either guarantee the input is newline-free inside fields (assert
    * it, as io2 does on its round-trip source) or pass
    * `multiLine = true`, which parses records across lines at the
    * cost of input-split parallelism: a multiLine file is read by ONE
    * task regardless of size, so at corpus scale it is only
    * acceptable when the input is already many small-ish files. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, multiLine: Boolean = false): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the loader adds it")
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header)
      .option("multiLine", multiLine)
      .csv(path)
  }

  /** [[landBronze]] for CSV input — parse once, land columnar bronze,
    * split from bronze (same economics and corrupt-column-scan
    * legality argument). */
  def landBronzeCsv(spark: SparkSession, path: String, schema: StructType,
      bronzeDir: String, header: Boolean = true,
      multiLine: Boolean = false): DataFrame = {
    readCsv(spark, path, schema, header, multiLine)
      .write.mode("overwrite").parquet(bronzeDir)
    spark.read.parquet(bronzeDir)
  }

  /** Clean rows only, `_corrupt` dropped. Call on the BRONZE frame. */
  def good(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined rows: the malformed originals (raw line in
    * `_corrupt`) INCLUDING partial parses — PERMISSIVE fills the
    * fields it could read and still flags the row, and an audit wants
    * those too. Call on the BRONZE frame (see [[landBronze]]). */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull)
}
