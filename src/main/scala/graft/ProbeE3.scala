package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sharding, SpanDedup, TextAnalysis}

/** Throwaway probe (r16): print the physical plan of e3's pre-
  * checkpoint `slim` leg so the redact/quality expression duplication
  * can be counted — the committed e3 dumps are checkpoint-truncated.
  */
object ProbeE3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cleaned = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .filter(col("n_removed") < col("n_tokens"))
      .withColumn("export_text", TextAnalysis.redactPii(col("clean_text")))
      .withColumn("_q", TextAnalysis.qualityScore(col("export_text")))
      .persist()
    val deduped = Dedup.exactDedup(cleaned, "doc_id", "clean_text")
    val kept = deduped
      .filter(col("_q") >= 0.55)
      .withColumn("split", Sharding.hashSplit(col("doc_id")))
    val slim = kept.select(col("split"), col("doc_id"),
      TextAnalysis.tokenCount(col("export_text")).cast("long").as("n_tokens"))
    val plan = slim.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val n = "regexp_replace\\(".r.findAllIn(plan).size
    println(s"[probe] regexp_replace occurrences in slim plan: $n")
    sys.env.get("PROBE_E3_PLAN_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), plan): Unit
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val spanOnly = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .filter(col("n_removed") < col("n_tokens"))
    t("spanOnly noop (SpanDedup alone)")(
      spanOnly.write.mode("overwrite").format("noop").save())
    t("cleaned.count (cache build)")(cleaned.count())
    t("cleaned.count again (cache read)")(cleaned.count())
    val slimP = slim.persist()
    t("slim.count (dedup join + tokenize over cache)")(slimP.count())
    t("slim.count again")(slimP.count())
    spark.stop()
  }
}
