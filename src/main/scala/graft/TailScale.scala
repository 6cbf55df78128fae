package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-decade-deeper exponent probe for the battery's highest-exponent
  * tail: `runMain graft.TailScale <query> <nCopies>`.
  *
  * SfScaling fits per-query exponents across sf0.001/0.01/0.1 and the
  * 0.3–0.42 tail (e3, g2, g3, g4, a19) reads as "a linear term emerging
  * above a large constant" — a claim that should be TESTED one decade
  * up, where a hidden superlinear term would finally dominate. This
  * harness builds ScaleCheck-style disjoint-copy inputs at N× the
  * sf0.1 tables (true work grows exactly ×N by construction) into a
  * directory shaped like a testdata dir, then runs the REAL battery
  * entry (`SparkEntry.queries(name)`) against it — same plan, same
  * rounding, same orderBy, nothing re-derived for the harness.
  *
  * Copy construction (the ScaleCheck generators):
  *  - documents: copy k offsets doc_id by k·10⁷ and suffixes every
  *    word with `_ck` — shingle/df structure replicates per copy,
  *    disjoint across copies.
  *  - lineitem: copy k offsets l_orderkey and l_partkey by k·10⁹ —
  *    co-purchase graphs of different copies are vertex-disjoint
  *    (offsets divisible by 1000 and 100 keep the derived
  *    rootid = ok % 1000 and visit = pk % 100 distributions, so
  *    light-curve groups DEEPEN ×N exactly as they do when the real
  *    table grows).
  *
  * Run each (query, scale) in its own JVM invocation (the SfScaling
  * discipline); generation is cached per scale under the scratch dir
  * and excluded from timings. Prints cold + median-of-3 warm seconds;
  * the exponent one decade up is log10(t(100×)/t(10×)).
  */
object TailScale {

  private val docQueries = Set("e3_export_manifest")
  private val liQueries =
    Set("g2_triangles", "g3_link_predict", "g4_communities", "a19_lomb_scargle")

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val nCopies = args(1).toInt
    require(docQueries.contains(name) || liQueries.contains(name),
      s"unknown tail query $name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/tmp/graft_tail")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir =
      if (nCopies == 1) sfDir
      else {
        val d = s"$scratch/x$nCopies"
        if (docQueries.contains(name)) genDocs(spark, sfDir, d, nCopies, cpus.toInt)
        else genLineitem(spark, sfDir, d, nCopies, cpus.toInt)
        d
      }

    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      clean()
      dt
    }
    val cold = once()
    val n = fn(spark, dir).count() // untimed, result-shape sanity only
    clean()
    val warms = Seq.fill(3)(once()).sorted
    println(f"[tailscale] $name x$nCopies%-4d rows=$n%-9d " +
      f"cold=${cold}%7.2f s  warm_med=${warms(1)}%7.2f s  warm_min=${warms.head}%7.2f s")
    spark.stop()
  }

  private def genDocs(spark: SparkSession, sfDir: String, outDir: String,
      n: Int, cpus: Int): Unit = {
    val out = s"$outDir/documents.parquet"
    // cache only a COMMITTED generation: a crash mid-write leaves a
    // partial dir that bare exists() would silently accept, corrupting
    // every later measurement; _SUCCESS is written on job commit and
    // mode("overwrite") cleanly replaces any partial leftover
    if (new java.io.File(out, "_SUCCESS").exists()) return
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until n).map { k =>
      base.select(
        (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"$$1_c$k")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(cpus).write.mode("overwrite").parquet(out)
  }

  private def genLineitem(spark: SparkSession, sfDir: String, outDir: String,
      n: Int, cpus: Int): Unit = {
    val out = s"$outDir/lineitem.parquet"
    if (new java.io.File(out, "_SUCCESS").exists()) return // see genDocs
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (0 until n).map { k =>
      base
        .withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 1000000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(k.toLong * 1000000000L))
    }.reduce(_ unionByName _)
      .repartition(cpus).write.mode("overwrite").parquet(out)
  }
}
