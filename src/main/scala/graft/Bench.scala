package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line.
  *
  * Each query is executed four times: the first (cold) run pays
  * whole-stage codegen compilation and JVM warmup — fixed per-plan
  * overhead that amortizes away on a long-lived cluster — then three
  * warm runs measure steady state. `value`/`queries` report the warm
  * MEDIAN (robust to the single-JVM container's documented ±50%
  * scheduler/GC jitter, which best-of-2 was not); per-query best and
  * cold times land in `bench_detail.json` rather than on stdout so
  * the stdout JSON line stays inside the driver's 2000-char tail.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failing query must not masquerade as a fast one: report -1
      // per query AND exclude it from every total (a summed sentinel
      // would make a broken 10s query IMPROVE the headline number)
      def run(): Double = {
        val t0 = System.nanoTime()
        // noop sink, not count(): under Aggregate(count(1)) Catalyst
        // prunes projections, unreferenced windows, and ORDER BY
        // sorts, so count() times a gutted plan — noop executes the
        // same full plan Verify writes, minus only the parquet encode
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      }
      // Between runs: clearCache drops CacheManager entries so
      // operators that persist() intermediates are measured
      // recomputing, and unpersisting every registered RDD frees
      // localCheckpoint blocks (connected components), which
      // clearCache does NOT touch — without this, earlier queries'
      // checkpoint blocks squat on executor memory and skew later
      // queries' times.
      def cleanRun(): Double = {
        val t = run()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        t
      }
      val cold = cleanRun()
      val warms = Seq(cleanRun(), cleanRun(), cleanRun()).sorted
      (name, cold, warms(1), warms.head)
    }
    // The driver captures only the LAST ~2000 chars of output and
    // parses the JSON line out of that tail: rounds 1-5 all came back
    // "parsed": null because three full-precision per-query maps blew
    // past the buffer. The stdout line therefore carries ONLY the warm
    // medians at millisecond precision (~1.5 kB for 58 queries); the
    // full cold/best/warm detail goes to bench_detail.json instead.
    def r3(d: Double): Double = math.round(d * 1000) / 1000.0
    def jsonMap(f: ((String, Double, Double, Double)) => (String, Double)) =
      results.map(r => { val (k, v) = f(r); "\"" + k + "\":" + r3(v) })
        .mkString("{", ",", "}")
    val qs = jsonMap(r => (r._1, r._3))
    val qsBest = jsonMap(r => (r._1, r._4))
    val qsCold = jsonMap(r => (r._1, r._2))
    def okSum(f: ((String, Double, Double, Double)) => Double) =
      r3(results.map(f).filter(_ >= 0).sum)
    val total = okSum(_._3)
    val bestTotal = okSum(_._4)
    val coldTotal = okSum(_._2)
    val nFailed = results.count(_._3 < 0)
    val (ingestRows, ingestSecRaw, reimportSec) = ingestBench(spark, sfDir)
    val ingestSec = r3(ingestSecRaw)
    val ingestRate =
      if (ingestSecRaw > 0) math.round(ingestRows / ingestSecRaw) else 0L
    val scalars = s""""best_total":$bestTotal,"cold_total":$coldTotal,"n_failed":$nFailed,"ingest_rows":$ingestRows,"ingest_sec":$ingestSec,"ingest_rows_per_sec":$ingestRate,"reimport_sec":${r3(reimportSec)},"sf":"$sfDir""""
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_best":$qsBest,"queries_cold":$qsCold,$scalars}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes("UTF-8"))
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$scalars}""")
    spark.stop()
  }

  /** Bulk-import throughput: lineitem-shaped staging rows through the
    * full importer batch (dedup → anti-join → root crossmatch → merges)
    * into an empty catalog, then an idempotent re-import. The
    * reference's comparable figure is ~3.8 k photometry rows/s
    * (BASELINE.md, 10-day Mongo→Postgres import). */
  private def ingestBench(spark: SparkSession, sfDir: String): (Long, Double, Double) = {
    import org.apache.spark.sql.functions._
    import graft.merge.SourceImporter
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val staged = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("diasourceid"),
      lit("bpv-bench").as("base_procver_id"),
      (col("l_orderkey") % 50000).as("diaobjectid"),
      (col("l_partkey") % 100).as("visit"),
      col("l_returnflag").as("band"),
      col("l_extendedprice").as("midpointmjdtai"),
      (col("l_extendedprice") / 10).cast("float").as("psfflux"),
      col("l_quantity").cast("float").as("psffluxerr"),
      ((col("l_orderkey") % 3600) * 0.1).as("ra"),
      ((col("l_orderkey") % 1700) * 0.1 - 85.0).as("dec"),
      current_timestamp().as("ingest_ts"))
      .withColumn("raerr", lit(null).cast("float"))
      .withColumn("decerr", lit(null).cast("float"))
      .withColumn("ra_dec_cov", lit(null).cast("float"))
    val objs = staged.select("diaobjectid", "base_procver_id", "ra", "dec", "ingest_ts")
      .dropDuplicates("diaobjectid")
    val forced = staged
      .withColumnRenamed("diasourceid", "diaforcedsourceid")
      .drop("raerr", "decerr", "ra_dec_cov")
    val store = new graft.streaming.SilverStore(
      java.nio.file.Files.createTempDirectory("ingestbench").toString)
    val empty = store.load(spark)
    val nRows = li.count() * 2   // sources + forced

    val t0 = System.nanoTime()
    store.saveDelta(SourceImporter.importBatchWithDeltas(
      empty, objs, staged, forced)._2)
    val ingestSec = (System.nanoTime() - t0) / 1e9

    // idempotent re-import: every delta is empty, so the store appends
    // nothing — per-batch write cost is O(new rows), not O(catalog)
    val t1 = System.nanoTime()
    store.saveDelta(SourceImporter.importBatchWithDeltas(
      store.load(spark), objs, staged, forced)._2)
    val reimportSec = (System.nanoTime() - t1) / 1e9
    (nRows, ingestSec, reimportSec)
  }
}
