package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job trace for one battery query: `runMain graft.JobTrace <name>`
  * over SPARK_GRAFT_SF_DIR prints every Spark job's call site and
  * wall-clock — the drill-down behind BenchOne's job counter. Fixed-
  * cost queries (SfScaling exponent ≈ 0) spend their time in scheduler
  * round-trips, so WHICH line schedules each job is the actionable
  * signal (this is how the SilverStore footer fix found its 18
  * count-jobs). */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // experiment-only conf overrides (semicolon-separated k=v) so an
    // A/B like "same query, AQE off" is one env var instead of a
    // recompile — measurement harness only, never read by graft.Bench
    sys.env.get("SPARK_GRAFT_CONF").toSeq.flatMap(_.split(';'))
      .map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // the result stage's name carries the scheduling call site
        // ("parquet at Foo.scala:123"); job properties don't in local mode
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          events.add((j.jobId,
            f"job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $site")): Unit
        }
    })
    // warm run first so the traced run sees steady-state timings
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    events.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    events.stream().sorted((a, b) => a._1.compareTo(b._1))
      .forEach(e => println(s"[jobtrace] ${e._2}"))
    println(f"[jobtrace] TOTAL $name: $total%.3f s, ${events.size} jobs")
    spark.stop()
  }
}
