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
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(s"bad SPARK_GRAFT_CONF entry (need k=v): '$kv'")
        }
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // the result stage's name carries the scheduling call site
        // ("parquet at Foo.scala:123"); job properties don't in local mode.
        // AQE/broadcast futures ("withThreadLocalCaptured") and
        // foreachBatch jobs ("start at ...") attribute every job to one
        // anonymous site — for those, append the per-STAGE call sites,
        // which name the real operators the job materialized (this is
        // what makes an st4-style 86-jobs-at-one-site census readable).
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val anon = site.contains("withThreadLocalCaptured") ||
          site.startsWith("start at")
        val detail0 =
          if (!anon) site
          else {
            val ss = j.stageInfos.map(_.name).distinct
              .filterNot(_.contains("withThreadLocalCaptured"))
            if (ss.isEmpty) site
            else s"$site <- [${ss.take(4).mkString(" | ")}]"
          }
        // jobs labeled via setJobDescription (guide §1.5 — the silver
        // write path does) carry the label in the job properties even
        // when every call site collapses to the stream's start()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val detail = desc.fold(detail0)(d => s"[$d] $detail0")
        starts.put(j.jobId, (System.nanoTime(), detail)): Unit
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
