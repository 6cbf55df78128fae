package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiler: `runMain graft.BenchOne <name> [nRuns]` over
  * SPARK_GRAFT_SF_DIR — same session config and cache hygiene as Bench,
  * prints per-run seconds so plan changes can be measured in isolation
  * without paying for the whole battery. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // experiment-only conf overrides (see JobTrace) — never in Bench
    sys.env.get("SPARK_GRAFT_CONF").toSeq.flatMap(_.split(';'))
      .map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(s"bad SPARK_GRAFT_CONF entry (need k=v): '$kv'")
        }
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job/stage counter: fixed-cost queries (exponent ≈ 0) are paying
    // scheduler round-trips, so the JOB COUNT is the signal a wall-clock
    // number alone can't give — same diagnostic that found the 18
    // count-jobs behind the SilverStore footer fix
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size): Unit
        }
      })
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val (j0, s0) = (jobs.get(), stages.get())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events arrive asynchronously on the bus — sample the
      // counters only after a drain pause (JobTrace does the same), or
      // a run's jobs/stages undercount and bleed into the next delta;
      // the pause sits outside the timed region
      Thread.sleep(500)
      println(f"[benchone] $name run$i: $secs%.3f s" +
        s" jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
