package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary stage profiler for d3_simhash (delete after use). */
object ProfileD3 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

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
    import graft.pipeline.Dedup

    if (args.headOption.contains("hist")) {
      // hamming histograms: candidates vs verified pairs, at h=8
      val pairs = Dedup.simhashNearDups(Tables.documents(spark, sfDir),
        "doc_id", "text", maxHamming = 8, shingleWords = 3, threshold = 0.5)
      println("[hist] verified pairs by hamming:")
      pairs.groupBy("hamming").count().orderBy("hamming").collect()
        .foreach(r => println(s"[hist]   h=${r.get(0)} n=${r.get(1)}"))
      // candidate volume at each max-h (re-run candidate stage per h)
      for (h <- Seq(3, 4, 6, 8)) {
        val p = Dedup.simhashNearDups(Tables.documents(spark, sfDir),
          "doc_id", "text", maxHamming = h, shingleWords = 3, threshold = 0.5)
        val t0 = System.nanoTime()
        val n = p.count()
        println(f"[hist] maxHamming=$h verified=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    if (args.headOption.contains("d2")) {
      // minhash near-dup stage decomposition over an arbitrary corpus
      // path (defaults to the sf documents table)
      val docs = args.lift(1).map(spark.read.parquet(_))
        .getOrElse(Tables.documents(spark, sfDir))
        .select(col("doc_id"), col("text"))
      for (it <- 1 to 3) {
        println(s"--- d2 iteration $it ---")
        val sigs = time("sigs build+persist+count") {
          val s = Dedup.withMinhash(docs, "doc_id", "text", 3, 32).persist()
          s.count(); s
        }
        val buckets = Dedup.lshBuckets(sigs, 8, 4)
          .select(col("_band"), col("_bucket"), col("doc_id"))
        time("bucket rows")(buckets.count())
        val cands = buckets.select(col("_band"), col("_bucket"), col("doc_id").as("id_a"))
          .join(buckets.select(col("_band"), col("_bucket"), col("doc_id").as("id_b")),
            Seq("_band", "_bucket"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
        time("raw candidate pairs")(println(s"  raw=${cands.count()}"))
        val dedup = cands.dropDuplicates("id_a", "id_b")
        time("distinct candidate pairs")(println(s"  distinct=${dedup.count()}"))
        time("full d2")(
          Dedup.minhashNearDups(docs, "doc_id", "text", 3, 32, 8, 0.5).count())
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    if (args.headOption.contains("pairs")) {
      // ngramJaccardPairs: plain inverted index vs PPJoin prefix filter
      for (_ <- 1 to 3; pf <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val n = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
          "doc_id", "text", shingleWords = 3, threshold = 0.5,
          prefixFilter = pf).count()
        println(f"[pairs] prefixFilter=$pf n=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    val runs = if (args.nonEmpty) args(0).toInt else 2
    (1 to runs).foreach { it =>
      println(s"--- iteration $it ---")
      val docs = Tables.documents(spark, sfDir)
      val idCol = "doc_id"; val maxHamming = 8

      val base = time("base build (project+filter+persist+count)") {
        val b = Dedup.withShinglesAndSimhash(docs.select(col(idCol), col("text")),
            idCol, "text", 3, "_shingles", "_sim")
          .filter(size(col("_shingles")) > 0)
          .persist()
        b.count()
        b
      }
      val nBlocks = maxHamming + 2
      val bounds = (0 to nBlocks).map(i => i * 64 / nBlocks)
      def blockVal(sim: org.apache.spark.sql.Column, b: Int) = {
        val width = bounds(b + 1) - bounds(b)
        shiftrightunsigned(sim, bounds(b)).bitwiseAND(lit((1L << width) - 1L))
      }
      val combos = for { i <- 0 until nBlocks; j <- i + 1 until nBlocks } yield (i, j)
      val keyed = base.select(col(idCol), col("_sim"),
          explode(array(combos.zipWithIndex.map { case ((i, j), c) =>
            struct(lit(c).as("_comb"),
              blockVal(col("_sim"), i).as("_v1"),
              blockVal(col("_sim"), j).as("_v2"))
          }: _*)).as("_k"))
        .select(col(idCol), col("_sim"),
          col("_k._comb").as("_comb"), col("_k._v1").as("_v1"), col("_k._v2").as("_v2"))
      val cands = time("candidates (join+hamming+dedup+count)") {
        val c = keyed.select(col("_comb"), col("_v1"), col("_v2"),
            col(idCol).as("id_a"), col("_sim").as("_sim_a"))
          .join(keyed.select(col("_comb"), col("_v1"), col("_v2"),
            col(idCol).as("id_b"), col("_sim").as("_sim_b")), Seq("_comb", "_v1", "_v2"))
          .filter(col("id_a") < col("id_b"))
          .filter(Dedup.hammingDist(col("_sim_a"), col("_sim_b")) <= maxHamming)
          .select(col("id_a"), col("id_b"),
            Dedup.hammingDist(col("_sim_a"), col("_sim_b")).as("hamming"))
          .dropDuplicates("id_a", "id_b")
          .persist()
        println(s"[profile]   n_candidates = ${c.count()}")
        c
      }
      time("verify (shingle joins + jaccard + noop)") {
        val sh = base.select(col(idCol), col("_shingles"))
        cands
          .join(sh.select(col(idCol).as("id_a"), col("_shingles").as("_sh_a")), Seq("id_a"))
          .join(sh.select(col(idCol).as("id_b"), col("_shingles").as("_sh_b")), Seq("id_b"))
          .withColumn("jaccard", Dedup.jaccard(col("_sh_a"), col("_sh_b")))
          .filter(col("jaccard") >= 0.5)
          .select(col("id_a"), col("id_b"), col("hamming"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
          .write.mode("overwrite").format("noop").save()
      }
      time("full query (noop, fresh plan)") {
        SparkEntry.queries("d3_simhash")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
