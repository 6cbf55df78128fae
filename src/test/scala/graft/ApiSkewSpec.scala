package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.api.LtcvApi
import graft.query.Skew
import graft.streaming.EventWindows

class ApiSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val cat = FixtureWorld.catalog(spark)
  import spark.implicits._

  test("getObjectInfos groups member ids per rootid (ltcv.py:38-291)") {
    val infos = LtcvApi.getObjectInfos(cat, "pvid-pv1", rootids = Seq("root-0"))
      .collect()
    assert(infos.length == 1)
    val r = infos.head
    assert(r.getAs[String]("rootid") == "root-0")
    assert(r.getSeq[Long](r.fieldIndex("diaobjectids")) == Seq(100L, 1000L))
  }

  test("getObjectInfos falls back to weighted source positions (ltcv.py:826-878)") {
    // FixtureWorld's diaobject_position table is empty, so without the
    // flag every position is null...
    val allRoots = FixtureWorld.roots.map(_._1)
    val bare = LtcvApi.getObjectInfos(cat, "pvid-pv1", rootids = allRoots).collect()
    assert(bare.forall(r => r.isNullAt(r.fieldIndex("ra"))))

    // ...and with it, each root gets the (S/N)²-weighted mean of its
    // detections — which all sit exactly at the root's coordinates.
    val infos = LtcvApi.getObjectInfos(cat, "pvid-pv1", rootids = allRoots,
        useWeightedSourcePositions = true).collect()
      .map(r => r.getAs[String]("rootid") ->
        (r.getAs[Double]("ra"), r.getAs[Double]("dec"))).toMap
    FixtureWorld.roots.foreach { case (root, ra, dec) =>
      assert(math.abs(infos(root)._1 - ra) < 1e-9, root)
      assert(math.abs(infos(root)._2 - dec) < 1e-9, root)
    }

    // a root WITH a diaobject_position row keeps it unless
    // always_use_weighted_source_positions
    import spark.implicits._
    val posDf = Seq((1000L, FixtureWorld.bpvId("bpv1", "diaobject"), 99.0, 9.0))
      .toDF("diaobjectid", "base_procver_id", "ra", "dec")
    val cat2 = cat.copy(diaobjectPosition = posDf)
    val withPos = LtcvApi.getObjectInfos(cat2, "pvid-pv1", rootids = allRoots,
        useWeightedSourcePositions = true).collect()
      .map(r => r.getAs[String]("rootid") -> r.getAs[Double]("ra")).toMap
    assert(withPos("root-0") == 99.0)
    assert(math.abs(withPos("root-1") - 42.0) < 1e-9)
    val always = LtcvApi.getObjectInfos(cat2, "pvid-pv1", rootids = allRoots,
        alwaysUseWeightedSourcePositions = true).collect()
      .map(r => r.getAs[String]("rootid") -> r.getAs[Double]("ra")).toMap
    assert(math.abs(always("root-0") - 42.0) < 1e-9)

    // uncertainty fields ride along on the weighted path only: a root
    // whose position came from diaobject_position keeps them null
    val unc = LtcvApi.getObjectInfos(cat2, "pvid-pv1", rootids = allRoots,
        useWeightedSourcePositions = true).collect()
      .map(r => r.getAs[String]("rootid") ->
        r.isNullAt(r.fieldIndex("rastd"))).toMap
    assert(unc("root-0"), "table-sourced position must not carry a weighted std")
    assert(!unc("root-1"), "weighted position must carry its std")
  }

  test("getObjectInfos include_hostinfo attaches the best-prio host per root") {
    import spark.implicits._
    // root-0's members (100, 1000) match hosts HA (prio 1) and HB
    // (prio 0) — the prio-0 host must win at the root level. The third
    // match is MORE attractive (prio -1) but belongs to a base procver
    // OUTSIDE the requested chain: it must be ignored, like every
    // other path of this call restricts by dims.priorities.
    val bpv = FixtureWorld.bpvId("bpv1", "diaobject")
    val hosts = Seq(
      ("uuid-a", "cat", "HA", bpv, 10.0, 20.0, "{}"),
      ("uuid-b", "cat", "HB", bpv, 30.0, 40.0, "{\"z\":0.1}"))
      .toDF("id", "host_catalog", "host_id", "base_procver_id", "ra", "dec", "info")
    val matches = Seq(
      (100L, "uuid-a", bpv, 1.toShort),
      (1000L, "uuid-b", bpv, 0.toShort),
      (100L, "uuid-a", "bpv-experimental:diaobject", (-1).toShort))
      .toDF("diaobjectid", "host_galaxy_id", "base_procver_id", "prio")
    val cat2 = cat.copy(hostGalaxy = Some(hosts), diaobjectHostMatch = Some(matches))
    val infos = LtcvApi.getObjectInfos(cat2, "pvid-pv1",
        rootids = FixtureWorld.roots.map(_._1), includeHostinfo = true)
      .collect().map(r => r.getAs[String]("rootid") -> r).toMap
    val r0 = infos("root-0")
    assert(r0.getAs[String]("hostgal_id") == "HB")
    assert(r0.getAs[Short]("hostgal_prio") == 0)
    assert(r0.getAs[Double]("hostgal_ra") == 30.0)
    assert(r0.getAs[String]("hostgal_info") == "{\"z\":0.1}")
    // roots without any match keep null host columns
    assert(infos.exists { case (root, r) =>
      root != "root-0" && r.isNullAt(r.fieldIndex("hostgal_id")) })
    // without the flag (or without host tables) the columns are absent
    assert(!LtcvApi.getObjectInfos(cat2, "pvid-pv1",
      rootids = Seq("root-0")).columns.contains("hostgal_id"))
    assert(!LtcvApi.getObjectInfos(cat, "pvid-pv1", rootids = Seq("root-0"),
      includeHostinfo = true).columns.contains("hostgal_id"))
  }

  test("random object is reproducible with a seed and member of the procver") {
    val a = LtcvApi.randomObject(cat, "pvid-pv1", seed = 7)
    val b = LtcvApi.randomObject(cat, "pvid-pv1", seed = 7)
    assert(a == b)
    assert(FixtureWorld.roots.map(_._1).contains(a))
  }

  test("countSources: exact count plus plan-stats estimate (A5)") {
    val (exact, est) = LtcvApi.countSources(cat, "pvid-pv3")
    assert(exact == FixtureWorld.naiveDedup(FixtureWorld.detections, "pv3").size)
    assert(est == -1 || est > 0)   // estimate present only with CBO stats
  }

  test("salted collect_list equals direct collection under skew") {
    // combinable aggregates (sum/count) never need salting — partial
    // aggregation already bounds reducer input; collect_list is the
    // one whose buffer grows with rows, so it is what Skew salts
    val skewed = (0 until 20000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "v").repartition(8)
    val direct = skewed.groupBy("k")
      .agg(array_sort(collect_list(col("v"))).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val salted = Skew.saltedCollectList(skewed, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(salted == direct)
    assert(salted("hot").size == 2000)
  }

  test("watermarked windowed aggregation over a streamed event file") {
    val dir = Files.createTempDirectory("evstream").toString
    val ck = Files.createTempDirectory("evck").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("ts", "event_type", "value")
      .write.parquet(s"$dir/batch1")
    val q = EventWindows.runFileStream(spark, s"$dir/*",
      Tables.events(spark, "/root/testdata/sf0.001")
        .select("ts", "event_type", "value").schema,
      "ts", "event_type", "evwin_test", ck)
    q.processAllAvailable(); q.stop()
    // append mode emits only watermark-closed windows; compare against
    // the batch computation restricted to emitted windows
    val got = spark.sql("SELECT * FROM evwin_test")
    val batch = EventWindows.windowedCounts(
      Tables.events(spark, "/root/testdata/sf0.001").select("ts", "event_type", "value"),
      "ts", "event_type")
    val gotMap = got.collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> r.getLong(3)).toMap
    val batchMap = batch.collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> r.getLong(3)).toMap
    assert(gotMap.nonEmpty)
    gotMap.foreach { case (k, n) => assert(batchMap(k) == n, s"window $k") }
  }

  test("streamed session windows equal the batch computation") {
    val dir = Files.createTempDirectory("sessstream").toString
    val ck = Files.createTempDirectory("sessck").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("ts", "user_id")
    ev.write.parquet(s"$dir/batch1")
    val query = EventWindows.sessionCounts(
        spark.readStream.schema(ev.schema).parquet(s"$dir/*"),
        "ts", "user_id", gap = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_test").option("checkpointLocation", ck).start()
    query.processAllAvailable(); query.stop()
    // append mode emits only watermark-finalized sessions; every one
    // of them must appear identically in the batch computation
    val got = spark.sql("SELECT * FROM sess_test").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val batch = EventWindows.sessionCounts(ev, "ts", "user_id", gap = "10 minutes")
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (k, n) => assert(batch(k) == n, s"session $k") }
  }

  test("session_window sessions agree with Temporal.sessionize labels") {
    // same gap semantics except the exactly-equal-gap edge (strict vs
    // inclusive); the fixture avoids exact 10-minute gaps so the two
    // definitions must coincide.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("ts", "user_id")
    val fromWindows = EventWindows.sessionCounts(ev, "ts", "user_id",
        gap = "10 minutes")
      .groupBy("user_id").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_sessions"),
        org.apache.spark.sql.functions.sum("n").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fromSessionize = graft.query.Temporal.sessionize(ev, "user_id", "ts",
        org.apache.spark.sql.functions.expr("INTERVAL 10 MINUTES"))
      .groupBy("user_id").agg(
        org.apache.spark.sql.functions.max("session_seq").as("n_sessions"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromWindows === fromSessionize)
  }

  test("brokerinfo fetch + classification envelope explode") {
    import graft.api.BrokerInfo
    val bi = Seq(
      ("fink", "t1", 100L, 10L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        """{"classifications": [{"classId": 111, "probability": 0.9}, {"classId": 42, "probability": 0.1}]}"""),
      ("antares", "t2", 100L, 10L, java.sql.Timestamp.valueOf("2026-01-02 00:00:00"),
        """{"classifications": [{"classId": 7, "probability": 1.0}]}"""),
      ("fink", "t1", 999L, 11L, java.sql.Timestamp.valueOf("2026-01-03 00:00:00"),
        """{"classifications": []}"""))
      .toDF("brokername", "topic", "diasourceid", "diaobjectid", "msgtime", "info")
    val got = BrokerInfo.fetch(bi, Seq(100L))
    assert(got.count() == 2)
    val fink = BrokerInfo.fetch(bi, Seq(100L), Some("fink"))
    assert(fink.count() == 1)
    val cls = BrokerInfo.explodeClassifications(got).collect()
      .map(r => (r.getAs[String]("brokername"), r.getAs[Int]("classid"), r.getAs[Double]("probability")))
    assert(cls.toSet == Set(("fink", 111, 0.9), ("fink", 42, 0.1), ("antares", 7, 1.0)))
  }
}
