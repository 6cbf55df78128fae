package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Retrieval, TextAnalysis}

/** Specs for the round-14 operator additions: last-touch attribution
  * (ev13 — as-of with tolerance), MAD robust outliers (ev14), blocked
  * Levenshtein entity resolution (d17), teacher/student hard-negative
  * mining (r11), the packing audit (p12), and the cross-band color
  * as-of (a20). Each is checked against a hand-computed or naive
  * replay on engineered inputs; the battery oracle pins them on the
  * real tables.
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  // ---- ev13: last-touch attribution --------------------------------

  test("ev13 attribution: lookback window, latest-touch, direct fallback") {
    val dir = tmpDir("ev13")
    val us = 86400000000L // one day in micros
    def ts(day: Double): java.sql.Timestamp =
      new java.sql.Timestamp((day * us / 1000).toLong)
    // user 1: click day 1, view day 2, purchase day 3      -> view
    // user 2: click day 0, purchase day 10 (gap > 7 days)  -> direct
    // user 3: purchase day 5 with NO touches               -> direct
    // user 4: two views at the SAME instant, purchase then -> higher id
    val rows = Seq(
      (1L, ts(1.0), 1L, "click", 10.0),
      (2L, ts(2.0), 1L, "view", 0.0),
      (3L, ts(3.0), 1L, "purchase", 100.0),
      (4L, ts(0.0), 2L, "click", 0.0),
      (5L, ts(10.0), 2L, "purchase", 50.0),
      (6L, ts(5.0), 3L, "purchase", 25.0),
      (7L, ts(4.0), 4L, "view", 0.0),
      (8L, ts(4.0), 4L, "view", 0.0),
      (9L, ts(4.5), 4L, "purchase", 25.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Relational.ev13Attribution(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    // direct: users 2 (stale touch) and 3 (no touch) -> 75; view: users
    // 1 and 4 -> 125; total 200
    assert(got == Seq(
      ("direct", 2L, 75.0, 0.375),
      ("view", 2L, 125.0, 0.625)))
  }

  test("asofJoin tolerance boundary is inclusive") {
    val left = Seq((1L, 100L, "p1")).toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "t1")).toDF("k", "rt", "rtag")
    // gap 10 <= tolerance 10 -> match; tolerance 9 -> null
    val hit = graft.query.Temporal.asofJoin(left, right, "k", "t", "rt",
      tolerance = Some(lit(10L))).select("rtag").collect()
    val miss = graft.query.Temporal.asofJoin(left, right, "k", "t", "rt",
      tolerance = Some(lit(9L))).select("rtag").collect()
    assert(hit.head.getString(0) == "t1" && miss.head.isNullAt(0))
  }

  // ---- ev14: MAD robust outliers ------------------------------------

  test("madOutliers: hand-computed score, majority-constant group skipped") {
    // group a: values 1..9 plus a 100 spike. med = 5.5; sorted adevs
    // 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5 -> mad = 2.5 ->
    // threshold 3*1.4826*2.5 = 11.12; only the spike flags.
    val a = (1 to 9).map(v => ("a", v.toDouble)) :+ (("a", 100.0))
    // group b: constant 7s plus one 9 -> mad = 0 -> skipped entirely
    val b = Seq.fill(5)(("b", 7.0)) :+ (("b", 9.0))
    val got = TextAnalysis.madOutliers((a ++ b).toDF("g", "x"), "g", "x")
      .select("g", "x", "med", "mad", "robust_z").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getDouble(1) == 100.0)
    assert(r.getDouble(2) == 5.5 && r.getDouble(3) == 2.5)
    assert(math.abs(r.getDouble(4) - (94.5 / (1.4826 * 2.5))) < 1e-12)
  }

  test("madOutliers is partition-invariant") {
    val rows = (1 to 50).map(v => ("g", (v % 7).toDouble)) ++
      Seq(("g", 500.0), ("g", -500.0))
    val df = rows.toDF("g", "x")
    val one = TextAnalysis.madOutliers(df.coalesce(1), "g", "x")
      .orderBy("x").collect().toSeq
    val many = TextAnalysis.madOutliers(df.repartition(7), "g", "x")
      .orderBy("x").collect().toSeq
    assert(one == many && one.nonEmpty)
  }

  // ---- r11: hard-negative mining ------------------------------------

  test("hardNegatives pairs each gold doc with top non-gold ranks") {
    val ranked = Seq(
      (1L, "d1", 1L), (1L, "d2", 2L), (1L, "d3", 3L), (1L, "d4", 4L),
      (1L, "d5", 5L),
      (2L, "e1", 1L), (2L, "e2", 2L))
      .toDF("query_id", "doc_id", "rank")
    val gold = Seq((1L, "d2"), (1L, "d9"), (2L, "e1"), (2L, "e2"))
      .toDF("query_id", "doc_id")
    val got = Retrieval.hardNegatives(ranked, gold, "query_id", "doc_id",
        "rank", nNeg = 2)
      .select("query_id", "pos_doc_id", "neg_doc_id", "neg_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    // query 1: negatives are d1 (neg_rank 1) and d3 (neg_rank 2) —
    // d2 is gold, d9 is gold-but-unranked and must NOT appear as a
    // negative; both pair with each gold doc (d2 and d9).
    // query 2: every ranked doc is gold -> no triplets at all.
    assert(got == Set(
      (1L, "d2", "d1", 1L), (1L, "d2", "d3", 2L),
      (1L, "d9", "d1", 1L), (1L, "d9", "d3", 2L)))
  }

  // ---- d17: blocked entity resolution --------------------------------

  test("d17 entity resolution: blocking bounds pairs, lev threshold exact") {
    val dir = tmpDir("d17")
    val parts = Seq(
      (1L, "cold widget"), (2L, "cold widget"), (3L, "old widget"),
      (4L, "bold widget"), (5L, "blue widget"),
      (6L, "cold gear"), (7L, "old gear"))
      .toDF("p_partkey", "p_name")
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = graft.queries.Relational.d17EntityResolve(spark, dir)
      .select("name_a", "name_b", "lev", "n_a", "id_a")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // within 'widget': cold~old lev 1, cold~bold lev 1, bold~old lev 1
    // (drop the 'b'); blue~bold lev 3, blue~cold lev 4, blue~old lev 4
    // are all OVER the threshold. 'cold gear'~'cold widget' is never a
    // candidate (cross block) despite sharing a word. support/canonical
    // come from the distinct-key collapse: 'cold widget' has n=2,
    // canon id 1.
    assert(got == Set(
      ("bold widget", "cold widget", 1L, 1L, 4L),
      ("bold widget", "old widget", 1L, 1L, 4L),
      ("cold widget", "old widget", 1L, 2L, 1L),
      ("cold gear", "old gear", 1L, 1L, 6L)))
  }

  // ---- p12: packing audit --------------------------------------------

  test("p12 audit identities: token conservation, fullness, continuations") {
    val dir = tmpDir("p12")
    // doc lengths 300, 300, 500, 12 -> sequences of 512: seq0 holds
    // doc0(300)+doc1(212 start), seq1 holds doc1(88)+doc2(424 start),
    // seq2 holds doc2(76)+doc3(12) = 88 used (not full)
    val docs = Seq(
      (0L, Seq.fill(300)("w").mkString(" "), "en", "s", 1L),
      (1L, Seq.fill(300)("w").mkString(" "), "en", "s", 1L),
      (2L, Seq.fill(500)("w").mkString(" "), "en", "s", 1L),
      (3L, Seq.fill(12)("w").mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Corpus.p12PackAudit(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (0L, 2L, 512L, 0L, 0L, true),
      (1L, 2L, 512L, 1L, 1L, true),
      (2L, 2L, 88L, 1L, 1L, false)))
    assert(got.map(_._3).sum == 300 + 300 + 500 + 12)
  }

  // ---- j9: bucketed shuffle-free join --------------------------------

  test("bucketed join plan reads both sides with no exchange") {
    val d = "/root/testdata/sf0.001"
    import graft.layout.Bucketing
    val n = 16
    val li = Bucketing.bucketedTable(spark,
      Bucketing.tableName(d, "lineitem", "l_orderkey", n),
      Tables.lineitem(spark, d).select("l_orderkey", "l_extendedprice"),
      "l_orderkey", n, Bucketing.scratchDir(d, "lineitem", "l_orderkey", n))
    val ord = Bucketing.bucketedTable(spark,
      Bucketing.tableName(d, "orders", "o_orderkey", n),
      Tables.orders(spark, d).select("o_orderkey", "o_orderpriority"),
      "o_orderkey", n, Bucketing.scratchDir(d, "orders", "o_orderkey", n))
    val joined = li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
    // NOTE a partition-local Sort remains: since SPARK-28113 the scan
    // does not advertise bucket-sort order unless the legacy conf is
    // set (multiple files per bucket would need a merge). The shuffle
    // is the scale cost, and it is gone.
    // and the layout survives a REGISTRATION round-trip: dropping the
    // catalog entry and re-attaching via CREATE TABLE keeps the
    // exchange-free plan (the cross-session path)
    spark.sql(s"DROP TABLE ${Bucketing.tableName(d, "lineitem", "l_orderkey", n)}")
    val li2 = Bucketing.bucketedTable(spark,
      Bucketing.tableName(d, "lineitem", "l_orderkey", n),
      sys.error("must not rebuild — files are persisted"),
      "l_orderkey", n, Bucketing.scratchDir(d, "lineitem", "l_orderkey", n))
    val plan2 = li2.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan2.contains("SortMergeJoin") && !plan2.contains("Exchange"),
      plan2)
  }

  // ---- a20: cross-band color as-of -----------------------------------

  test("a20 color equals a naive per-detection scan") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.FastdbOps.a20Color(spark, d)
      .select("srcid", "n_srcid").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // naive replay over collected rows
    val src = Tables.lineitem(spark, d).select(
      concat_ws("-", col("l_orderkey") * 10 + col("l_linenumber"),
        col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long")).as("srcid"),
      (col("l_orderkey") % 300).cast("string").as("rootid"),
      col("l_returnflag").as("band"),
      (lit(60000.0) + (col("l_partkey") % 1000) * 0.1).as("mjd"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val byRoot = src.groupBy(_._2)
    val expected = src.filter(_._3 == "R").flatMap { case (id, root, _, t) =>
      val ns = byRoot(root).filter(x => x._3 == "N" && x._4 <= t)
      if (ns.isEmpty) None
      else Some(id -> ns.maxBy(x => (x._4, x._1))._1)
    }.toMap
    assert(got == expected && got.nonEmpty)
  }
}
