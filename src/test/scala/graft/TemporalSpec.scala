package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.query.Temporal

/** As-of join and sessionization — the single-shuffle window programs
  * behind j8/w3, checked against brute-force formulations. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Irregular fixture: user 1 interleaves, user 2 has only left rows,
    * user 3 only right rows, plus an exact-equal-timestamp case and a
    * left row before any right row. */
  lazy val leftDf = Seq(
    (1L, 100L, ts("2024-01-01 10:00:00")),  // before any right row
    (1L, 101L, ts("2024-01-01 10:05:00")),  // equal ts to right 201
    (1L, 102L, ts("2024-01-01 11:00:00")),
    (2L, 103L, ts("2024-01-01 09:00:00"))
  ).toDF("k", "lid", "lt")

  lazy val rightDf = Seq(
    (1L, 201L, ts("2024-01-01 10:05:00"), "a"),
    (1L, 202L, ts("2024-01-01 10:30:00"), "b"),
    (3L, 203L, ts("2024-01-01 08:00:00"), "c")
  ).toDF("k", "rid", "rt", "payload")

  test("asofJoin equals the brute-force latest-at-or-before join") {
    val got = Temporal.asofJoin(leftDf, rightDf, "k", "lt", "rt")
      .select("lid", "rid", "payload")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2)))))
      .toMap
    assert(got === Map(
      100L -> None,                  // no right row yet
      101L -> Some((201L, "a")),     // equality matches
      102L -> Some((202L, "b")),     // latest of the two
      103L -> None))                 // user has no right rows at all
  }

  test("tolerance nulls out stale matches but keeps fresh ones") {
    val got = Temporal.asofJoin(leftDf, rightDf, "k", "lt", "rt",
        tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // 102 is 30 min after right 202 -> gated out; 101 is 0 min -> kept
    assert(got === Map(100L -> None, 101L -> Some(201L),
      102L -> None, 103L -> None))
  }

  test("tieBreak pins the winner among duplicate right instants") {
    val dup = Seq(
      (1L, 301L, ts("2024-01-01 10:00:00"), "x"),
      (1L, 302L, ts("2024-01-01 10:00:00"), "y")
    ).toDF("k", "rid", "rt", "payload")
    val probe = Seq((1L, 400L, ts("2024-01-01 10:01:00"))).toDF("k", "lid", "lt")
    val got = Temporal.asofJoin(probe, dup, "k", "lt", "rt",
        tieBreak = Seq("rid"))
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(302L)) // last in ascending rid order wins
  }

  test("sessionize numbers gap-separated sessions per key in order") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:20:00")),  // 20 min gap: same session
      (1L, 3L, ts("2024-01-01 11:00:00")),  // 40 min gap: new session
      (1L, 4L, ts("2024-01-01 11:30:00")),  // exactly 30 min: same (> only)
      (2L, 5L, ts("2024-01-01 10:00:00"))
    ).toDF("k", "eid", "t")
    val got = Temporal.sessionize(ev, "k", "t", expr("INTERVAL 30 MINUTES"))
      .select("eid", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("null timestamps: right rows never match, left rows pass unmatched") {
    val l = Seq((1L, 500L, Option(ts("2024-01-01 10:10:00"))),
        (1L, 501L, Option.empty[java.sql.Timestamp]))
      .toDF("k", "lid", "lt")
    val r = Seq((1L, 600L, Option(ts("2024-01-01 10:00:00")), "ok"),
        (1L, 601L, Option.empty[java.sql.Timestamp], "poison"))
      .toDF("k", "rid", "rt", "payload")
    val got = Temporal.asofJoin(l, r, "k", "lt", "rt")
      .select("lid", "rid")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got === Map(500L -> Some(600L), 501L -> None))
  }

  test("null keys follow equi-join semantics: no fabricated null-to-null match") {
    val l = Seq((Option(1L), 500L, ts("2024-01-01 10:10:00")),
        (Option.empty[Long], 501L, ts("2024-01-01 10:10:00")))
      .toDF("k", "lid", "lt")
    val r = Seq((Option(1L), 600L, ts("2024-01-01 10:00:00")),
        (Option.empty[Long], 601L, ts("2024-01-01 10:00:00")))
      .toDF("k", "rid", "rt")
    val got = Temporal.asofJoin(l, r, "k", "lt", "rt")
      .select("lid", "rid")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    // a SQL as-of equi-join never matches NULL = NULL: the null-key
    // left row passes through unmatched
    assert(got === Map(500L -> Some(600L), 501L -> None))
  }

  test("asofJoin plan is one window over one shuffle - no join node") {
    val plan = Temporal.asofJoin(leftDf, rightDf, "k", "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), s"expected a window in:\n$plan")
  }
}
