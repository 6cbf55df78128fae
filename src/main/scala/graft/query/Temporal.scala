package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins and event sequencing the reference expresses with
  * correlated subqueries / window SQL (prv-source reconstruction,
  * `projectsim.py:174-210`; latest-row-before-t lookups in
  * `src/ltcv.py`'s detection queries) — re-expressed as single-shuffle
  * window programs.
  *
  * Scale notes (100 TB): both operators shuffle each input row exactly
  * once, on the entity key, then sort within partition — the
  * merge-join shape. There is no pairwise candidate generation at all,
  * so a "power user" with millions of events costs O(n log n) in its
  * sort, never O(n²) (contrast the bucketed range join in
  * [[graft.queries.Relational.j7RangeJoin]], which bounds but cannot
  * eliminate candidate pairs). The per-key event list must fit a
  * partition's sort spill budget, which ExternalSorter handles by
  * spilling — no OOM cliff.
  */
object Temporal {

  /** As-of join: for each left row, the single most recent right row
    * with the same `key` and `right.rightTime <= left.leftTime`
    * (at-or-before semantics; ties at equal time match). Left-outer:
    * unmatched left rows keep null right columns.
    *
    * Implementation: tag + union both sides, then one
    * `last(_, ignoreNulls)` carry-forward window partitioned by key
    * and ordered by (time, side) — right rows sort before left rows at
    * equal timestamps so equality matches. The whole right payload
    * travels as ONE struct, so all matched columns come from the same
    * right row even when some of its fields are legitimately null.
    *
    * `tolerance` (an INTERVAL column, e.g. `expr("INTERVAL 7 DAYS")`)
    * nulls out matches older than `leftTime - tolerance`.
    *
    * CONTRACT: right rows should be unique per (key, rightTime) — at
    * duplicate instants pass `tieBreak` columns (ascending; the LAST
    * row in that order wins) to make the matched row deterministic.
    * Column names must not collide between left and right except
    * `key`; alias the right side before calling.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      tolerance: Option[Column] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val rPayload = right.columns.filterNot(_ == key).toSeq
    val lPayloadType = left.select(struct(left.columns.map(col): _*)).schema.head.dataType
    val rPayloadType = right.select(struct(rPayload.map(col): _*)).schema.head.dataType
    val lNorm = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_side"), struct(left.columns.map(col): _*).as("_lp"),
      lit(null).cast(rPayloadType).as("_rp"))
    // a null-time right row can never be "most recent at-or-before"
    // anything — and NULLS FIRST ordering would otherwise make it the
    // carry for the whole key. Null-time LEFT rows stay (left-outer
    // contract) and match nothing, since they too sort before every
    // real instant. Null KEYS follow equi-join semantics: a window's
    // partitionBy would group null keys TOGETHER (fabricating matches
    // no SQL as-of join would produce), so null-key right rows are
    // dropped and null-key left rows pass through unmatched.
    val rNorm = right.filter(col(rightTime).isNotNull && col(key).isNotNull)
      .select(col(key).as("_k"), col(rightTime).as("_t"),
        lit(0).as("_side"), lit(null).cast(lPayloadType).as("_lp"),
        struct(rPayload.map(col): _*).as("_rp"))
    // _side orders right(0) before left(1) at equal _t: at-or-before
    // includes equality. tieBreak fields order duplicate right
    // instants; left rows (null _rp) sort among themselves at equal
    // (_t, _side) arbitrarily, which is fine — they all see the same
    // carry state.
    val ord: Seq[Column] = Seq(col("_t"), col("_side")) ++
      tieBreak.map(c => col("_rp").getField(c))
    val w = Window.partitionBy("_k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lNorm.unionByName(rNorm)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val gated = tolerance match {
      case Some(tol) => carried.withColumn("_m",
        when(col("_t") - col("_m").getField(rightTime) <= tol, col("_m")))
      case None => carried
    }
    gated.select(
      left.columns.toSeq.map(c => col("_lp").getField(c).as(c)) ++
        rPayload.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Gap-based sessionization: `session_seq` numbers each `key`'s
    * sessions 1..n in time order, where a new session starts whenever
    * the gap to the previous event exceeds `gap` (an INTERVAL column).
    * Appends `session_seq` to the input columns.
    *
    * One window over (key, time): a boundary flag from `lag`, then a
    * running sum of boundaries — both ride the same sort. Duplicate
    * (key, time) instants land in the same session but make boundary
    * placement among themselves nondeterministic; pass `tieBreak` to
    * pin the order if the input has duplicate instants.
    */
  def sessionize(events: DataFrame, key: String, time: String,
      gap: Column, tieBreak: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (time +: tieBreak).map(col)
    val w = Window.partitionBy(key).orderBy(ord: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(time), 1).over(w)
    events
      .withColumn("_boundary",
        when(prev.isNull || col(time) - prev > gap, 1L).otherwise(0L))
      .withColumn("session_seq", sum("_boundary").over(run))
      .drop("_boundary")
  }

  /** Ordered-step event funnel — the product-analytics staple: how
    * many users performed step 1, then step 2 STRICTLY AFTER their
    * first step-1 event, then step 3 after that, and so on. Semantics
    * are the standard "first qualifying event per step" funnel: a
    * user's step-k timestamp is their earliest step-k event after
    * their step-(k−1) timestamp; a user missing any step drops out of
    * all later steps. Output: (step, step_name, n_users), one row per
    * step.
    *
    * Scale shape: per step, the scan filters to that step's event
    * type, the filtered events join the previous step's one-row-per-
    * user frame, and a partial-aggregated min collapses back to one
    * row per user. The join shuffles the step-typed EVENT rows (the
    * per-user min can only be taken after comparing each event to
    * _tp), so per-step cost is linear in that type's event volume —
    * the funnel's survivor set, usually a small slice of the stream —
    * while the carried state stays one timestamp per user. No window
    * over a user's full history. `tsCol` must be a totally-ordered
    * numeric column (use unix_micros for timestamps). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("_t"))
    val frames = steps.tail.scanLeft(first) { (prev, st) =>
      events.filter(col(typeCol) === st)
        .join(prev.select(col(userCol), col("_t").as("_tp")), Seq(userCol))
        .filter(col(tsCol) > col("_tp"))
        .groupBy(userCol).agg(min(col(tsCol)).as("_t"))
    }
    frames.zip(steps).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Rolling active-user counts — DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per day. WAU uses the scalable
    * contribute-forward pattern: each distinct (user, day) activity
    * row explodes into the 7 window-days it contributes to, then one
    * distinct-count per window-day — a LINEAR shuffle in activity
    * volume, instead of a per-day range self-join (quadratic in the
    * window) or a sliding distinct-count window (no engine computes
    * those incrementally). Day index is exact integer division of the
    * microsecond epoch. Window-days past the observed range are kept
    * only if they have DAU (trailing windows of silent days report
    * nothing — the dashboard convention).
    *
    * Output: (day, dau, wau, stickiness 4 dp). At real scale the exact
    * countDistinct swaps for HLL sketches merged across days —
    * assignment shape unchanged. */
  def activeUsers(events: DataFrame, userCol: String, tsUsCol: String): DataFrame = {
    val dayUs = 86400000000L
    val activity = events
      .select(col(userCol), expr(s"$tsUsCol div $dayUs").as("_day"))
      .distinct()
    val dau = activity.groupBy(col("_day").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = activity
      .select(col(userCol), explode(sequence(col("_day"), col("_day") + 6)).as("day"))
      .groupBy("day")
      .agg(countDistinct(col(userCol)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        round(col("dau").cast("double") / col("wau"), 4))
  }

  /** Per-user daily-volume anomaly flags — the usage-spike monitor an
    * event pipeline alerts on: each user's daily event counts scored
    * as z-scores against their OWN history (population mean/std over
    * the user's active days), |z| ≥ `zThreshold` flagged. Moments use
    * the centered two-pass formulation (the a13 numeric-portability
    * rule: Welford accumulation is engine-specific, one-pass nΣx²−(Σx)²
    * cancels); a zero-variance history scores 0 everywhere (no scale
    * to deviate against). Silent days are NOT zero-filled — the score
    * is over active days only, the convention that keeps sparse users
    * from looking anomalous every time they appear.
    *
    * Plan shape: three partial-aggregated groupBys on (user[, day]) +
    * two user-keyed joins; nothing window-shaped, nothing per-user
    * serial. */
  def dailyAnomalies(events: DataFrame, userCol: String, tsUsCol: String,
      zThreshold: Double = 2.0): DataFrame = {
    val dayUs = 86400000000L
    val daily = events
      .select(col(userCol), expr(s"$tsUsCol div $dayUs").as("day"))
      .groupBy(userCol, "day").agg(count(lit(1)).as("n_events"))
    val m = daily.groupBy(userCol)
      .agg(count(lit(1)).as("_nd"),
        avg(col("n_events").cast("double")).as("_mean"))
    val m2 = daily.join(m, Seq(userCol))
      .groupBy(userCol)
      .agg(sum((col("n_events") - col("_mean")) *
        (col("n_events") - col("_mean"))).as("_s2"))
    daily.join(m, Seq(userCol)).join(m2, Seq(userCol))
      .withColumn("_std", sqrt(col("_s2") / col("_nd")))
      .withColumn("z", when(col("_std") > 0,
          round((col("n_events") - col("_mean")) / col("_std"), 4))
        .otherwise(lit(0.0)))
      .withColumn("is_anomaly", abs(col("z")) >= zThreshold)
      .select(col(userCol), col("day"), col("n_events"), col("z"),
        col("is_anomaly"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — the clickstream model behind next-action prediction
    * and funnel discovery: count adjacent (prev → next) event-type
    * pairs per user (ordered by time with a unique tiebreak column so
    * the sequence is total-ordered on any engine), then the
    * conditional probability per source type. Output: (from_type,
    * to_type, n, p 4 dp).
    *
    * Plan shape: one per-user lag window (tiny partitions) + two
    * partial-aggregated groupBys; the per-source totals derive from
    * the pair counts (type²-bounded), never a second event scan. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    val pairs = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("_tot"))
    pairs.join(totals, Seq("from_type"))
      .withColumn("p", round(col("n").cast("double") / col("_tot"), 4))
      .drop("_tot")
  }

  /** Top session paths — the clickstream "common journeys" report:
    * sessionize each user's events (gap rule, [[sessionize]]), take the
    * first `maxSteps` event types of every session in time order, join
    * them into a path string, and rank the `k` most frequent paths.
    * Ties in frequency break on the path text so the ranking is
    * deterministic on any engine. Output: (path, n_sessions, rank).
    *
    * Plan shape: ONE shuffle on the user key carries the sessionize
    * boundary window, the per-session row_number, and (after the
    * rn ≤ maxSteps prune) the path assembly — the sort is shared, and
    * path assembly aggregates at most `maxSteps` rows per session via
    * a sort_array over (rn, type) structs (order-insensitive partial
    * aggregation, no collect_list ordering assumption). The final
    * ranking window is global but runs over the path-frequency frame,
    * whose cardinality is bounded by |event types|^maxSteps — a few
    * thousand rows, not the event volume; at a truly unbounded path
    * vocabulary, put a per-partition top-k prune in front (the
    * [[graft.pipeline.TextAnalysis.topNgrams]] note).
    * `tsUsCol` must be totally ordered with `tieCol` unique per user. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, tieCol: String, gapUs: Long,
      maxSteps: Int = 5, k: Int = 20): DataFrame = {
    val sess = sessionize(events, userCol, tsUsCol, lit(gapUs),
      tieBreak = Seq(tieCol))
    val w = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(col(tsUsCol), col(tieCol))
    val paths = sess
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxSteps)
      .groupBy(col(userCol), col("session_seq"))
      .agg(array_sort(collect_list(struct(col("_rn"),
        col(typeCol).as("_t")))).as("_steps"))
      .select(concat_ws(">",
        transform(col("_steps"), s => s("_t"))).as("path"))
    val counts = paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
    val rk = Window.orderBy(desc("n_sessions"), col("path"))
    counts.withColumn("rank", row_number().over(rk).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Weekly cohort retention — the other product-analytics staple:
    * users cohorted by their first-activity week, then for each
    * (cohort, week offset) the count of cohort members active that
    * week and the retention rate. Week index is exact integer division
    * of the microsecond epoch (`div`), so cohort assignment replays on
    * any engine. Output: (cohort_week, week_offset, n_active,
    * cohort_size, retention 4 dp).
    *
    * Scale shape: distinct (user, week) activity partial-aggregates
    * map-side; the cohort table is user-cardinality and joins back on
    * the user key; the matrix aggregate is cohorts×offsets rows. */
  def retention(events: DataFrame, userCol: String, tsUsCol: String): DataFrame = {
    val weekUs = 604800000000L
    val activity = events
      .select(col(userCol), expr(s"$tsUsCol div $weekUs").as("_wk"))
      .distinct()
    val cohort = activity.groupBy(userCol).agg(min(col("_wk")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    activity.join(cohort, Seq(userCol))
      .groupBy(col("cohort_week"), (col("_wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("cohort_size"), 4))
  }

  /** Daily trending leaderboard: the top-`k` event types of each day
    * by volume, with the day-over-day delta (null when the type has no
    * row on the PREVIOUS calendar day — absence is "new entrant", not
    * zero, so a type surging from nothing is visibly distinct from one
    * growing from a small base).
    *
    * Shape: one map-side-combined (day, type) count — the only pass
    * over the event corpus — then a lag window and the top-k rank
    * window both run on that day×type-bounded frame (thousands of
    * rows at ANY corpus size; the windows never see raw events). Rank
    * ties break by type name for a total deterministic order. */
  def trendingTypes(events: DataFrame, typeCol: String, tsUsCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val counts = events
      .select(expr(s"$tsUsCol div $dayUs").as("day"), col(typeCol).as("event_type"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"))
    val wLag = Window.partitionBy("event_type").orderBy("day")
    val wRank = Window.partitionBy("day").orderBy(col("n").desc, col("event_type"))
    counts
      .withColumn("_prev_day", lag("day", 1).over(wLag))
      .withColumn("_prev_n", lag("n", 1).over(wLag))
      .withColumn("delta",
        when(col("_prev_day") === col("day") - 1, col("n") - col("_prev_n")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("day"), col("rank"), col("event_type"), col("n"), col("delta"))
  }
}
