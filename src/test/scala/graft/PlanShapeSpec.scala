package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression guard on the physical-plan properties PLANS.md documents:
  * pushdown, pruning, broadcast dims, and partial aggregation. A change
  * that silently loses one of these would still pass value-correctness
  * tests but regress badly at scale. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("j1 join chain: dims broadcast, region predicate pushed, lineitem pruned") {
    val p = plan(graft.queries.Relational.j1JoinChain(spark, d))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, "all four dim joins broadcast")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("EqualTo(r_name,ASIA)"), "filter must reach the region scan")
    assert(p.contains("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      "lineitem scan must read exactly 3 columns")
  }

  test("a1 priority dedup: broadcast priorities + partial aggregation, no window sort") {
    val p = plan(graft.queries.FastdbOps.a1PriorityDedup(spark, d))
    assert(p.contains("BroadcastHashJoin"), "priority map must broadcast")
    assert(p.contains("partial_max_by") || p.contains("partial_max"),
      "dedup must combine map-side")
    assert(!p.contains("Window"), "A1 must not be a window sort")
  }

  test("time-travel cut pushes down to the parquet photometry scan") {
    // persist the fixture catalog to parquet so PushedFilters is visible
    val mem = FixtureWorld.catalog(spark)
    val dir = java.nio.file.Files.createTempDirectory("planshape").toString
    mem.diasource.write.parquet(s"$dir/diasource")
    mem.diaobject.write.parquet(s"$dir/diaobject")
    val cat = mem.copy(
      diasource = spark.read.parquet(s"$dir/diasource"),
      diaobject = spark.read.parquet(s"$dir/diaobject"))
    val p = plan(graft.query.Ltcv.sources(cat, "pvid-pv3",
      mjdNow = Some(60010.0), bands = Seq("r")))
    assert(p.contains("LessThanOrEqual(midpointmjdtai,60010.0)"),
      "mjd_now cut must reach the parquet scan as a pushed filter")
    // FileScan metadata truncates each entry at 100 chars, so match the
    // visible prefix of the band predicate
    assert(p.contains("EqualTo(ban") || p.contains("In(band"),
      "band filter must reach the parquet scan")
  }

  test("cone join is a zone equi-join, not a nested-loop cross join") {
    val p = plan(graft.queries.FastdbOps.j6ConeJoin(spark, d))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "zone key must make this an equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "no quadratic spatial join")
  }

  test("events scan prunes columns for the hot-window query") {
    val p = plan(graft.queries.FastdbOps.t6HotWindow(spark, d))
    assert(!p.contains("props"), "unused JSON column must not be read")
  }

  test("e3 export manifest: one-pass stratified packing; LM count joins broadcast") {
    // The stratified prefix sum range-partitions the kept corpus ONCE
    // and materializes it (localCheckpoint pins the partition
    // boundaries for both the row and offset subtrees), so the final
    // plan contains NO pack-side range exchange — only the
    // presentation ORDER BY's. A per-split pack would show three
    // materializations / six exchanges.
    val p = plan(graft.queries.Corpus.e3ExportManifest(spark, d))
    val packExchanges = p.split("\n")
      .count(l => l.contains("rangepartitioning") && l.contains("REPARTITION_BY_COL"))
    assert(packExchanges == 0,
      s"pack input must be materialized once, found $packExchanges live pack exchanges")
    assert(p.contains("Scan ExistingRDD"),
      "the packed frame must read from the materialized checkpoint")
    val p9 = plan(graft.queries.Quality.t9LmScore(spark, d))
    assert(p9.contains("BroadcastHashJoin"),
      "bigram count tables must broadcast back onto the gram rows under AQE")
  }

  test("span dedup: one window-row generation, window decision, no join-back") {
    // r16: duplicateSpans is a single Window over gram, not
    // groupBy(gram) + join-back — the join form generated the corpus
    // k-window rows twice (two Generates for the decision) and pays a
    // second full shuffle at scale; covered positions aggregate with
    // collect_set (one shuffle), not distinct + collect_list (two)
    val p = plan(graft.queries.Quality.d7DupSpans(spark, d))
    assert(p.contains("Window"), "span decision must be a window over gram")
    assert("\\bGenerate\\b".r.findAllIn(p).size == 2,
      "exactly two Generates: one window-row generation + the covered-span explode")
    assert(p.contains("collect_set"), "covered positions dedup inside the aggregate")
    assert(!p.contains("collect_list"), "no distinct+collect_list two-shuffle form")
  }

  test("pair-stage policy: size-based auto-choice, both branch shapes pinned") {
    // cc1/cc2/e1 call ngramJaccardPairsAuto, which picks the candidate
    // path by corpus size (Dedup.usePrefixFilter): plain inverted index
    // below the 50k-doc threshold (the prefix bound's two extra
    // gram-stream shuffles measured 3-8x slower at sf0.1 for identical
    // output), PPJoin prefix filter above it (where sum df^2 can
    // explode). Pin the policy at its boundary, then both branch
    // shapes built with the compositions' exact arguments.
    assert(!graft.pipeline.Dedup.usePrefixFilter(49999L))
    assert(graft.pipeline.Dedup.usePrefixFilter(50000L))
    val docs = graft.Tables.documents(spark, d)
    val pref = plan(graft.pipeline.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", shingleWords = 3, threshold = 0.5,
      prefixFilter = true))
    assert(pref.contains("row_number"),
      "prefix path must rank shingles per doc (df-ordered window)")
    assert(pref.contains("_df"),
      "prefix path must compute global shingle document frequency")
    assert(!pref.contains("CartesianProduct") &&
      !pref.contains("BroadcastNestedLoopJoin"))
    // the auto path at test scale (< threshold) resolves to the plain
    // inverted index — no df pass in the plan
    val auto = plan(graft.pipeline.Dedup.ngramJaccardPairsAuto(
      docs, "doc_id", "text", shingleWords = 3, threshold = 0.5))
    assert(!auto.contains("_df"),
      "auto path below the threshold must be the plain inverted index")
    // d4 is the documented plain-inverted-index baseline: no df pass
    val plain = plan(graft.queries.Pipeline.d4NgramJaccard(spark, d))
    assert(!plain.contains("_df"),
      "d4 must remain the plain inverted-index exactness baseline")
  }

  test("s4 IVF-PQ probe dynamically prunes the cell-partitioned code scan") {
    // the probe joins cell-partitioned codes against a broadcast probe
    // list; dynamic partition pruning must reach the code scan so a
    // query physically reads only its probed cells' files — the
    // property that makes the index probe-able at 100 TB
    val p = plan(graft.queries.Pipeline.s4AnnIvfPq(spark, d))
    assert(p.contains("dynamicpruning"),
      "code scan must carry a dynamic partition-pruning subquery on _cell")
  }

  test("a22 API path: request-bounded sides broadcast, cuts reach the scans") {
    val p = plan(graft.queries.FastdbOps.a22ManyLtcvs(spark, d))
    // the expanded id set and priority maps broadcast into every
    // corpus-side join (the scans carry the pushed mjd cut), so the
    // ONLY shuffle join is the patch join itself: FULL OUTER cannot
    // broadcast in Spark, and both its inputs are request-bounded
    // post-dedup frames — bounded at any corpus scale
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 6,
      "id/priority joins must broadcast")
    val smj = p.split("\n").filter(_.contains("SortMergeJoin"))
    assert(smj.length == 1 && smj.head.contains("FullOuter"),
      s"only the full-outer patch join may shuffle:\n${smj.mkString("\n")}")
    assert(!p.contains("CartesianProduct"))
  }

  test("sp1 spectrum workflow: request-sized joins broadcast, dedup combines map-side") {
    val p = plan(graft.queries.FastdbOps.sp1WantedSpectra(spark, d))
    // every anti-join against claims/spectra and every semi-join of the
    // surviving cohort builds on the request-sized side; the corpus-
    // sized photometry tables enter only through the map-combined
    // priority dedup (groups shuffle, rows don't)
    val anti = p.split("\n").filter(_.contains("LeftAnti"))
    assert(anti.nonEmpty && anti.forall(_.contains("BroadcastHashJoin")),
      s"claim/spectrum anti-joins must broadcast:\n${anti.mkString("\n")}")
    assert(p.contains("partial_max_by"), "dedup/rollups must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the only tolerated shuffle joins: the src/frced full-outer
    // lim-mag join and the final root-sized outer assembly joins
    val smj = p.split("\n").filter(_.contains("SortMergeJoin"))
    assert(smj.forall(l => l.contains("FullOuter") || l.contains("LeftOuter")),
      s"inner corpus-side joins must broadcast:\n${smj.mkString("\n")}")
  }

  test("a23 object infos: position argmax partial-aggregates, id joins broadcast") {
    val p = plan(graft.queries.FastdbOps.a23ObjectInfos(spark, d))
    assert(p.contains("partial_max_by") && p.contains("partial_min_by"),
      "best-position / first-per-root argmaxes must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "id expansion / priority / semi joins must broadcast")
  }

  test("a19 Lomb-Scargle pass 2: phase trig projected once per row, not per sum") {
    // cos(ph)/sin(ph) feed 3 of the 4 phased sums each; aggregate
    // update expressions do not reliably get codegen subexpression
    // elimination, so the query projects them ONCE before the groupBy
    // (measured ~9% off the solo warm time). Pass 1's single-trig sums
    // (sin/cos of 2ωt, one use each) legitimately stay inside their
    // aggregate — the assertion targets only the multiplied forms.
    val p = plan(graft.queries.FastdbOps.a19LombScargle(spark, d))
    assert("""partial_sum\(\(y#\d+ \* _cph""".r.findFirstIn(p).isDefined,
      "phased sums must read the projected cosine, not recompute it")
    assert(!p.contains(" * COS") && !p.contains(" * SIN"),
      "no trig call may appear as a multiplication operand inside an aggregate")
  }

  test("no battery plan is corpus-quadratic") {
    // A nested-loop join (the physical plan Spark picks when a join
    // has no equi keys) is acceptable only when one side is BOUNDED —
    // the ANN query sets (linear corpus scan x a handful of broadcast
    // query vectors / centroids) or a ONE-ROW scalar-totals frame (the
    // distributed alternative to a driver collect that would re-scan
    // the corpus). Rather than a query-name whitelist (which rounds
    // 7-9 showed re-trips every time a bounded scorer is composed into
    // a new query, e.g. r11 reusing r10's QLM stats), assert the
    // property itself on the optimized logical plan: every join
    // without equi keys must have a side whose static row bound
    // (`LogicalPlan.maxRows` — Some(1) for ungrouped aggregates,
    // Some(k) for limits, Some(n) for local relations, propagated
    // through Project/Filter) is known and small. An unbounded x
    // unbounded non-equi join — the corpus-quadratic shape — has
    // maxRows None on both sides and fails regardless of which query
    // composed it. A CartesianProduct is never acceptable.
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, EqualNullSafe, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def isEquiKey(j: Join, l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet) ||
       l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet)) &&
      l.references.nonEmpty && r.references.nonEmpty
    // only TOP-LEVEL CONJUNCTS count: Spark's ExtractEquiJoinKeys uses
    // conjunctive equalities only, so an EqualTo under an Or/Not does
    // NOT make the join hashable (`a.x = b.y OR a.u > b.v` still plans
    // a nested loop) — Expression.collect over the whole tree would
    // wave such a join through
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def hasEquiKeys(j: Join): Boolean =
      j.condition.toSeq.flatMap(conjuncts).exists {
        case EqualTo(l, r) => isEquiKey(j, l, r)
        case EqualNullSafe(l, r) => isEquiKey(j, l, r)
        case _ => false
      }
    val boundRows = 10000L
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, d)
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      df.queryExecution.optimizedPlan.foreach {
        case j: Join if !hasEquiKeys(j) =>
          assert(j.left.maxRows.exists(_ <= boundRows) ||
                 j.right.maxRows.exists(_ <= boundRows),
            s"$name plans a nested-loop join with NO statically bounded " +
            s"side (left=${j.left.maxRows}, right=${j.right.maxRows}) — " +
            "corpus-quadratic at scale")
        case _ =>
      }
    }
  }
}
