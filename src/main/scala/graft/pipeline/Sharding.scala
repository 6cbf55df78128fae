package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard packing + split assignment for training-data export — the
  * step between "filtered corpus" and "bytes on disk for the trainer".
  *
  * A trainer wants shards of ~equal token mass in a stable document
  * order; a pipeline wants train/val/test membership that does not
  * move when the corpus is re-run or re-sharded. Both are layout
  * decisions, so both are computed WITHOUT a global sort bottleneck:
  * [[packByTokenBudget]] is the classic two-phase distributed prefix
  * sum (per-partition running sums + a tiny partition-offset table)
  * and [[hashSplit]] is a pure per-row hash — no shuffle at all.
  */
object Sharding {

  /** Assign each doc (ordered by `idCol`) to the shard holding its
    * first token: shard = floor(tokens_before_doc / budget). Shards
    * are contiguous in id order and reach at least `budget` tokens
    * before the next one starts (a doc straddling a boundary belongs
    * to the shard where it starts, like a record straddling a block).
    *
    * Scale shape: the naive `SUM(tok) OVER (ORDER BY id)` window is a
    * SINGLE TASK holding the whole corpus — the classic accidental
    * serialization. This is the two-phase prefix sum instead:
    * range-repartition by id (partitions become id-contiguous), run
    * per-partition prefix sums in parallel, and pass only the
    * per-partition TOTALS — one row per partition — through the serial
    * window to become start offsets, broadcast back. At 100 TB the
    * serial step sees a few thousand rows, never the corpus.
    *
    * The partitioned frame feeds two subtrees (rows and totals), so it
    * is MATERIALIZED (eager localCheckpoint) before fanning out:
    * `spark_partition_id` must mean the same id-range in both
    * subtrees, and without materialization that only holds if
    * exchange reuse fires — RangePartitioner seeds its boundary
    * sampling from rdd.id, so two independent instantiations of the
    * exchange can draw DIFFERENT boundaries and silently corrupt the
    * offsets. Materializing pins the boundaries unconditionally (and
    * the narrow (strata, id, n_tokens) projection is the cheapest
    * frame in the plan to hold; on a cluster where executor loss
    * matters, swap for storage-backed checkpoint).
    */
  def packByTokenBudget(docs: DataFrame, idCol: String, tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    // integral `div`, not a double quotient: a double can land a
    // half-ulp under an exact multiple and floor off by one once
    // cum_tokens outgrows the 2^53 mantissa
    prefixSum(docs, idCol, tokens, Nil)
      .withColumn("shard", expr(s"(cum_tokens - n_tokens) div ${budget}L"))
      .select(col(idCol), col("n_tokens"), col("cum_tokens"), col("shard"))
  }

  /** Stratified packing in ONE corpus pass: independent shard
    * numbering per stratum (e.g. per train/val/test split), same
    * two-phase prefix sum. Calling [[packByTokenBudget]] once per
    * stratum would scan the corpus once per stratum — 3 splits = 3
    * full passes at 100 TB; here the range exchange sorts on
    * (strata…, id), so each stratum occupies a contiguous run of
    * partitions and its offsets accumulate per-stratum along the same
    * partition-id order, still one row per (stratum, partition) in the
    * serial window. */
  def packByTokenBudgetStratified(docs: DataFrame, idCol: String,
      tokens: Column, budget: Long, strata: Seq[String]): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    prefixSum(docs, idCol, tokens, strata)
      .withColumn("shard", expr(s"(cum_tokens - n_tokens) div ${budget}L"))
      .select((strata.map(col) ++ Seq(col(idCol), col("n_tokens"),
        col("cum_tokens"), col("shard"))): _*)
  }

  /** The shared two-phase distributed prefix sum: each doc's running
    * token total in `idCol` order (within its stratum when `strata`
    * is nonempty), as (strata…, idCol, n_tokens, cum_tokens). */
  /** Two-phase distributed prefix sum over `idCol` order (optionally
    * per stratum): partition-local running sums + a one-row-per-
    * partition offset window — the serial step sees partition COUNT
    * rows, never the data. The reusable primitive behind
    * [[packByTokenBudget]], [[packSequences]],
    * [[deterministicShuffle]], and cumulative-curve reports
    * (vocabulary growth). Output: (strata…, idCol, n_tokens,
    * cum_tokens ending AT this row). */
  def prefixSum(docs: DataFrame, idCol: String,
      tokens: Column, strata: Seq[String]): DataFrame = {
    val sc = strata.map(col)
    val t = docs.select((sc :+ col(idCol) :+ tokens.cast("long").as("n_tokens")): _*)
      .repartitionByRange((sc :+ col(idCol)): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy((strata :+ "_pid").map(col): _*).orderBy(idCol)
    val withLocal = t.withColumn("_cum_local", sum("n_tokens").over(wLocal))
    // one row per (stratum, partition): the only serial window in the
    // plan — per-stratum because range partitions are contiguous runs
    // of the (strata…, id) sort order, so _pid order IS id order
    // within a stratum
    val wOff = Window.partitionBy(sc: _*).orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy((strata :+ "_pid").map(col): _*)
      .agg(sum("n_tokens").as("_ptot"))
      .withColumn("_off", coalesce(sum("_ptot").over(wOff), lit(0L)))
      .select((strata :+ "_pid" :+ "_off").map(col): _*)
    withLocal.join(broadcast(offsets), strata :+ "_pid")
      .withColumn("cum_tokens", col("_off") + col("_cum_local"))
      .select((sc ++ Seq(col(idCol), col("n_tokens"), col("cum_tokens"))): _*)
  }

  /** Seeded deterministic GLOBAL shuffle — the order-randomization a
    * training export needs (corpora arrive source- and time-clustered;
    * a trainer reading them in storage order sees non-i.i.d. batches):
    * every row gets `shuffle_pos`, its 0-based rank under the
    * engine-portable key md5("seed:id"). Seedless determinism rules:
    * the SAME permutation on any engine at any parallelism, a new seed
    * is a fresh independent permutation, and re-exports are
    * reproducible byte-for-byte.
    *
    * Scale shape: the sort key is uniform by construction, so the
    * range exchange is perfectly balanced — the best case for a global
    * sort — and positions come from the [[packByTokenBudget]]
    * two-phase scheme (partition-local row_number + a
    * one-row-per-partition offset window), never a single-task global
    * window. Same materialization rationale as [[prefixSum]]: the
    * range boundaries are pinned once. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val t = df.withColumn("_shufkey", key)
      .repartitionByRange(col("_shufkey"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy("_pid").orderBy("_shufkey", idCol)
    val withLocal = t.withColumn("_rl", row_number().over(wLocal).cast("long"))
    val wOff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy("_pid").agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum("_pn").over(wOff), lit(0L)))
      .select("_pid", "_off")
    withLocal.join(broadcast(offsets), Seq("_pid"))
      .withColumn("shuffle_pos", col("_off") + col("_rl") - 1)
      .drop("_pid", "_rl", "_off", "_shufkey")
  }

  /** Distributed global row_number over an arbitrary sort order,
    * without the single-task `Window.orderBy(...)` pitfall: a range
    * exchange on the sort key, partition-local row_number, and a
    * one-row-per-partition offset window ([[deterministicShuffle]]'s
    * two-phase scheme generalized to caller-supplied keys). The order
    * MUST be total (append a unique id as the last key) or ranks of
    * tied rows are partition-placement-dependent.
    *
    * Returns the input plus `rankName` (1-based long). The range
    * exchange inspects the key distribution by sampling, so skewed
    * metrics still split evenly; the offset frame is one row per
    * partition — driver-bounded by definition. */
  def globalRank(df: DataFrame, order: Seq[Column], rankName: String): DataFrame = {
    val t = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()  // pin _pid before the two dependent reads
    val wLocal = Window.partitionBy("_pid").orderBy(order: _*)
    val wOff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy("_pid").agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum("_pn").over(wOff), lit(0L)))
      .select("_pid", "_off")
    t.withColumn("_rl", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(rankName, col("_off") + col("_rl"))
      .drop("_pid", "_rl", "_off")
  }

  /** Fixed-context-length sequence packing — the layout a trainer
    * actually consumes: tokens laid end-to-end in `idCol` order and
    * cut every `seqLen`, documents SPLITTING across cuts (no padding,
    * no discarded remainders). One output row per (document, sequence)
    * span: `tok_start`/`tok_len` locate the span inside the document,
    * `seq_off` locates it inside the sequence, so every sequence is
    * tiled edge-to-edge and every document is reconstructable.
    *
    * Same two-phase prefix sum as [[packByTokenBudget]]; the explode
    * emits one row per spanned sequence (⌈n/seqLen⌉+1 worst case per
    * doc), all arithmetic integral. Zero-token docs occupy no span and
    * are dropped, like empty records in a packed block. */
  def packSequences(docs: DataFrame, idCol: String, tokens: Column,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive, got $seqLen")
    prefixSum(docs, idCol, tokens, Nil)
      .filter(col("n_tokens") > 0)
      .withColumn("_start", col("cum_tokens") - col("n_tokens"))
      .withColumn("seq_id", explode(expr(
        s"sequence(_start div ${seqLen}L, (cum_tokens - 1) div ${seqLen}L)")))
      .withColumn("_span_start", greatest(col("_start"), col("seq_id") * seqLen))
      .withColumn("_span_end",
        least(col("cum_tokens"), (col("seq_id") + 1) * seqLen))
      .select(col("seq_id"), col(idCol),
        (col("_span_start") - col("_start")).as("tok_start"),
        (col("_span_end") - col("_span_start")).as("tok_len"),
        (col("_span_start") - col("seq_id") * seqLen).as("seq_off"))
  }

  /** Materialize the fixed-length sequences [[packSequences]] lays
    * out: one row per `seq_id` with the actual tokens, spliced across
    * document boundaries in order — the artifact a trainer's data
    * loader reads. `tokensCol` is the per-document token ARRAY (e.g.
    * `Bpe.encodeCorpus` output); every sequence except the final one
    * has exactly `seqLen` tokens.
    *
    * Scale shape: spans join their documents on the id (plain equi
    * join), each span SLICES its piece out of the document array, and
    * pieces reassemble with `array_sort(collect_list(struct(seq_off,
    * piece)))` + `getField` + `flatten` — all codegen'd collection
    * expressions, no interpreted lambda and no per-token row explosion;
    * the shuffle moves each token once, inside its span's array. A
    * sequence holds ≤ seqLen tokens by construction, so per-group state
    * is bounded regardless of corpus size. */
  def assembleSequences(docs: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long): DataFrame = {
    val spans = packSequences(docs, idCol, size(col(tokensCol)).cast("long"), seqLen)
    spans.join(docs.select(col(idCol), col(tokensCol)), Seq(idCol))
      .select(col("seq_id"),
        slice(col(tokensCol), (col("tok_start") + 1).cast("int"),
          col("tok_len").cast("int")).as("_piece"),
        col("seq_off"))
      .groupBy("seq_id")
      .agg(
        flatten(array_sort(collect_list(struct(col("seq_off"), col("_piece"))))
          .getField("_piece")).as("tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Temperature-based source mixing (α = 0.5): draw `targetN` docs
    * with per-stratum quotas k_s ∝ ⌊√n_s⌋ — the standard flattening of
    * a skewed language/source mix for training. Membership is exact
    * and engine-portable: within a stratum the k_s KEPT docs are those
    * with the smallest md5(id) (a deterministic uniform order), so
    * re-runs and engine swaps never move a document in or out.
    *
    * Every arithmetic step is integer-exact across engines: IEEE-754
    * `sqrt` is correctly rounded (unlike `pow`), `floor` and the
    * integral `div` do the rest — no float boundary for a doc to sit
    * on. Scale shape: only (stratum, id, hash) rows shuffle, and a
    * per-shuffle-partition top-k prune runs ahead of the per-stratum
    * rank window, so the serial-per-stratum step sees at most
    * partitions × k_s rows — a hot stratum never lands one task. */
  def temperatureMix(docs: DataFrame, idCol: String, stratumCol: String,
      targetN: Long): DataFrame = {
    require(targetN > 0, s"target sample size must be positive, got $targetN")
    val strata = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("_w", floor(sqrt(col("n_docs"))).cast("long"))
    val tot = strata.agg(sum("_w").as("_tot"))
    val quotas = strata.crossJoin(broadcast(tot))
      .withColumn("k", least(col("n_docs"), expr(s"(${targetN}L * _w) div _tot")))
      .select(col(stratumCol), col("k"))
    val slim = docs
      .select(col(stratumCol), col(idCol),
        md5(col(idCol).cast("string")).as("_h"))
      .withColumn("_pid", spark_partition_id())
    // exact pre-prune: a stratum's global top-k rows are each top-k of
    // their own shuffle partition, so rows past k never reach the
    // per-stratum window
    val wLoc = Window.partitionBy(stratumCol, "_pid").orderBy("_h")
    val wGlob = Window.partitionBy(stratumCol).orderBy("_h")
    slim.withColumn("_lrk", row_number().over(wLoc))
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("_lrk") <= col("k"))
      .withColumn("rank", row_number().over(wGlob).cast("long"))
      .filter(col("rank") <= col("k"))
      .select(col(stratumCol), col(idCol), col("rank"))
  }

  /** Deterministic, engine-portable train/val/test assignment from the
    * first hex nibble of md5(id): 0–b → train (12/16), c–d → val
    * (2/16), e–f → test (2/16). A pure per-row expression: re-running
    * the pipeline — on any engine with a standard md5 — never moves a
    * document between splits, the property seeded `rand()` sampling
    * lacks (Spark's sample() changes membership with partitioning). */
  def hashSplit(id: Column): Column = {
    val nib = substring(md5(id.cast("string")), 1, 1)
    when(nib.isin("c", "d"), lit("val"))
      .when(nib.isin("e", "f"), lit("test"))
      .otherwise(lit("train"))
  }

  /** Hex threshold for [[stratifiedSample]]: a 12-nibble lowercase
    * string such that `md5prefix < threshold` keeps ~`rate` of uniform
    * hashes. Lexicographic comparison of equal-length lowercase hex is
    * order-isomorphic to the numeric value, so both Spark and DuckDB
    * evaluate the SAME predicate on plain strings — no numeric
    * conversion to disagree on. rate >= 1 returns "g" (sorts above
    * every hex digit → keep all); rate <= 0 returns twelve zeros
    * (nothing sorts strictly below → keep none). */
  def sampleThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) "000000000000"
    // rate * 2^48, capped below 2^48 so the string stays 12 nibbles
    // (a 13-digit "1000000000000" would sort BELOW "f..." and break
    // the ordering isomorphism for rates within 2^-49 of 1)
    else f"${math.min(math.round(rate * 281474976710656.0), 281474976710655L)}%012x"

  /** Deterministic per-stratum downsampling — the quality/language
    * rebalancing step of a corpus pipeline: keep a row iff the first
    * 12 md5 nibbles of its id fall under its stratum's
    * [[sampleThreshold]]. Seedless and partition-invariant: the SAME
    * ids survive on every engine, every run, every cluster size —
    * reproducible curation, unlike `df.sample` whose output depends on
    * seed and partitioning. Strata absent from `rates` drop entirely.
    * A pure scan-stage filter: no shuffle, pushes down to the scan
    * right after the md5 projection. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit("000000000000")) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(sampleThreshold(v))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 12) < threshold)
  }

  /** EXACT-k per-stratum sampling — "give me exactly min(k, n) docs
    * per language/source, the same ones every run": keeps each
    * stratum's k smallest rows under the engine-portable rank key
    * md5("seed:id") (id tiebreak), adding `sample_rank` (1-based).
    * Deterministic, partition-invariant, and a different seed is an
    * independent draw — [[stratifiedSample]]'s guarantees, but with an
    * exact count instead of an expected rate. Null strata are
    * excluded (a sample quota for "unknown stratum" is a caller
    * decision, not a default).
    *
    * Scale shape: the naive plan — `row_number() OVER (PARTITION BY
    * stratum ...)` on the full corpus — sends EVERY row of a stratum
    * to one task; a billion-row language kills it. Instead: (1) one
    * count pass sizes each stratum (collect bounded by the stratum
    * count, like the procver dims); (2) a scan-stage hex-threshold
    * pre-cut at rate (margin·k+24)/n keeps each stratum's smallest
    * keys — strictly: every kept key sorts below every dropped key's
    * prefix — so the window runs over ~margin·k rows per stratum, not
    * n; (3) the result is checked against min(k, n) per stratum and
    * any short stratum (Chernoff-bound ~e^{-(margin−1)²k/…}: never at
    * sane margins, but "never" is not "exact") reruns unfiltered, so
    * the output is EXACT regardless. Costs two corpus scans (count +
    * cut) — the price of an exact quota without a single-task window. */
  def stratifiedExactK(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, seed: Long, margin: Double = 3.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = df.filter(col(stratumCol).isNotNull).withColumn("_xkey",
      md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))))
    // one row per stratum — the same bounded-collect contract as the
    // procver dims; strata are languages/sources, not documents
    val counts = keyed.groupBy(stratumCol).agg(count(lit(1)).as("_xn"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0, (margin * k + 24.0) / n) }
    val thr = rates.foldLeft(lit("000000000000")) { case (acc, (s, v)) =>
      when(col(stratumCol).cast("string") === s,
        lit(sampleThreshold(v))).otherwise(acc)
    }
    val w = Window.partitionBy(stratumCol).orderBy(col("_xkey"), col(idCol))
    def rank(in: DataFrame): DataFrame =
      in.withColumn("sample_rank", row_number().over(w))
        .filter(col("sample_rank") <= k)
    // localCheckpoint: the exactness audit below is an extra action on
    // this (≤ k-per-stratum) frame — materialize once so it does not
    // rescan the corpus, and cut lineage so the scan frees with it
    val ranked = rank(keyed.filter(substring(col("_xkey"), 1, 12) < thr))
      .localCheckpoint(true)
    val got = ranked.groupBy(stratumCol).agg(count(lit(1)).as("_xg"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val short = counts.collect {
      case (s, n) if got.getOrElse(s, 0L) < math.min(k.toLong, n) => s
    }.toSeq
    val all =
      if (short.isEmpty) ranked
      else ranked.filter(!col(stratumCol).cast("string").isin(short: _*))
        .unionByName(rank(
          keyed.filter(col(stratumCol).cast("string").isin(short: _*))))
    all.drop("_xkey")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * IPL 2006): draw `k` rows with inclusion probability proportional
    * to `weight` by keeping the k smallest exponential keys
    * −ln(u)/w, u uniform per row. Weighting by token count makes the
    * draw uniform over TOKENS — the sample a corpus-level audit or
    * mixture builder actually wants; weighting by a quality score
    * tilts an export toward its best documents.
    *
    * Determinism/portability: u is derived from the first 12 md5
    * nibbles of "seed:id" — (v + 0.5) / 2^48 is EXACT in binary64
    * (power-of-two divisor), so the only engine-sensitive step is
    * ln(), correct to 1 ulp everywhere; the key rounds to 6 dp with id
    * tiebreak (the s1/r1 idiom), putting ~10 orders of magnitude
    * between the rounding boundary and a 1-ulp ln() disagreement.
    * Same guarantees as [[stratifiedExactK]]: partition-invariant,
    * engine-portable, a new seed is an independent draw.
    *
    * Scale shape: keys are a scan-stage projection; a partition-local
    * rank prunes to ≤ k rows per shuffle partition before the global
    * rank window (a global top-k row is a top-k row of its partition),
    * so the serial step sees partitions × k rows, never the corpus.
    * Rows with weight <= 0 or null cannot be drawn (A-ES is undefined
    * there) and are filtered out. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = conv(substring(md5(concat_ws(":", lit(seed.toString),
      col(idCol).cast("string"))), 1, 12), 16, 10).cast("long")
    val u = (v.cast("double") + 0.5) / 281474976710656.0 // exact: v < 2^48
    val keyed = df.filter(weight.isNotNull && weight > 0)
      .withColumn("draw_key", round(-log(u) / weight.cast("double"), 6))
      .withColumn("_pid", spark_partition_id())
    val wLoc = Window.partitionBy("_pid").orderBy(col("draw_key"), col(idCol))
    val wGlob = Window.orderBy(col("draw_key"), col(idCol))
    keyed.withColumn("_lrk", row_number().over(wLoc))
      .filter(col("_lrk") <= k)
      .withColumn("sample_rank", row_number().over(wGlob).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("_pid", "_lrk")
  }

  /** UniMax language/stratum budget allocation + deterministic sample
    * (Chung et al., "UniMax: Fairer and More Effective Language
    * Sampling for Large-Scale Multilingual Pretraining", ICLR 2023):
    * spread `budget` docs UNIFORMLY across strata, capping each
    * stratum at `maxEpochs` passes over its corpus and re-distributing
    * the unused share to the remaining (larger) strata — the
    * water-filling that fixes temperature sampling's twin failure
    * modes (head languages starved, tail languages over-epoched).
    * Visit strata smallest-first; at each step
    * quota = min(n·maxEpochs, remaining div strataLeft), all integer
    * arithmetic, so every engine allocates identically.
    *
    * The per-stratum quota of docs is then the quota smallest-md5(id)
    * members ([[temperatureMix]]'s engine-portable membership rule,
    * with the same partition-local top-k prune ahead of the
    * per-stratum rank window). Output: (stratumCol, idCol, rank).
    *
    * With maxEpochs > 1 a stratum's quota is a doc-PASS budget that
    * may exceed its corpus size; the emitted sample naturally caps at
    * one pass (there are only n rows to rank) and the trainer repeats
    * the stratum quota/n times. The stratum-count collect is bounded
    * by the number of LANGUAGES — a dimension, never corpus-sized. */
  def unimaxSample(docs: DataFrame, idCol: String, stratumCol: String,
      budget: Long, maxEpochs: Long = 1L): DataFrame = {
    require(budget > 0 && maxEpochs > 0,
      s"budget and maxEpochs must be positive (got $budget, $maxEpochs)")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (st, n) => (n, st) }
    var remaining = budget
    val quotas = counts.zipWithIndex.map { case ((st, n), i) =>
      val q = math.min(n * maxEpochs, remaining / (counts.length - i))
      remaining -= q
      (st, q)
    }.toSeq.toDF(stratumCol, "_k")
    val slim = docs.select(col(stratumCol), col(idCol),
        md5(col(idCol).cast("string")).as("_h"))
      .withColumn("_pid", spark_partition_id())
    val wLoc = Window.partitionBy(stratumCol, "_pid").orderBy("_h")
    val wGlob = Window.partitionBy(stratumCol).orderBy("_h")
    slim.withColumn("_lrk", row_number().over(wLoc))
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("_lrk") <= col("_k"))
      .withColumn("rank", row_number().over(wGlob).cast("long"))
      .filter(col("rank") <= col("_k"))
      .select(col(stratumCol), col(idCol), col("rank"))
  }
}
