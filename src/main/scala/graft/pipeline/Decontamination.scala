package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark/test-set decontamination — the standard training-data
  * hygiene pass: flag every corpus document that shares at least one
  * word n-gram (n = 8 by convention) with an evaluation set, so eval
  * leakage can be dropped before training.
  *
  * Shape at 100 TB: the eval side (benchmark suites — thousands of
  * documents, megabytes of distinct grams) is tiny next to the corpus,
  * so its distinct gram set is BROADCAST and the corpus gram stream
  * filter-joins against it map-side — the corpus is never shuffled to
  * find matches; only the (rare) hits reach the per-doc aggregation.
  * For eval sets too big to broadcast, pass `broadcastEval = false`
  * for a plain shuffle equi-join on the gram key (or pre-filter with
  * a Bloom filter of eval grams — same join afterwards).
  */
object Decontamination {

  /** Per (corpus doc, eval doc) contamination detail: the number of
    * distinct n-grams of `idCol`-document shared with each eval
    * document it overlaps. Corpus rows that are themselves in
    * `evalSet` (same id) are NOT excluded here — callers decide what
    * "in the eval set" means; the battery query filters by id space. */
  def contaminationPairs(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    // corpus grams keep duplicates: the broadcast join filters first,
    // so only matching occurrences pay the dedup/aggregation cost
    val cg = Dedup.gramRows(corpus, idCol, textCol, n)
    val eg0 = Dedup.gramRows(evalSet, idCol, textCol, n)
      .select(col("_sh_id").as("eval_doc_id"), col("_sh_g"))
      .distinct()
    val eg = if (broadcastEval) broadcast(eg0) else eg0
    cg.join(eg, Seq("_sh_g"))
      .groupBy(col("_sh_id").as(idCol), col("eval_doc_id"))
      .agg(countDistinct(col("_sh_g")).as("n_shared_grams"))
  }

  /** Per corpus-document rollup: how many eval documents it overlaps
    * and how many distinct grams are contaminated in total. */
  def contaminationReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    val cg = Dedup.gramRows(corpus, idCol, textCol, n)
    val eg0 = Dedup.gramRows(evalSet, idCol, textCol, n)
      .select(col("_sh_id").as("eval_doc_id"), col("_sh_g"))
      .distinct()
    val eg = if (broadcastEval) broadcast(eg0) else eg0
    cg.join(eg, Seq("_sh_g"))
      .groupBy(col("_sh_id").as(idCol))
      .agg(countDistinct(col("_sh_g")).as("n_shared_grams"),
        countDistinct(col("eval_doc_id")).as("n_eval_docs"))
  }

  /** NEAR-dup decontamination — the exact-gram pass above misses
    * paraphrased leakage (reworded eval questions, reformatted
    * answers); this flags corpus docs whose shingle set near-matches
    * an eval doc at `threshold` Jaccard. It is the incremental
    * near-dup probe with the EVAL SET as the batch: the corpus's
    * persisted band postings (the same index d9-style ingest probes —
    * built once, never rescanned) are probed by the tiny eval side,
    * and only corpus-origin pairs survive (eval-internal near-dups
    * are not contamination). Returns (idCol, eval_doc_id, jaccard).
    * Ids must be disjoint across corpus and eval (same contract as
    * [[Dedup.incrementalMinhash]]); exact-Jaccard verification means
    * precision 1 against the shingle-set definition, recall is the
    * banding's, bounded in spec. */
  def fuzzyContamination(index: Dedup.NearDupIndex, evalSet: DataFrame,
      idCol: String, textCol: String, shingleWords: Int = 3,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame =
    Dedup.incrementalMinhash(evalSet, idCol, textCol, index,
        shingleWords, numHashes, bands, threshold)
      .filter(col("origin") === "corpus")
      .select(col("id_a").as(idCol), col("id_b").as("eval_doc_id"),
        col("jaccard"))
}
