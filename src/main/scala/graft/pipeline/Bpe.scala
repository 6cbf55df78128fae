package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — train + encode (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016; the GPT-2 pipeline applies the same merge loop byte-level).
  * [[TextAnalysis.bpeishTokenCount]] approximates a pre-tokenizer;
  * this is the real thing: learned merges, exact subword tokens.
  *
  * Division of labor at 100 TB:
  *   - the corpus-sized step is ONE distributed word count (groupBy on
  *     words — partial-aggregating, the cheapest scan shape);
  *   - training runs on the collected word-FREQUENCY table, which is
  *     bounded by vocabulary (≤ `maxWords` rows), not corpus size —
  *     the standard trainer shape (HF/SentencePiece do the same);
  *     driver-side here is a bounded collect, not a corpus collect;
  *   - encoding distributes back over the corpus with the merge-rank
  *     table BROADCAST; the per-word merge-rank loop is inherently
  *     imperative (same library-boundary category as the avro/ImageIO
  *     codecs — no Catalyst expression form), so it runs as a typed
  *     map with a per-partition word memo: corpora repeat words
  *     heavily, so amortized cost per token approaches a hash lookup.
  *
  * Ties in the trainer break deterministically (count desc, pair
  * lexicographic asc), so merges — and therefore every token — are
  * reproducible across runs, partitionings, and engines.
  */
object Bpe {

  final case class Merge(left: String, right: String)

  /** Distributed word-frequency table, top `maxWords` by (count desc,
    * word asc) — the trainer's bounded input. */
  def wordFreqs(docs: DataFrame, textCol: String,
      maxWords: Int = 100000): Seq[(String, Long)] =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Classic BPE training loop over the word-frequency table: at each
    * step merge the most frequent adjacent symbol pair. Local and
    * exact — O(numMerges × Σ|word|) over a vocabulary-bounded input. */
  def trainMerges(freqs: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Seq[(Array[String], Long)] =
      freqs.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = Seq.newBuilder[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += Merge(l, r)
        val fused = l + r
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              out += fused; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.toArray, n)
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Train on a corpus: one distributed word count + local merge loop. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): Seq[Merge] =
    trainMerges(wordFreqs(docs, textCol, maxWords), numMerges)

  /** Persist a merge table — rank order IS the file order, exactly the
    * `merges.txt` convention every BPE implementation ships, so the
    * artifact is portable beyond this engine. Train once on the big
    * corpus, [[loadMerges]] everywhere that encodes. */
  def saveMerges(merges: Seq[Merge], path: String): Unit = {
    // tokens come from whitespace-split words, so TAB can never occur
    // inside a symbol — it is a safe separator
    val lines = merges.map(m => s"${m.left}\t${m.right}").mkString("\n")
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, lines.getBytes("UTF-8"))
  }

  def loadMerges(path: String): Seq[Merge] =
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf('\t')
        require(i > 0, s"malformed merge line: '$l'")
        Merge(l.substring(0, i), l.substring(i + 1))
      }

  /** GPT-2-style encode of one word: repeatedly apply the LOWEST-rank
    * applicable merge until none applies. Equivalent to replaying the
    * training merges in order; rank-priority makes it O(|w| log |w|)
    * amortized instead of O(|merges|·|w|). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var go = syms.length > 1
    while (go) {
      var best = Int.MaxValue
      var at = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; at = j }
        j += 1
      }
      if (at < 0) go = false
      else {
        val out = new Array[String](syms.length - 1)
        Array.copy(syms, 0, out, 0, at)
        out(at) = syms(at) + syms(at + 1)
        Array.copy(syms, at + 2, out, at + 1, syms.length - at - 2)
        syms = out
        go = syms.length > 1
      }
    }
    syms
  }

  /** Distributed encode: (id, tokens array) per document. The merge
    * table broadcasts (vocabulary-bounded); a FRESH per-partition word
    * memo collapses repeated words to a hash lookup (fresh, so two
    * encodes with different merge tables can never cross-contaminate). */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (m, i) => ((m.left, m.right), i) }.toMap)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ranks = ranksB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val words = Option(text).getOrElse("")
            .trim.split("\\s+").filter(_.nonEmpty)
          val toks: Seq[String] = words.iterator.flatMap { w =>
            memo.getOrElseUpdate(w, encodeWord(w, ranks))
          }.toSeq
          (id, toks)
        }
      }
      .toDF(idCol, "bpe_tokens")
  }
}
