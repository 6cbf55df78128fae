package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact dedup AT INGEST: the streaming counterpart of
  * `pipeline.Dedup.exactDedup`, for corpora that arrive as a stream —
  * first occurrence of each distinct text is emitted, every later
  * copy is dropped, across micro-batch boundaries.
  *
  * Shape: `flatMapGroupsWithState` keyed by a 256-bit content digest
  * (SHA-256 — birthday-safe far beyond corpus scale; the batch path's
  * 192-bit xxhash64+md5 rationale applies, see Dedup.exactDedup).
  * State per distinct document is a single boolean — O(distinct docs)
  * total, the minimum any exact streaming dedup can hold. Within one
  * batch the kept row is the minimum-id copy, so output does not
  * depend on shuffle arrival order (same determinism contract as the
  * batch operator).
  *
  * At 100 TB: back the state store with RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`) so state spills
  * off-heap, and if the workload's duplicates cluster in time (crawl
  * re-fetches usually do), swap NoTimeout for a processing-time TTL
  * to bound state by the dedup horizon instead of corpus size.
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String, source: String)

  /** Null-safe (a failed-fetch row must not crash the whole stream):
    * null texts key to a sentinel no hex digest can collide with, so
    * they dedup as mutual duplicates — the batch-side
    * `Dedup.incrementalExact` convention. */
  def contentKey(text: String): String = {
    if (text == null) return "null-text"
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8"))
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xFF}%02x"))
    sb.toString
  }

  /** First-seen-wins exact dedup over a (streaming or batch) Dataset.
    * Streaming: state carries across micro-batches, so a duplicate in
    * batch N of a document kept in batch 1 is dropped. Batch: one-shot
    * fold with identical semantics — the unified-API contract. */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.scalaBoolean
    implicit val outEnc = Encoders.product[Doc]
    docs.groupByKey(d => contentKey(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, it: Iterator[Doc], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            var first: Doc = null
            it.foreach { d =>
              if (first == null || d.doc_id < first.doc_id) first = d
            }
            state.update(true)
            Iterator.single(first)
          }
        })
  }
}
