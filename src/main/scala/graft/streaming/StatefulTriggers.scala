package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-object stream processing via
  * `flatMapGroupsWithState` — the Structured-Streaming shape for
  * logic that needs custom state beyond windowed aggregates.
  *
  * Use case from the reference's workflow: the spectrum cycle wants
  * *new, active* transients (wantedspectra feed; the hot-transient
  * recency query T6 approximates this in batch). Streaming-native,
  * "object just became interesting" is a burst trigger: emit once per
  * object when `minDets` detections land within `windowDays`. State
  * per object is the bounded list of recent detection times plus the
  * fired flag — a fired object sheds its list immediately (one boolean
  * from then on), so state growth is bounded by the not-yet-fired
  * object count, not by history. Late detections are handled with
  * watermark-like semantics: a detection arriving more than
  * `windowDays` behind the newest time already seen for its object is
  * expired (it can no longer complete a window that would fire). */
object StatefulTriggers {

  final case class Det(diaobjectid: Long, midpointmjdtai: Double)
  final case class BurstState(recent: List[Double], fired: Boolean)
  final case class BurstTrigger(diaobjectid: Long, ndets: Int,
      windowStart: Double, triggerMjd: Double)

  /** At most one trigger per object: the first time its detection
    * count within a sliding `windowDays` reaches `minDets`. Works on
    * a streaming Dataset (state carries across micro-batches) and on
    * a batch Dataset (single-shot fold) — the same code, which is the
    * point of the unified API. */
  def burstTriggers(dets: Dataset[Det], minDets: Int,
      windowDays: Double): Dataset[BurstTrigger] = {
    implicit val stateEnc = Encoders.product[BurstState]
    implicit val outEnc = Encoders.product[BurstTrigger]
    implicit val keyEnc = Encoders.scalaLong
    dets.groupByKey(_.diaobjectid)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (id: Long, it: Iterator[Det], state: GroupState[BurstState]) => {
          var s = state.getOption.getOrElse(BurstState(Nil, fired = false))
          val out = scala.collection.mutable.ListBuffer[BurstTrigger]()
          // cap on retained times: enough to find any qualifying run,
          // bounded even under pathological cadence
          val maxKeep = math.max(minDets * 4, 32)
          // within a batch, process in event-time order so the trigger
          // point does not depend on shuffle arrival order
          it.toSeq.sortBy(_.midpointmjdtai).foreach { d =>
            if (!s.fired) {
              // prune against the NEWEST time seen, not the incoming
              // one: a late detection must expire itself, never
              // resurrect a window wider than windowDays (subtracting
              // from the incoming time kept future times at negative
              // offsets, so three detections spanning 99 days could
              // fire a 10-day trigger)
              val merged = d.midpointmjdtai :: s.recent
              val maxT = merged.max
              val recent = merged.filter(m => maxT - m <= windowDays)
                .sorted.takeRight(maxKeep)
              // fire iff some run of minDets consecutive retained
              // times spans <= windowDays
              val run = recent.sliding(minDets)
                .find(w => w.size == minDets && w.last - w.head <= windowDays)
              run match {
                case Some(w) =>
                  out += BurstTrigger(id, minDets, w.head, w.last)
                  // fired: shed the list — one boolean per object from
                  // here on, the doc's eviction promise
                  s = BurstState(Nil, fired = true)
                case None =>
                  s = BurstState(recent, fired = false)
              }
            }
          }
          state.update(s)
          out.iterator
        })
  }
}
