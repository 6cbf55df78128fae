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
  * fired flag — O(minDets) doubles per live object, evicted by the
  * fired flag as soon as the trigger emits, so state growth is
  * bounded by the active-object count, not by history. */
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
          // within a batch, process in event-time order so the trigger
          // point does not depend on shuffle arrival order
          it.toSeq.sortBy(_.midpointmjdtai).foreach { d =>
            if (!s.fired) {
              val recent =
                (d.midpointmjdtai :: s.recent)
                  .filter(m => d.midpointmjdtai - m <= windowDays)
                  .sorted.takeRight(minDets)
              if (recent.size >= minDets) {
                out += BurstTrigger(id, recent.size, recent.head, d.midpointmjdtai)
                s = BurstState(recent, fired = true)
              } else s = BurstState(recent, fired = false)
            }
          }
          state.update(s)
          out.iterator
        })
  }
}
