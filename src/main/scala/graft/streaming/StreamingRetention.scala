package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of `events_retention` (ops/RefOps.scala): each user's
  * cohort day is their FIRST activity day, and every later active day
  * emits one (cohort_day, day_offset) return record — the incremental
  * feed a growth dashboard aggregates into the cohort table.
  *
  * "First activity day" is an event-time minimum, so, like the other
  * buffer-until-watermark operators, events buffer in state until the
  * watermark strictly passes them ([[EventTimeOps]]) and apply in ts
  * order — an out-of-order pre-cohort event arriving within the
  * watermark horizon still becomes the cohort day instead of corrupting
  * it. Retained state per user after the buffer drains: the cohort day
  * and the set of already-emitted day OFFSETS (bounded by active days,
  * not events — each (user, day) emits exactly once, mirroring the
  * batch operator's distinct (user, day) collapse). */
object StreamingRetention {

  private val DayUs = 86_400_000_000L

  case class ActivityEvent(userId: Long, eventTime: java.sql.Timestamp) {
    def ts: Long = EventTimeOps.tsMicros(eventTime)
  }

  /** One first-activity-of-the-day record: the user's cohort day (µs at
    * midnight UTC) and the whole-day offset of the active day. */
  case class Return(userId: Long, cohortDayUs: Long, dayOffset: Int)

  case class RetState(buffer: List[Long], cohortDay: Option[Long],
      emitted: Set[Int])

  private def applyReady(userId: Long, st: RetState, wm: Long):
      (List[Return], RetState) = {
    val (ready, pending) = st.buffer.partition(ts => EventTimeOps.ripe(ts, wm))
    var cohort = st.cohortDay
    var emitted = st.emitted
    val out = List.newBuilder[Return]
    ready.sorted.foreach { ts =>
      val day = Math.floorDiv(ts, DayUs)
      if (cohort.isEmpty) cohort = Some(day)
      val off = (day - cohort.get).toInt
      // off < 0 only for a sub-watermark straggler older than the
      // finalized cohort day (Spark "expects", never guarantees, to
      // drop those — EventTimeOps). The cohort cannot be re-minned
      // retroactively, and the batch twin can never produce a negative
      // offset — so the straggler is dropped, not emitted as a corrupt
      // (cohort, -n) cell.
      if (off >= 0 && !emitted.contains(off)) {
        emitted += off
        out += Return(userId, cohort.get * DayUs, off)
      }
    }
    (out.result(), RetState(pending, cohort, emitted))
  }

  private def updateFn(streaming: Boolean)(userId: Long,
      rows: Iterator[ActivityEvent], state: GroupState[RetState]):
      Iterator[Return] = {
    val (wm, wmMs) = EventTimeOps.watermarkMicros(streaming, state)
    val prev = state.getOption.getOrElse(RetState(Nil, None, Set.empty))
    val (out, next) = applyReady(userId,
      prev.copy(buffer = prev.buffer ++ rows.map(_.ts)), wm)
    state.update(next)
    if (wm != Long.MaxValue && next.buffer.nonEmpty)
      EventTimeOps.armWake(state, next.buffer.min, wmMs)
    out.iterator
  }

  /** Run retention over an activity stream (watermark must already be
    * applied to `eventTime` for streaming input). Batch mode
    * (isStreaming = false) = complete input: flush everything. */
  def returns(events: Dataset[ActivityEvent]): Dataset[Return] = {
    import events.sparkSession.implicits._
    val timeout =
      if (events.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(updateFn(events.isStreaming))
  }
}
