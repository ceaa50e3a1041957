package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of `events_attribution` (ops/RefOps.scala): each
  * purchase credits the user's most recent PRECEDING non-purchase event
  * type, emitted the moment the decision becomes final.
  *
  * "Most recent preceding" is an event-TIME statement, so, like
  * [[StreamingFunnel]] and [[AsOfJoin]], events buffer in state until
  * the watermark passes them, then apply in (ts, eventId) order — the
  * exact total order of the batch operator's window frame (ROWS
  * UNBOUNDED PRECEDING TO 1 PRECEDING over ORDER BY ts, event_id), so a
  * same-timestamp touch with a smaller event_id still counts and
  * out-of-order arrival cannot flip an attribution. Retained state per
  * user after the buffer drains: ONE string (the running last touch) —
  * bounded forever, the cheapest state any operator here carries.
  */
object StreamingAttribution {

  case class TouchEvent(userId: Long, eventId: Long, eventType: String,
      eventTime: java.sql.Timestamp) {
    def ts: Long = EventTimeOps.tsMicros(eventTime)
  }

  /** A finalized attribution: purchase `eventId` at `ts` (µs) credited
    * to `channel` ("direct" when no touch preceded it). */
  case class Attribution(userId: Long, eventId: Long, ts: Long, channel: String)

  /** lastTouch keeps its (ts, eventId) key, not just the type: a
    * straggler BELOW the watermark (which Spark only "expects", never
    * guarantees, to drop — EventTimeOps) is immediately ripe on
    * arrival, and a bare-string state would let that OLDER touch
    * overwrite a newer one, flipping the credit of every later
    * purchase. The keyed max keeps the running touch monotone in
    * (ts, eventId) no matter what order events apply in. */
  case class AttrState(buffer: List[(Long, Long, String)],
      lastTouch: Option[(Long, Long, String)])

  /** Apply every buffered event the watermark has STRICTLY passed
    * ([[EventTimeOps.ripe]] — the µs tail of wm's millisecond can still
    * arrive) in (ts, eventId) order: non-purchases advance the running
    * touch (monotone max by (ts, eventId)), purchases emit. */
  private def applyReady(userId: Long, st: AttrState, wm: Long):
      (List[Attribution], AttrState) = {
    val (ready, pending) = st.buffer.partition(e => EventTimeOps.ripe(e._1, wm))
    var lt = st.lastTouch
    val out = List.newBuilder[Attribution]
    ready.sortBy(e => (e._1, e._2)).foreach { case (ts, id, tpe) =>
      if (tpe == "purchase")
        out += Attribution(userId, id, ts, lt.map(_._3).getOrElse("direct"))
      else if (lt.forall(p => ts > p._1 || (ts == p._1 && id > p._2)))
        lt = Some((ts, id, tpe))
    }
    (out.result(), AttrState(pending, lt))
  }

  private def updateFn(streaming: Boolean)(userId: Long,
      rows: Iterator[TouchEvent], state: GroupState[AttrState]):
      Iterator[Attribution] = {
    val (wm, wmMs) = EventTimeOps.watermarkMicros(streaming, state)
    val prev = state.getOption.getOrElse(AttrState(Nil, None))
    val incoming = rows.map(e => (e.ts, e.eventId, e.eventType)).toList
    val (out, next) = applyReady(userId,
      prev.copy(buffer = prev.buffer ++ incoming), wm)
    state.update(next)
    if (wm != Long.MaxValue && next.buffer.nonEmpty)
      // wake when the watermark passes the earliest buffered event so a
      // quiet user's pending purchases still attribute
      EventTimeOps.armWake(state, next.buffer.map(_._1).min, wmMs)
    out.iterator
  }

  /** Run attribution over an event stream (watermark must already be
    * applied to `eventTime` for streaming input). Batch mode
    * (isStreaming = false) = complete input: flush everything. */
  def attribute(events: Dataset[TouchEvent]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    val timeout =
      if (events.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(updateFn(events.isStreaming))
  }
}
