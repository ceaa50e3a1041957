package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of `events_funnel` (ops/RefOps.scala): per-user ordered
  * view → click → purchase progression, emitted as stage-reached records
  * the moment each transition becomes DECIDABLE.
  *
  * Ordered-funnel semantics need event-TIME order, and a stream delivers
  * processing-time order — so, like [[AsOfJoin]], events buffer in state
  * until the watermark passes them, then apply to the per-user stage
  * machine in (ts, stage-rank) order. A click that arrives before its
  * preceding view (but with a later event time) therefore still counts,
  * and a click whose event time precedes the first view correctly does
  * not. State per user: the monotone stage timestamps (3 longs, bounded
  * forever) + only the not-yet-decidable event buffer (bounded by the
  * ingest rate × watermark horizon — same bound every stateful op here
  * carries). Events that can no longer advance the machine are dropped
  * at buffer-apply time, and a completed funnel clears its buffer
  * entirely, keeping only the three stage timestamps as a tombstone so
  * later events cannot restart a second funnel (the batch operator
  * computes ONE funnel per user over all history — TwinReplaySpec pins
  * the equality). Batch mode (isStreaming = false) = complete input:
  * flush everything, matching the batch operator's semantics.
  */
object StreamingFunnel {

  /** Funnel stage order; rank doubles as the emitted stage number. */
  private val StageRank = Map("view" -> 1, "click" -> 2, "purchase" -> 3)

  case class FunnelEvent(userId: Long, eventType: String,
      eventTime: java.sql.Timestamp) {
    def ts: Long = EventTimeOps.tsMicros(eventTime)
  }

  /** A user reaching funnel stage 1/2/3 at event time `ts` (µs). */
  case class StageReached(userId: Long, stage: Int, ts: Long)

  case class FunnelState(buffer: List[(Long, Int)],
      vTs: Option[Long], cTs: Option[Long], pTs: Option[Long])

  /** Apply every buffered event the watermark has STRICTLY passed
    * ([[EventTimeOps.ripe]] — the µs tail of wm's millisecond can still
    * arrive, so a same-millisecond lower-rank stage may yet land) in
    * (ts, rank) order; returns transitions + the advanced state with
    * the pending rest. */
  private def applyReady(userId: Long, st: FunnelState, wm: Long):
      (List[StageReached], FunnelState) = {
    val (ready, pending) = st.buffer.partition(e => EventTimeOps.ripe(e._1, wm))
    var (v, c, p) = (st.vTs, st.cTs, st.pTs)
    val out = scala.collection.mutable.ListBuffer.empty[StageReached]
    ready.sorted.foreach { case (ts, rank) =>
      rank match {
        case 1 if v.isEmpty =>
          v = Some(ts); out += StageReached(userId, 1, ts)
        case 2 if c.isEmpty && v.exists(_ < ts) =>
          c = Some(ts); out += StageReached(userId, 2, ts)
        case 3 if p.isEmpty && c.exists(_ < ts) =>
          p = Some(ts); out += StageReached(userId, 3, ts)
        case _ => () // can't advance now and never will: drop
      }
    }
    // a completed funnel never advances again — no need to buffer
    val keep = if (p.isDefined) Nil else pending
    (out.toList, FunnelState(keep, v, c, p))
  }

  private def updateFn(streaming: Boolean)(userId: Long,
      rows: Iterator[FunnelEvent], state: GroupState[FunnelState]):
      Iterator[StageReached] = {
    val (wm, wmMs) = EventTimeOps.watermarkMicros(streaming, state)
    val prev = state.getOption.getOrElse(FunnelState(Nil, None, None, None))
    val incoming = rows.flatMap(e =>
      StageRank.get(e.eventType).map(r => (e.ts, r))).toList
    val (out, next) = applyReady(userId,
      prev.copy(buffer = prev.buffer ++ incoming), wm)
    // a completed funnel keeps its three stage timestamps as a TOMBSTONE
    // (buffer cleared, nothing else retained): removing the state here
    // would let a later event restart a second funnel for the user and
    // re-emit stages — the batch twin computes ONE funnel per user over
    // all history, and the TwinReplaySpec equality holds it to that.
    // Bounded forever by construction: 3 longs per user.
    state.update(next)
    if (wm != Long.MaxValue && next.buffer.nonEmpty)
      // wake when the watermark passes the earliest buffered event so a
      // quiet user's pending transitions still emit
      EventTimeOps.armWake(state, next.buffer.map(_._1).min, wmMs)
    out.iterator
  }

  /** Run the funnel over an event stream (watermark must already be
    * applied to `eventTime` for streaming input). */
  def funnel(events: Dataset[FunnelEvent]): Dataset[StageReached] = {
    import events.sparkSession.implicits._
    val timeout =
      if (events.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(updateFn(events.isStreaming))
  }
}
