package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the KMV distinct sketch (`events_unique_users_kmv`,
  * ops/PipelineOps.scala): per-day distinct-user estimation at ingest
  * time, emitted when the watermark closes the day.
  *
  * Scale design — the point of a sketch at 100 TB/day is that partials
  * MERGE: state is keyed by (day, hash bucket), so the day's tokens
  * shard across [[NBuckets]] × shuffle-partitions groups instead of
  * serializing through one; each group emits one [[KmvPartial]] when
  * the watermark passes its day, and partials combine losslessly
  * ([[finalizeDay]]) because buckets partition the hash space — the
  * k smallest of the union are always within the per-bucket k
  * smallest, and per-bucket exact counts add. The combine step is a
  * k·buckets-row fold the CONSUMER runs (foreachBatch / the dashboard)
  * — the upsert-sink discipline, not a second stateful aggregate
  * stacked illegally in append mode (the cumulate lesson).
  *
  * Token arrival order never matters — set union is commutative and
  * idempotent — so unlike the buffer-until-watermark operators there
  * is NO ripeness gate here, only the emission timer. A straggler
  * arriving after its day finalized re-opens the group and emits a
  * supplementary partial; its k-mins still merge exactly (min of
  * overlapping sets is exact) but its exact-audit count may overlap
  * the finalized one — the same post-horizon caveat as
  * [[StreamingDedup]], and the TwinReplaySpec feeds in watermark order
  * where the issue cannot arise.
  *
  * The hash is the SAME codegen'd md5-prefix expression as the batch
  * sketch (32-bit value in a long), computed in the DataFrame layer
  * before the typed boundary, so batch and stream cannot disagree on a
  * single hash bit. The exact per-bucket count is the audit side,
  * exactly as in the batch op: state holds the distinct tok → h map
  * (bounded by the day's distinct tokens per bucket; the estimate
  * alone would need only the k-min heap). */
object StreamingKmv {

  private val DayUs = 86_400_000_000L
  private[graft] val NBuckets = 8

  /** One (day, bucket) partial: the bucket's exact distinct-token count
    * and its k smallest distinct 32-bit hashes, ascending. */
  case class KmvPartial(dayUs: Long, bucket: Int, exactDistinct: Long,
      kMins: Seq[Long])

  /** The merged per-day sketch — the batch row plus the day key. */
  case class DaySketch(dayUs: Long, exactDistinct: Long, kSeen: Long,
      kmvEstimateR: Double, relErrR: Option[Double])

  /** Internal row shape (public only for encoder codegen). */
  case class TokRow(dayUs: Long, bucket: Int, tok: String, h: Long,
      eventTime: java.sql.Timestamp)

  /** Internal state shape (public only for encoder codegen). */
  case class KmvState(toks: Map[String, Long])

  private def partialOf(key: (Long, Int), st: KmvState): KmvPartial = {
    val k = graft.ops.PipelineOps.KmvK
    KmvPartial(key._1, key._2, st.toks.size,
      st.toks.values.toSeq.distinct.sorted.take(k))
  }

  private def updateFn(streaming: Boolean)(key: (Long, Int),
      rows: Iterator[TokRow], state: GroupState[KmvState]):
      Iterator[KmvPartial] = {
    if (streaming && state.hasTimedOut) {
      val out = partialOf(key, state.get)
      state.remove()
      Iterator.single(out)
    } else {
      val prev = state.getOption.getOrElse(KmvState(Map.empty))
      val next = KmvState(prev.toks ++ rows.map(r => r.tok -> r.h))
      if (!streaming) {
        // batch mode = complete input: finalize immediately
        Iterator.single(partialOf(key, next))
      } else {
        state.update(next)
        val (_, wmMs) = EventTimeOps.watermarkMicros(streaming, state)
        // fire once the watermark strictly passes the day boundary; a
        // post-finalization straggler re-arms past the current watermark
        state.setTimeoutTimestamp(
          math.max((key._1 + DayUs) / 1000L + 1, wmMs + 1))
        Iterator.empty
      }
    }
  }

  /** Per-(day, bucket) partial sketches over a (tok, eventTime) frame
    * (watermark must already be applied for streaming input). */
  def partials(toks: DataFrame): Dataset[KmvPartial] = {
    import toks.sparkSession.implicits._
    val rows = toks.select(
      expr(s"(unix_micros(eventTime) div $DayUs) * $DayUs").as("dayUs"),
      col("tok"),
      // the batch sketch's hash expression, verbatim
      conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"),
      col("eventTime"))
      .withColumn("bucket", (col("h") % NBuckets).cast("int"))
      .as[TokRow]
    val timeout =
      if (toks.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    rows.groupByKey(r => (r.dayUs, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, timeout)(updateFn(toks.isStreaming))
  }

  /** Lossless partial merge + the batch op's finalization arithmetic:
    * exact counts add (buckets partition tokens), global k-mins are the
    * k smallest of the concatenation (buckets partition the hash
    * space), and the estimate/error spelling — including the HALF_UP
    * 6-digit rounding, written as the same BigDecimal.valueOf Spark's
    * round() codegen uses — mirrors kmvSketch so a merged day row is
    * byte-comparable to the batch sketch of the same day's tokens. */
  def finalizeDay(dayUs: Long, parts: Seq[KmvPartial]): DaySketch = {
    val k = graft.ops.PipelineOps.KmvK
    val exact = parts.map(_.exactDistinct).sum
    val merged = parts.flatMap(_.kMins).sorted.take(k)
    val kSeen = merged.size.toLong
    val est =
      if (kSeen < k) kSeen.toDouble
      else round6((k - 1).toDouble * 4294967296.0 / merged.last.toDouble)
    val rel =
      if (exact == 0L) None
      else Some(round6(math.abs(est - exact.toDouble) / exact.toDouble))
    DaySketch(dayUs, exact, kSeen, est, rel)
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
