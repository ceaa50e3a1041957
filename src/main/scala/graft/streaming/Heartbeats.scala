package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idle-source mitigation — the engine's answer to the reference's
  * idle-watermark stall (README.md:526-545, img/idle-watermarks-problem):
  * a stateful op gated on the minimum watermark across sources emits
  * nothing while any source idles. Flink mitigates with per-source idle
  * timeouts or a Debezium heartbeat query; Spark watermarks are also
  * global-min, so we union a rate-source heartbeat into the stream:
  * heartbeat rows advance event time (they carry the wall clock in the
  * event-time column) and are filtered out right AFTER the watermark
  * node, so they contribute no data.
  *
  * Trade-offs:
  * - While a source idles, its watermark follows processing time, so a
  *   genuinely late row arriving after the idle period may be treated as
  *   late data (same as Flink's idle timeout).
  * - Unlike Flink's idle timeout, the heartbeat is ALWAYS on — the
  *   watermark tracks wall clock from the first trigger. This is correct
  *   for live tail-reading sources (the intended use: CDC topics where
  *   "now" is ahead of every event) but WRONG for backfills/replays of
  *   historical data, where it would mark the entire replay late. Don't
  *   wrap a backfill; bound the replay first, or run it in batch mode.
  */
object Heartbeats {

  /** Union a heartbeat into `df` (streaming), apply the watermark, drop
    * the heartbeat rows. All non-event-time columns of heartbeat rows are
    * null. */
  def withIdleHeartbeat(df: DataFrame, eventTimeCol: String, delay: String,
      rowsPerSecond: Int = 1): DataFrame = {
    require(df.isStreaming, "heartbeats only make sense on a streaming input")
    val hbCols = df.schema.fields.map { f =>
      if (f.name == eventTimeCol) col("timestamp").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    val hb = df.sparkSession.readStream
      .format("rate").option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(hbCols :+ lit(true).as("_hb"): _*)
    // The filter must reference the event-time column: Catalyst pushes
    // predicates that don't mention the watermark attribute BELOW the
    // EventTimeWatermark node, which would drop heartbeats before they
    // ever advance the watermark. `eventTime IS NULL` is always false
    // here (heartbeats carry the wall clock), but pins the filter above
    // the watermark.
    df.withColumn("_hb", lit(false))
      .unionByName(hb)
      .withWatermark(eventTimeCol, delay)
      .where(!col("_hb") || col(eventTimeCol).isNull)
      .drop("_hb")
  }
}
