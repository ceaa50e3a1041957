package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact content dedup at stream-ingest time — the streaming form of
  * `dedup_exact` (ops/DedupOps.scala): new documents flow in
  * continuously and a duplicate of anything seen within the watermark
  * horizon is dropped before it reaches the corpus.
  *
  * Scale design: `dropDuplicatesWithinWatermark` keys state on the
  * 128-bit content hash (uniform by construction — same argument as the
  * batch operator) and GARBAGE-COLLECTS each key once the event-time
  * watermark passes its expiry, so state is bounded by the ingest rate
  * × horizon, not by corpus lifetime — the plain `dropDuplicates`
  * would grow state forever at 100 TB/day. The documented trade-off:
  * a duplicate arriving AFTER its original's state expired is emitted
  * again; cross-horizon dedup belongs to the batch operator running
  * over the materialized corpus (the standard lambda split).
  */
object StreamingDedup {

  /** Drop documents whose md5(text) was already seen within the
    * watermark horizon. `docs` must carry an event-time column. */
  def dedupExact(docs: DataFrame, eventTimeCol: String,
      horizon: String): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
