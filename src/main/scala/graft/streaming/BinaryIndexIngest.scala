package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted binary-quantization index
  * (twin #26) — the TextIndexIngest/PQ-ingest shape for the simplest
  * index in the family: binarization is a pure per-row projection (no
  * codebook, no training state), so every micro-batch appends its own
  * 8 B/row sign codes plus its float rows and NOTHING else exists to
  * drift. The directory is the state; source offsets are the only
  * checkpoint; at-least-once redelivery is absorbed by the query
  * path's vec_id dedup on both tables (the PQ index's contract,
  * re-proven in BinaryIndexSpec with kill-between-chunk replays). */
object BinaryIndexIngest {

  /** Caller supplies trigger + checkpoint and starts the query.
    * `vecs` needs (vec_id, embedding). */
  def ingest(vecs: DataFrame, dir: String): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        graft.ops.SimOps.appendToBinaryIndex(b.sparkSession, dir, b)
      }
}
