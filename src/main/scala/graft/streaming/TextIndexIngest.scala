package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted inverted index
  * (ops/RetrievalOps.buildTextIndex's layout): each micro-batch of
  * `(doc_id, text)` documents appends its postings and doc lengths via
  * [[graft.ops.RetrievalOps.appendToTextIndex]].
  *
  * No state-store state at all — the index directory IS the state, and
  * the corpus stats BM25 needs (n_docs, sum_dl) are re-derived
  * additively from it at query time, so there is nothing to checkpoint
  * beyond the source offsets.
  *
  * foreachBatch is AT-LEAST-ONCE: a crash between the parquet append
  * and the offset commit replays the batch and appends it AGAIN. That
  * is exactly the failure mode the index absorbs by construction — the
  * query path dedups postings by (doc_id, tok) and doclens by doc_id
  * (TextIndexSpec's replayed-append pin), so the ingest is effectively
  * exactly-once in its ANSWERS without a transactional sink. The
  * kill-between-every-chunk replay in TextIndexSpec proves the composed
  * claim: restart + replay never perturbs a ranking. */
object TextIndexIngest {

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(docs: DataFrame, dir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        graft.ops.RetrievalOps.appendToTextIndex(b.sparkSession, dir, b)
      }
}
