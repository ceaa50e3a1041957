package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the curation-funnel accounting (twin #33)
  * — corpus_funnel's production shape: documents land in micro-batches
  * and the five-stage table must stay queryable without re-scanning
  * the corpus per report.
  *
  * The DriftIngest directory-as-state discipline: NO state-store state.
  * Each micro-batch appends two content-derived frames —
  *  - `meta/`: one row per document with the funnel's derived columns
  *    (source, token count, content hash, quality verdict) via the
  *    SAME [[graft.ops.PipelineOps.funnelMetaOf]] the batch operator
  *    runs (per-document determinism makes batch unions equal the
  *    corpus frame);
  *  - `shingles/`: the documents' (doc_id, sh) rows via
  *    [[graft.ops.DedupOps.shinglesOfDocs]] — the near-dup stage's
  *    pair graph must cover every ingested document, and shingles are
  *    the additive representation of that graph (the MinhashDedupIngest
  *    band-index lesson: append the content-derived index rows, derive
  *    pairs at read).
  * The report re-derives through the IDENTICAL
  * [[graft.ops.PipelineOps.funnelCore]] +
  * [[graft.ops.DedupOps.cappedPairsFromShingles]] fold the batch
  * operator runs, so twin equality is structural, not coincidental.
  *
  * Scale shape: per-batch work is one projection + one shingle explode
  * over the BATCH (appends, no reads); the corpus-sized self-join and
  * CC run once per REPORT, df-capped — which is the honest cost model:
  * the funnel is a curation report, not a per-event metric, and its
  * near-dup stage is irreducibly graph-shaped. Stage counts 0-2 stay
  * maintainable as pure folds of the meta state.
  *
  * foreachBatch is AT-LEAST-ONCE: a crash between the appends and the
  * offset commit replays the batch and appends both frames AGAIN.
  * Every state row is content-derived and batch-deterministic, so the
  * report path dedups by row identity — (doc_id) for meta, (doc_id,
  * sh) for shingles — and a retry is invisible (the bottom-k monoid
  * limiting case: no decision reconciliation exists because the state
  * IS a set). FunnelIngestSpec pins it, plus the
  * kill-between-every-chunk restart replay. */
object FunnelIngest {

  /** Append one document batch's meta + shingle state. Exposed
    * separately so the replay pin can drive it directly. */
  def appendState(s: SparkSession, dir: String, docs: DataFrame,
      batchId: Long): Unit = {
    graft.ops.PipelineOps.funnelMetaOf(docs)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/meta")
    graft.ops.DedupOps.shinglesOfDocs(s, docs)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/shingles")
  }

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(docs: DataFrame, dir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendState(b.sparkSession, dir, b, id)
      }

  /** The five-stage funnel over everything ingested so far — identical
    * bytes to the batch operator over the same corpus. */
  def funnelFromState(s: SparkSession, dir: String): DataFrame = {
    val meta = s.read.parquet(dir + "/meta")
      .dropDuplicates("doc_id")
      .select("doc_id", "source", "n_tok", "content_hash", "is_good")
    val sh = s.read.parquet(dir + "/shingles")
      .dropDuplicates("doc_id", "sh")
      .select("doc_id", "sh")
    graft.ops.PipelineOps.funnelCore(meta,
      graft.ops.DedupOps.cappedPairsFromShingles(sh).select("doc_a", "doc_b"))
  }
}
