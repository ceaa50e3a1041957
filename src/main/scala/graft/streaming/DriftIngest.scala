package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the corpus drift monitor (twin #19) —
  * the production shape corpus_drift's scaladoc names: a standing
  * corpus on one side, live ingest on the other, and a drift row that
  * must stay queryable as batches land.
  *
  * The TextIndexIngest discipline (twin #17): NO state-store state at
  * all — the directory IS the state. Each micro-batch collapses to its
  * own (tok, np, nq) partial frame (the drift monitor's ONE
  * corpus-touching aggregate is additive, so per-batch partials sum to
  * the batch-op frame exactly) and appends it tagged with the batch id.
  * The drift row re-derives from the directory at query time through
  * the SAME counts→divergence core the batch operator runs
  * (PipelineOps.driftFromCounts), so twin equality is structural — and
  * the capped-head support means the query-side work after the summed
  * unigram frame is DriftVocabCap-bounded regardless of how many
  * batches accumulated.
  *
  * foreachBatch is AT-LEAST-ONCE: a crash between the parquet append
  * and the offset commit replays the batch and appends its partials
  * AGAIN. The query path dedups by (batch_id, tok) before summing —
  * replayed partials are byte-identical (the batch aggregate is
  * deterministic), so a retry is invisible to the drift row
  * (DriftIngestSpec pins it, plus the kill-between-every-chunk
  * restart replay). */
object DriftIngest {

  /** Collapse one document batch to its partial unigram frame and
    * append it. Exposed separately so the replay pin can drive it
    * directly. */
  def appendPartials(s: SparkSession, dir: String, docs: DataFrame,
      batchId: Long): Unit =
    graft.ops.PipelineOps.driftTokenCounts(docs)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/partials")

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(docs: DataFrame, dir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendPartials(b.sparkSession, dir, b, id)
      }

  /** The drift row over everything ingested so far — identical bytes
    * to the batch operator over the same corpus. */
  def driftFromPartials(s: SparkSession, dir: String): DataFrame = {
    val t = s.read.parquet(dir + "/partials")
      .dropDuplicates("batch_id", "tok")
      .groupBy("tok").agg(sum("np").as("np"), sum("nq").as("nq"))
    graft.ops.PipelineOps.driftFromCounts(t)
  }
}
