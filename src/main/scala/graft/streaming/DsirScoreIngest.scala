package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming DSIR scoring at ingest (twin #24) — the production shape
  * of data selection: the hashed-bucket model trains OFFLINE over the
  * standing corpus ([[graft.ops.SelectOps.buildDsirModel]], ≤ DsirB
  * rows + one OOV constant — the whole standing state), and live
  * documents get their importance weight as they arrive. Scoring is a
  * stateless projection: tokenize → bucket → broadcast-join the model
  * → integer weight sum; NO state-store state, per-batch cost is the
  * batch's own tokens, forever.
  *
  * The ModelScoreIngest discipline verbatim: scores append under their
  * micro-batch id, the read path dedups by doc_id — a replayed batch's
  * rows are byte-identical (scoring is deterministic under a FIXED
  * standing model), so at-least-once redelivery is invisible. Twin
  * equality is structural: per-batch scoring runs the SAME frames as
  * [[graft.ops.SelectOps.dsirWeightsFromModel]], so the union over any
  * chunking equals the batch scorer row-for-row. Downstream, a
  * selection pass ranks the accumulated weights exactly as
  * corpus_dsir_select ranks the batch frame (weights, not rank state,
  * are what stream — fixed-budget top-K is a batch decision over the
  * scored pool). */
object DsirScoreIngest {

  /** Append one batch's weights. Exposed separately so the replay pin
    * can re-deliver a batch directly. */
  def appendWeights(s: SparkSession, dir: String, modelDir: String,
      docs: DataFrame, batchId: Long): Unit =
    graft.ops.SelectOps.dsirWeightsFromModel(s, modelDir, docs)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/weights")

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(docs: DataFrame, dir: String, modelDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendWeights(b.sparkSession, dir, modelDir, b, id)
      }

  /** Everything scored so far — under any chunking and any redelivery,
    * row-identical to the batch scorer over the same corpus and model. */
  def weightsFromDir(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir + "/weights")
      .drop("batch_id")
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("n_tok"), col("w_milli"))
}
