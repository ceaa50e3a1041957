package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming model scoring at ingest (twin #20) — the production shape
  * of the quality classifier: the model trains OFFLINE over the
  * standing corpus (the batch trainer, unchanged), and live documents
  * are scored as they arrive. Scoring is a pure stateless projection —
  * the standing model is [[graft.ops.ClassifierOps.QcWidth]] longs
  * riding a literal into every micro-batch (the broadcast-codebook
  * convention), so there is NO state-store state and per-batch cost is
  * the batch's own rows, forever.
  *
  * The TextIndexIngest discipline: the directory IS the state. Each
  * micro-batch's scores append under their batch id; the query path
  * drops the batch id and dedups by doc_id — a replayed batch's rows
  * are byte-identical (scoring is deterministic under a FIXED standing
  * model), so at-least-once redelivery is invisible. Twin equality is
  * structural: per-batch scoring runs the SAME featurize→margin→
  * sigmoid frames the batch apply runs, under the same weights, so the
  * union over any chunking equals the batch operator row-for-row. */
object ModelScoreIngest {

  /** Train the standing model over the standing corpus — the batch
    * trainer verbatim; [[graft.ops.ClassifierOps.QcWidth]] micro-longs
    * of driver state (the codebook convention). */
  def standingModel(s: SparkSession, standingDir: String): Array[Long] = {
    import graft.ops.ClassifierOps._
    val feats = qcFeats(qcFeatureRows(graft.Tables.documents(s, standingDir)))
      .localCheckpoint()
    qcTrainWeights(s, feats).collect().head
      .getSeq[Long](0).toArray
  }

  private def weightsFrame(s: SparkSession, wm: Array[Long]): DataFrame =
    s.range(1).select(typedLit(wm.toSeq).as("wm"))

  /** Score one document batch under the standing model — the batch
    * apply's exact frames. */
  def scoreBatch(s: SparkSession, docs: DataFrame, wm: Array[Long]): DataFrame = {
    import graft.ops.ClassifierOps._
    qcScore(qcFeats(qcFeatureRows(docs)), weightsFrame(s, wm))
      .select(col("doc_id"), col("p_micro"), col("pred"), col("y"))
  }

  /** Append one batch's scores. Exposed separately so the replay pin
    * can re-deliver a batch directly. */
  def appendScores(s: SparkSession, dir: String, docs: DataFrame,
      wm: Array[Long], batchId: Long): Unit =
    scoreBatch(s, docs, wm)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/scores")

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(docs: DataFrame, dir: String, wm: Array[Long]): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendScores(b.sparkSession, dir, b, wm, id)
      }

  /** Everything scored so far — under any chunking and any redelivery,
    * row-identical to the batch apply over the same corpus and model. */
  def scoresFromDir(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir + "/scores")
      .drop("batch_id")
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("p_micro"), col("pred"), col("y"))
}
