package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the embedding-geometry drift gauge
  * (twin #37) — `emb_drift` stays queryable as vector batches land,
  * without recomputing the standing half's centroids per ingest.
  *
  * The [[DispersionIngest]] discipline exactly: no state-store state
  * (the directory IS the state); the gauge's corpus-touching work is
  * one (label, pos) aggregate whose cells (sv, n) are an additive
  * monoid over vectors ([[graft.ops.SimOps.driftPartials]] — shared
  * with the batch operator), so each micro-batch collapses to its own
  * ≤ labels×64-row partial frame, appended tagged with the batch id.
  * The standing half's partials are frozen at build; the report
  * re-derives both sides through the SAME
  * [[graft.ops.SimOps.driftFromAgg]] finish (milli demotion at finish
  * time only — the twin-#34 additivity lesson). foreachBatch is
  * at-least-once: a replayed batch appends byte-identical partials,
  * and the read path's (batch_id, label, pos) dedup collapses them
  * before the sum. State grows with batches × labels × 64 rows, never
  * with vectors; the partials log is additive, so it compacts only
  * past a replay horizon ([[IndexCompaction]]'s exclusion note). */
object EmbDriftIngest {

  private def gate(vecs: DataFrame): DataFrame = {
    graft.expressions.VectorExpressions.register(vecs.sparkSession)
    graft.ops.DedupOps.EmbGate.clean(vecs, "dnrm").drop("dnrm")
  }

  /** Freeze the standing corpus's centroid partials. */
  def buildStandingIndex(s: SparkSession, vecs: DataFrame, dir: String): Unit =
    graft.ops.SimOps.driftPartials(gate(vecs))
      .write.mode("overwrite").parquet(dir + "/standing")

  /** Collapse one vector batch to its partial cells and append. */
  def appendPartials(s: SparkSession, dir: String, vecs: DataFrame,
      batchId: Long): Unit =
    graft.ops.SimOps.driftPartials(gate(vecs))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/partials")

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(vecs: DataFrame, dir: String): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendPartials(b.sparkSession, dir, b, id)
      }

  /** The drift report over everything ingested so far — identical
    * bytes to the batch `emb_drift` over the same corpus split
    * (EmbDriftIngestSpec pins it). */
  def driftFromDir(s: SparkSession, dir: String): DataFrame = {
    val streamed = s.read.parquet(dir + "/partials")
      .dropDuplicates("batch_id", "label", "pos")
      .groupBy("label", "pos")
      .agg(sum("sv").as("sv"), sum("n").as("n"))
    graft.ops.SimOps.driftFromAgg(
      s.read.parquet(dir + "/standing"), streamed)
  }
}
