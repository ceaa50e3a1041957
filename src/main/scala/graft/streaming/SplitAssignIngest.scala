package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming leakage-safe split assignment at ingest (twin #30) — the
  * production shape of [[graft.ops.PipelineOps.sampleSplitCluster]]:
  * the near-dup cluster labels build OFFLINE over the standing corpus
  * (the batch CC, unchanged, persisted as an index directory), and
  * live documents take their train/val/test side as they arrive — the
  * keeper's hash when the standing graph knows them, their own hash
  * when it doesn't (a genuinely novel document has no near-dup yet, so
  * its own hash IS the cluster hash; when a later index rebuild links
  * it, the content-stable hash means re-assignment only happens if its
  * KEEPER changed — exactly the docs whose split must move to preserve
  * the guarantee).
  *
  * The ModelScoreIngest discipline: assignment is a pure function of
  * (doc_id, standing index), so there is NO state-store state; scores
  * append under their batch id and the read path dedups by doc_id —
  * a replayed batch's rows are byte-identical, so at-least-once
  * redelivery is invisible. Per-batch cost: one doc_id equi-join of
  * the batch against the label index (pair endpoints only — the
  * overwhelming unpaired mass joins nothing and takes the coalesce
  * fallback). */
object SplitAssignIngest {

  /** Build the standing label index over the standing corpus — the
    * batch cluster-split's own CC label frame, persisted. */
  def buildLabelIndex(s: SparkSession, standingDir: String, dir: String): Unit =
    graft.ops.DedupOps.connectedComponents(
      graft.ops.DedupOps.ngramJaccardCapped(s, standingDir).select("doc_a", "doc_b"))._1
      .write.mode("overwrite").parquet(dir + "/labels")

  /** Assign one (doc_id, ...) batch under the standing index — the
    * batch operator's exact coalesce/hash/threshold frames. */
  def assignBatch(s: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    import graft.ops.PipelineOps.{splitHash, splitLabel}
    docs.select(col("doc_id"))
      .join(s.read.parquet(dir + "/labels"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_keeper"), col("doc_id")).as("split_key"))
      .withColumn("bucket", splitHash(col("split_key")))
      .withColumn("split", splitLabel(col("bucket")))
  }

  /** Append one batch's assignments. Exposed separately so the replay
    * pin can re-deliver a batch directly. */
  def appendAssignments(s: SparkSession, dir: String, docs: DataFrame,
      batchId: Long): Unit =
    assignBatch(s, docs, dir)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/assigned")

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(docs: DataFrame, dir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendAssignments(b.sparkSession, dir, b, id)
      }

  /** Everything assigned so far — under any chunking and any
    * redelivery, row-identical to the batch operator over the same
    * corpus and index. */
  def assignmentsFromDir(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir + "/assigned")
      .drop("batch_id")
      .dropDuplicates("doc_id")
      .select("doc_id", "split_key", "bucket", "split")
}
