package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Semantic decontamination at ingest (twin #38) — the gate a
  * production pipeline actually runs: corpus vectors arrive as a
  * stream, each batch is scored against the FROZEN broadcast eval set
  * (built once, offline — eval suites change by release, not by
  * batch), and per-doc verdicts append to a decision log. The
  * per-batch work is `text_contamination_semantic`'s own projection
  * (ops/SimOps.scala — shared code path), so the maintained verdict
  * table is byte-equal to the batch operator over the same corpus.
  *
  * Exactly-once: verdicts are pure functions of (doc content, frozen
  * eval set) — content-derived rows, the [[BottomkSampleIngest]]
  * class — so redelivery appends byte-identical rows and the read
  * path's DISTINCT absorbs any interleaving. No batch-id machinery,
  * no state store; state grows with DOCS (one verdict row each),
  * which is the product's own output size, not index overhead. */
object SemContIngest {

  /** Freeze the eval side: the gated eval vectors, written once. */
  def buildEvalIndex(s: SparkSession, evalVecs: DataFrame, dir: String): Unit = {
    graft.expressions.VectorExpressions.register(s)
    graft.ops.DedupOps.EmbGate.clean(
        evalVecs.select(col("vec_id"), col("embedding")), "e_nrm")
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"),
        col("e_nrm"))
      .coalesce(1).write.mode("overwrite").parquet(dir + "/eval")
  }

  /** Score one corpus batch against the frozen eval set and append
    * its verdicts — the batch operator's own scoring tail. */
  def processBatch(s: SparkSession, dir: String, vecs: DataFrame): Unit = {
    graft.expressions.VectorExpressions.register(s)
    val eval = s.read.parquet(dir + "/eval")
    graft.ops.SimOps.semContVerdicts(
        graft.ops.DedupOps.EmbGate.clean(
          vecs.select(col("vec_id"), col("embedding")), "c_nrm"),
        eval)
      .write.mode("append").parquet(dir + "/verdicts")
  }

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(vecs: DataFrame, dir: String): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        processBatch(b.sparkSession, dir, b)
      }

  /** Every verdict so far — byte-equal to the batch operator over the
    * same corpus (SemContIngestSpec pins it). */
  def verdictsFromDir(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir + "/verdicts").distinct().orderBy("doc_id")
}
