package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the embedding-dispersion gauge (twin #34)
  * — the diversity-collapse audit stays queryable as vector batches
  * land, without ever recomputing over the standing corpus.
  *
  * The DriftIngest discipline (twin #19): NO state-store state — the
  * directory IS the state. emb_dispersion's corpus-touching work is
  * ONE (grp, pos) aggregate whose cells (Σv, Σv², n) are an additive
  * monoid over vectors ([[graft.ops.SimOps.dispersionPartials]]), so
  * each micro-batch collapses to its own ≤ (labels+1)×64-row partial
  * frame, appended tagged with the batch id. The gauge re-derives at
  * query time by summing cells and finishing through the SAME
  * [[graft.ops.SimOps.dispersionFromAgg]] grid the batch operator
  * runs — twin equality is structural. Crucially the milli demotion
  * happens ONLY at finish time, on the summed sv: demoting per batch
  * would make (sv div 1000) non-additive and the twin would drift on
  * the third decimal.
  *
  * foreachBatch is AT-LEAST-ONCE: a replayed batch appends its
  * partials AGAIN, byte-identical (the per-batch aggregate is
  * deterministic in its content). The query path dedups by
  * (batch_id, grp, pos) before summing, so a retry is invisible
  * (DispersionIngestSpec pins it, plus kill-between-every-chunk
  * restarts). At 100 TB the appended state grows with batches ×
  * (labels+1) × 64 rows — never with vectors. */
object DispersionIngest {

  /** Collapse one vector batch to its partial cell frame and append
    * it. The EmbGate corrupt-vector filter is per-row, hence applied
    * per batch with identical corpus semantics. Exposed separately so
    * the replay pin can drive it directly. */
  def appendPartials(s: SparkSession, dir: String, vecs: DataFrame,
      batchId: Long): Unit = {
    graft.expressions.VectorExpressions.register(s)
    val gated = graft.ops.DedupOps.EmbGate.clean(vecs, "dnrm").drop("dnrm")
    graft.ops.SimOps.dispersionPartials(gated)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(dir + "/partials")
  }

  /** Caller supplies trigger + checkpoint and starts the query. */
  def ingest(vecs: DataFrame, dir: String): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        appendPartials(b.sparkSession, dir, b, id)
      }

  /** The dispersion gauge over everything ingested so far — identical
    * bytes to the batch operator over the same corpus. */
  def dispersionFromPartials(s: SparkSession, dir: String): DataFrame = {
    val t = s.read.parquet(dir + "/partials")
      .dropDuplicates("batch_id", "grp", "pos")
      .groupBy("grp", "pos")
      .agg(sum("sv").as("sv"), sum("q2").as("q2"), sum("n").as("n"))
    graft.ops.SimOps.dispersionFromAgg(t)
  }
}
