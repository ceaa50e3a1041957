package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted IVF ANN index (twin #43) —
  * the [[BinaryIndexIngest]]/PQ-ingest lambda applied to the family's
  * centerpiece index: the coarse codebook is trained OFFLINE and fixed
  * ([[init]] — k-means is a training step, not an ingest step; recall
  * on appended data under centroid drift is a re-cluster-cadence
  * policy, measured in IvfIndexSpec's append pins), and every arriving
  * vector batch is closure-assigned to those standing centroids and
  * appended into its `list_id=` partition directories via
  * [[graft.ops.SimOps.appendToIvfIndex]] — the EXACT code path the
  * batch builder uses, so the streamed and offline-built indexes can
  * never drift (IvfIngestSpec pins query-result byte-equality with the
  * ingest killed between every chunk).
  *
  * Replay discipline: the directory is the state and source offsets are
  * the only checkpoint, so at-least-once redelivery double-appends
  * files — absorbed by the query path's read-time dedup (candidate
  * `distinct` + vec_id `dropDuplicates`, the closure-replication
  * machinery doing double duty; appendToIvfIndex's scaladoc). A
  * replayed batch is therefore INVISIBLE to answers, not merely
  * harmless. Compaction of the doubled files is the offline
  * [[IndexCompaction]] concern, same as every append-log index here.
  *
  * 100 TB posture: per-batch work is |batch| × k dot products against
  * the broadcast codebook plus one partition-clustered append — cost ∝
  * the batch, never the standing index; a query still materializes
  * only its probed `list_id=` directories no matter how many ingests
  * wrote them. */
object IvfIndexIngest {

  /** Seed a store: offline-trained codebook, no lists — the stream
    * delivers every vector. */
  def init(s: SparkSession, corpusDir: String, dir: String): Unit =
    graft.ops.SimOps.buildIvfCodebook(s, corpusDir, dir)

  /** Caller supplies trigger + checkpoint and starts the query.
    * `vecs` needs (vec_id, embedding). */
  def ingest(vecs: DataFrame, dir: String): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        graft.ops.SimOps.appendToIvfIndex(b.sparkSession, dir, b)
      }
}
