package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Restart-safe streaming ingest for the training-shard layout — the
  * incremental form of `corpus_shard_assign`
  * (ops/PipelineOps.scala): documents flow in continuously and each is
  * appended to its content-hashed shard with a stable (pos, byte_start),
  * never moving a previously placed document.
  *
  * Scale design: the ONLY state per shard is its tail — a document
  * count and a running byte total (two longs), checkpointed by the
  * state store — so state size is O(shards) forever, independent of
  * corpus size or stream lifetime; this is the same per-shard-counter
  * discipline the batch operator's window already has. Within a
  * micro-batch, a shard's new documents are ordered by (h, doc_id) —
  * the batch rule — so replaying the same ingest batches reproduces
  * the same layout byte-for-byte; across micro-batches, arrival order
  * IS the layout order (an append-only file can't re-sort its past).
  * The per-batch sort buffers one micro-batch's slice of one shard —
  * ingest-batch-sized, never shard-sized.
  *
  * Twin equality (TwinReplaySpec): fed the whole corpus in
  * (h, doc_id)-ordered chunks it reproduces batch `corpus_shard_assign`
  * exactly; fed standing-then-ingest it reproduces
  * `corpus_shard_assign_incremental`; and the restart pin kills the
  * query between every chunk — tails come back from the checkpoint, so
  * a crashed ingest resumes without perturbing a single standing
  * offset. */
object ShardAssign {

  case class ShardDoc(shard: Int, docId: Long, nChars: Long, h: Long)
  case class ShardTail(nDocs: Long, nBytes: Long)
  case class ShardPos(doc_id: Long, shard: Int, pos: Int, byte_start: Long)

  /** `docs` carries (doc_id, n_chars); shard + in-shard order derive
    * from the shared content-stable hash. */
  def assign(docs: DataFrame): Dataset[ShardPos] = {
    import docs.sparkSession.implicits._
    val hd = docs.select(
        col("doc_id").as("docId"),
        coalesce(col("n_chars"), lit(0L)).as("nChars"),
        graft.ops.PipelineOps.shardHash(col("doc_id")).as("h"))
      .withColumn("shard",
        (col("h") % graft.ops.PipelineOps.NShardsOut).cast("int"))
      .as[ShardDoc]
    hd.groupByKey(_.shard)
      .flatMapGroupsWithState[ShardTail, ShardPos](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[ShardDoc], state: GroupState[ShardTail]) =>
          val tail = state.getOption.getOrElse(ShardTail(0L, 0L))
          // batch-local slice of this shard: ingest-batch-sized
          val rows = it.toSeq.sortBy(r => (r.h, r.docId))
          var nDocs = tail.nDocs
          var nBytes = tail.nBytes
          val out = rows.map { r =>
            nDocs += 1
            val bs = nBytes
            nBytes += r.nChars
            ShardPos(r.docId, shard, nDocs.toInt, bs)
          }
          state.update(ShardTail(nDocs, nBytes))
          out.iterator
      }
  }
}
