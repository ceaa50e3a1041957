package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Restart-safe streaming form of `corpus_source_cap` (twin #18): the
  * per-domain ceiling maintained over a document stream, with the SAME
  * content-stable semantics as the batch op — the kept set is the
  * SourceCap smallest salted hashes per source, regardless of arrival
  * order. Arrival order can't be allowed to matter (the batch op's
  * whole point is reproducibility), so a later-arriving document with a
  * smaller hash EVICTS a standing keeper: the output is a changelog of
  * keep/evict events (the changelog_upsert discipline — a downstream
  * materializer folds it into the kept set).
  *
  * Scale design: state per source is the kept list itself — at most
  * [[graft.ops.PipelineOps.SourceCap]] (hash, doc_id) entries, so state
  * is O(sources · cap) forever, independent of stream lifetime; the cap
  * IS the state bound. Within a micro-batch, a source's documents are
  * processed in (hash, doc_id) order so replaying the same chunks is
  * byte-identical; across batches the eviction rule makes the FINAL
  * kept set chunk-boundary-independent (TwinReplaySpec pins equality
  * with the batch op under chunked replay AND kill-between-every-chunk
  * restart). At-least-once redelivery is idempotent by construction: a
  * standing keeper re-arriving emits nothing, an evicted or rejected
  * document re-arriving competes again with the same hash and loses
  * again. */
object SourceCapIngest {

  case class DocIn(source: String, docId: Long, h: String)
  /** Parallel-array state (robust product encoding): the kept (h, id)
    * pairs, sorted ascending. */
  case class CapState(hs: Seq[String], ids: Seq[Long])
  case class CapEvent(source: String, doc_id: Long, action: String)

  def assign(docs: DataFrame): Dataset[CapEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cap = graft.ops.PipelineOps.SourceCap
    docs
      .select(coalesce(col("source"), lit("")).as("source"),
        col("doc_id").as("docId"),
        md5(concat(lit("cap#"), col("doc_id"))).as("h"))
      .as[DocIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState[CapState, CapEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[DocIn], state: GroupState[CapState]) =>
          val st = state.getOption.getOrElse(CapState(Nil, Nil))
          var kept = st.hs.zip(st.ids).toList // ascending (h, id)
          val out = scala.collection.mutable.ArrayBuffer.empty[CapEvent]
          it.toSeq.sortBy(r => (r.h, r.docId)).foreach { r =>
            val key = (r.h, r.docId)
            if (!kept.contains(key)) {
              if (kept.size < cap) {
                kept = (key :: kept).sorted
                out += CapEvent(source, r.docId, "keep")
              } else if (Ordering[(String, Long)].lt(key, kept.last)) {
                out += CapEvent(source, kept.last._2, "evict")
                out += CapEvent(source, r.docId, "keep")
                kept = (key :: kept.dropRight(1)).sorted
              } // else: rejected, silently — it can never displace a keeper
            }
          }
          state.update(CapState(kept.map(_._1), kept.map(_._2)))
          out.iterator
      }
  }
}
