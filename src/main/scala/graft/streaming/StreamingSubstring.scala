package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-substring near-dup detection at ingest — the
  * winnowed-fingerprint form of `dedup_substring` (ops/DedupOps.scala):
  * documents flow in continuously and any new document sharing ≥ 2
  * winnowed fingerprints (i.e. a verbatim span ≥ 35 normalized chars,
  * the batch operator's guarantee) with something seen inside the
  * watermark horizon is reported before it reaches the corpus. Sits
  * between [[StreamingDedup]] (exact content) and [[StreamingSimhash]]
  * (whole-doc near-dup) in granularity, exactly as the batch operators
  * do.
  *
  * Scale design: state is keyed by the fingerprint itself — the same
  * uniform content-derived key the batch inverted index shuffles on — and
  * a bucket holds only (docId, tsMs) members within the horizon, hard-
  * bounded at DfCap+1 entries (beyond that the fingerprint is HOT and
  * stops pairing — the arrival-prospective form of the batch operator's
  * corpus-retrospective df cap; identical whenever no fingerprint
  * crosses the cap, which the twin replay pins on the harness corpus
  * where max df = 6). Members are garbage-collected against the
  * event-time watermark on every invocation.
  *
  * Cross-bucket assembly WITHOUT a second stateful operator: each
  * bucket emits its OWN fingerprint's pair evidence exactly once (the
  * later document pairs against standing members the moment it is
  * processed), so the per-(pair, fp) hit stream is duplicate-free by
  * construction, and the ≥ [[graft.ops.DedupOps.SubMinShared]] floor is
  * a stateless consumer-side fold ([[finalizePairs]]) — the same
  * lossless partial-merge shape [[StreamingKmv]] uses, never a chained
  * stateful aggregate.
  *
  * The documented trade (same as the other ingest twins): a duplicated
  * span arriving after its partner's bucket entries expired past the
  * horizon is NOT reported; cross-horizon substring dedup belongs to
  * the batch operator over the materialized corpus.
  */
object StreamingSubstring {

  case class Keyed(fp: Long, docId: Long, eventTime: java.sql.Timestamp)
  case class Member(docId: Long, tsMs: Long)
  case class BucketState(members: List[Member])
  case class FpHit(doc_a: Long, doc_b: Long, fp: Long)

  /** `docs` carries (doc_id, text, eventTime). Emits one row per
    * (pair, shared fingerprint), as soon as the later document of the
    * pair is processed — no watermark gating on OUTPUT; the watermark
    * only expires bucket members. */
  def hits(docs: DataFrame, horizon: String): Dataset[FpHit] = {
    val s = docs.sparkSession
    graft.expressions.WinnowedFingerprints.register(s)
    import s.implicits._
    val (k, w, cap) = (graft.ops.DedupOps.SubK, graft.ops.DedupOps.SubW,
      graft.ops.DedupOps.SubDfCap)
    val keyed = docs
      .select(col("doc_id").as("docId"), col("eventTime"),
        explode(expr(s"winnow_fps(text, $k, $w)")).as("fp"))
      .withWatermark("eventTime", horizon)
      .as[Keyed]
    keyed.groupByKey(_.fp)
      .flatMapGroupsWithState[BucketState, FpHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (fp, it, state: GroupState[BucketState]) =>
          // expire members the watermark has passed (the watermark lags
          // max event time by the horizon, so tsMs >= watermark IS the
          // horizon window)
          val wm = state.getCurrentWatermarkMs()
          var members = state.getOption.map(_.members).getOrElse(Nil)
            .filter(_.tsMs >= wm)
          // deterministic within-batch order: a batch's later document
          // pairs against its earlier ones exactly once
          val rows = it.toSeq.sortBy(r => (r.eventTime.getTime, r.docId))
          val out = Seq.newBuilder[FpHit]
          for (r <- rows) {
            // pair only while the bucket is below the cap — the
            // prospective df gate; size is O(cap) on the bounded list
            if (members.size <= cap) {
              for (m <- members if m.docId != r.docId)
                out += FpHit(math.min(m.docId, r.docId),
                  math.max(m.docId, r.docId), fp)
            }
            // newest-first, hard memory bound: cap+1 entries suffice to
            // know the bucket is hot
            members = (Member(r.docId, r.eventTime.getTime) :: members)
              .take(cap + 1)
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** The stateless ≥ SubMinShared assembly over the hit stream —
    * consumer-side, batch-compatible: count DISTINCT shared
    * fingerprints per pair (the stream is duplicate-free per (pair, fp),
    * distinct makes the fold idempotent under sink-side replay too). */
  def finalizePairs(hits: DataFrame): DataFrame =
    hits.groupBy("doc_a", "doc_b")
      .agg(countDistinct("fp").as("n_shared"))
      .where(col("n_shared") >= graft.ops.DedupOps.SubMinShared)
}
