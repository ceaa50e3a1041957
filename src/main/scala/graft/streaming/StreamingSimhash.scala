package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup detection at ingest — the simhash form of
  * `dedup_simhash_pairs` (ops/DedupOps.scala): documents flow in
  * continuously and any new document within hamming ≤ 3 of something
  * seen inside the watermark horizon is reported as a near-dup pair
  * before it reaches the corpus. Complements [[StreamingDedup]], which
  * only catches EXACT content matches at ingest.
  *
  * Scale design: state is keyed by the same (block, 16-bit value)
  * pigeonhole buckets the batch index joins on — a bucket holds only
  * the fingerprints (8 B + id + timestamp per member) that hashed into
  * it within the horizon, so state is bounded by ingest rate × horizon
  * / 2¹⁶ per key, uniform by construction, and garbage-collected
  * against the event-time watermark on every invocation. Each new
  * document compares against its four buckets' standing members only —
  * the same Σ bucket² work bound as the batch join, incrementalized.
  *
  * Cross-bucket exactly-once WITHOUT a second stateful operator: a
  * pair within hamming ≤ 3 shares ≥ 1 of the 4 blocks (pigeonhole),
  * and often several — but both fingerprints are in hand inside the
  * bucket lambda, so every bucket can decide locally whether IT is the
  * pair's canonical emitter: the pair is emitted only by the LOWEST
  * agreeing block index. No dropDuplicates downstream (chaining
  * another stateful operator after flatMapGroupsWithState is exactly
  * the shape Structured Streaming restricts), no duplicate pairs out.
  *
  * The documented trade (same as [[StreamingDedup]]): a near-dup
  * arriving after its partner's bucket entry expired past the horizon
  * is NOT reported; cross-horizon near-dedup belongs to the batch
  * operator over the materialized corpus (the standard lambda split).
  */
object StreamingSimhash {

  private val MaxHamming = 3
  private val NBlocks = 4 // 4 × 16-bit blocks under the generic split

  case class Keyed(cmb: Int, key: Long, docId: Long,
      fpHi: Long, fpLo: Long, eventTime: java.sql.Timestamp)
  case class Member(docId: Long, fpHi: Long, fpLo: Long, tsMs: Long)
  case class BucketState(members: List[Member])
  case class NearPair(doc_a: Long, doc_b: Long, hamming: Long)

  private def fp64(hi: Long, lo: Long): Long = (hi << 32) | lo

  /** Generic bucket-state near-dup core over a fingerprint stream
    * (docId, fpHi, fpLo, eventTime) — the machinery above,
    * parameterized on the batch join's MSB-first block split
    * (DedupOps.blockedPairsFrom's geometry: block i spans
    * 64/n (+1 for the first 64%n) bits) so any 64-bit-fingerprint
    * family can run its ingest form against the SAME buckets its batch
    * index joins on. Pigeonhole precondition: maxHamming < nBlocks
    * (≤ maxHamming flips leave ≥ 1 block untouched), which also makes
    * the lowest agreeing block a well-defined canonical emitter. */
  private[streaming] def bucketPairs(fp: DataFrame, nBlocks: Int,
      maxHamming: Int, horizon: String): Dataset[NearPair] = {
    require(maxHamming < nBlocks, "pigeonhole needs maxHamming < nBlocks")
    val sizes = Array.tabulate(nBlocks)(i =>
      64 / nBlocks + (if (i < 64 % nBlocks) 1 else 0))
    val starts = sizes.scanLeft(0)(_ + _)
    // the state lambda may only capture plain VALUES: a local def lifts
    // onto this (non-serializable) module and the closure cleaner
    // rejects the whole task — precompute the per-block shift/mask
    // arrays and inline the block logic below
    val shifts = Array.tabulate(nBlocks)(i => 64 - starts(i) - sizes(i))
    val masks = Array.tabulate(nBlocks)(i => (1L << sizes(i)) - 1)
    val nb = nBlocks
    val maxH = maxHamming
    val s = fp.sparkSession
    import s.implicits._
    val wmfp = fp.withWatermark("eventTime", horizon)
    val packed = shiftleft(col("fpHi"), 32).bitwiseOR(col("fpLo"))
    val keyed = wmfp
      .select(col("docId"), col("fpHi"), col("fpLo"), col("eventTime"),
        posexplode(array((0 until nBlocks).map(i =>
          shiftrightunsigned(packed, 64 - starts(i) - sizes(i))
            .bitwiseAND(lit((1L << sizes(i)) - 1))): _*)).as(Seq("cmb", "key")))
      .as[Keyed]
    keyed.groupByKey(k => (k.cmb, k.key))
      .flatMapGroupsWithState[BucketState, NearPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((cmb, _), it, state: GroupState[BucketState]) =>
          // expire members the watermark has passed: the watermark lags
          // max event time by the horizon, so `tsMs >= watermark` IS
          // the horizon window
          val wm = state.getCurrentWatermarkMs()
          var members = state.getOption.map(_.members).getOrElse(Nil)
            .filter(_.tsMs >= wm)
          // deterministic within-batch order: a batch's later document
          // pairs against its earlier ones exactly once
          val rows = it.toSeq.sortBy(r => (r.eventTime.getTime, r.docId))
          val out = Seq.newBuilder[NearPair]
          for (r <- rows) {
            val rFp = (r.fpHi << 32) | r.fpLo
            for (m <- members if m.docId != r.docId) {
              val h = java.lang.Long.bitCount(m.fpHi ^ r.fpHi) +
                java.lang.Long.bitCount(m.fpLo ^ r.fpLo)
              if (h <= maxH) {
                // lowest agreeing block = the pair's canonical emitter
                val mFp = (m.fpHi << 32) | m.fpLo
                var fa = 0
                while (fa < nb &&
                    ((rFp >>> shifts(fa)) & masks(fa)) != ((mFp >>> shifts(fa)) & masks(fa)))
                  fa += 1
                if (fa == cmb)
                  out += NearPair(math.min(m.docId, r.docId),
                    math.max(m.docId, r.docId), h.toLong)
              }
            }
            members ::= Member(r.docId, r.fpHi, r.fpLo, r.eventTime.getTime)
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** `docs` carries (doc_id, text, eventTime). Emits each near-dup
    * pair once, as (min id, max id, hamming), as soon as the later
    * document of the pair is processed — no watermark gating on
    * OUTPUT; the watermark only expires bucket members. */
  def pairs(docs: DataFrame, horizon: String): Dataset[NearPair] = {
    val s = docs.sparkSession
    graft.expressions.TextShingles.register(s)
    graft.expressions.SimHashFingerprint.register(s)
    // identical fingerprint pipeline to the batch operator: the shared
    // codegen expressions, unsigned-32 packing; the generic core's
    // MSB-first split reduces to the 4×16-bit blocks at nBlocks = 4
    val fp = docs
      .select(col("doc_id").as("docId"),
        expr("simhash_fp(text_shingles(text, 1))").as("fp"), col("eventTime"))
      .select(col("docId"),
        element_at(col("fp"), 1).as("fpHi"),
        element_at(col("fp"), 2).as("fpLo"), col("eventTime"))
    bucketPairs(fp, NBlocks, MaxHamming, horizon)
  }
}
