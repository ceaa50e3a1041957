package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming perceptual near-dup at ingest for MEDIA (twin #21) — the
  * [[StreamingSimhash]] bucket machinery run at the media families'
  * geometry: 6 MSB-first blocks over the 56-bit hash
  * (DedupOps.blockedPairsFrom's split, bit for bit), hamming ≤ 4 — a
  * ≤4-bit difference touches ≤ 4 of 6 blocks, so ≥ 2 agree: the
  * pigeonhole holds and the lowest agreeing block stays the canonical
  * emitter, no duplicate pairs out.
  *
  * The fingerprint stage is the REAL codec path per arriving document
  * — the SAME per-row functions the batch frames call
  * ([[graft.ops.MultimodalOps.dhashOf]] PNG encode→decode,
  * [[graft.ops.MultimodalOps.afpOf]] WAV encode→decode,
  * [[graft.ops.MultimodalOps.vfpOf]] MP4 write→box-walk→mdat), so the
  * streaming forms can never hash a document differently from the
  * batch indexes. Both fixture variants enter the stream per doc,
  * mirroring the batch id space (vid = doc_id·2 + v).
  *
  * State per (block, value) bucket is the horizon's fingerprints only,
  * watermark-expired — and the horizon trade is the same one
  * StreamingSimhash pins: a near-dup arriving after its partner
  * expired belongs to the batch operator over the materialized corpus.
  */
object StreamingMediaDedup {

  private def bucketed(fp: DataFrame, horizon: String): Dataset[StreamingSimhash.NearPair] =
    StreamingSimhash.bucketPairs(fp,
      graft.ops.MultimodalOps.DhashBlocks,
      graft.ops.MultimodalOps.DhashMaxHamming, horizon)

  /** Image rows (doc_id % 3 == 0) hashed through the real PNG path.
    * `docs` carries (doc_id, text, eventTime); emits
    * (min vid, max vid, hamming) once per pair. */
  def pairs(docs: DataFrame, horizon: String): Dataset[StreamingSimhash.NearPair] = {
    val s = docs.sparkSession
    import s.implicits._
    val fp = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"), col("eventTime"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, text, ts) =>
          val len = if (text == null) 0 else text.length
          (0 to 1).map { v =>
            val hash = graft.ops.MultimodalOps.dhashOf(id, len, v)
            (id * 2 + v, hash >>> 32, hash & 0xffffffffL, ts)
          }
        }
      }.toDF("docId", "fpHi", "fpLo", "eventTime")
    bucketed(fp, horizon)
  }

  /** Audio rows (doc_id % 3 == 1) hashed through the real WAV path. */
  def audioPairs(docs: DataFrame, horizon: String): Dataset[StreamingSimhash.NearPair] = {
    val s = docs.sparkSession
    import s.implicits._
    val fp = docs.where(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text"), col("eventTime"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        it.flatMap { case (id, text, ts) =>
          val len = if (text == null) 0 else text.length
          (0 to 1).map { v =>
            val hash = graft.ops.MultimodalOps.afpOf(id, len, v)
            (id * 2 + v, hash >>> 32, hash & 0xffffffffL, ts)
          }
        }
      }.toDF("docId", "fpHi", "fpLo", "eventTime")
    bucketed(fp, horizon)
  }

  /** Video rows (doc_id % 3 == 2, payload ≥ VfpMinLen) hashed through
    * the real MP4 container path. */
  def videoPairs(docs: DataFrame, horizon: String): Dataset[StreamingSimhash.NearPair] = {
    val s = docs.sparkSession
    import s.implicits._
    val fp = docs
      .where(col("doc_id") % 3 === 2 &&
        coalesce(length(col("text")), lit(0)) >= graft.ops.MultimodalOps.VfpMinLen)
      .select(col("doc_id"), col("text"), col("eventTime"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        it.flatMap { case (id, text, ts) =>
          (0 to 1).map { v =>
            val hash = graft.ops.MultimodalOps.vfpOf(id, text, v)
            (id * 2 + v, hash >>> 32, hash & 0xffffffffL, ts)
          }
        }
      }.toDF("docId", "fpHi", "fpLo", "eventTime")
    bucketed(fp, horizon)
  }
}
