package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded by a per-partition stub.
  *
  * The decode step is a clearly-marked deterministic FAKE (no image/audio
  * libraries in this environment) — but the Spark-side plumbing is real:
  * a typed `Dataset` with a binary payload column, `mapPartitions` with
  * per-partition decoder state (the shape a JNI/FFmpeg/opencv decoder
  * needs — init once per partition, stream record batches through), and
  * a deterministic output schema the rest of the pipeline joins on.
  * Frame sampling is pure column algebra (codegen'd), no UDF.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** A media payload: binary content + declared type. */
  case class MediaBlob(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded (stubbed) metadata for one media blob. */
  case class MediaMeta(doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, checksum: String)

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (real impl would parse the container header here). Shapes the
    * real concern: one decoder context per partition, streaming. */
  private def decodePartition(it: Iterator[MediaBlob]): Iterator[MediaMeta] = {
    val digest = java.security.MessageDigest.getInstance("MD5") // per-partition init
    it.map { blob =>
      digest.reset()
      val hex = digest.digest(blob.content).map("%02x".format(_)).mkString
      val n = blob.content.length
      MediaMeta(blob.doc_id, blob.media_type, n,
        64 + n % 512, 64 + (n * 7) % 512, hex)
    }
  }

  /** Binary payloads synthesized from document text (deterministic fake
    * "media files"); type assigned round-robin. */
  private def blobs(s: SparkSession, d: String) = {
    import s.implicits._
    documents(s, d).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"))
      .as[MediaBlob]
  }

  /** Decode metadata through the partition-wise stub decoder. */
  val decodeMeta: Q = (s, d) => {
    import s.implicits._
    blobs(s, d).mapPartitions(decodePartition).toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling for the (fake) video payloads: every 4th frame of
    * `byte_len div 100 + 1` frames, each tagged with a deterministic
    * frame fingerprint. Pure column expressions — whole-stage codegen,
    * no decoder round-trip for the sampling plan itself. */
  val frameSample: Q = (s, d) =>
    documents(s, d)
      .withColumn("byte_len", length(col("text").cast("binary")))
      .withColumn("n_frames", expr("byte_len div 100 + 1"))
      .select(col("doc_id"),
        explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_id"),
        col("text"))
      .select(col("doc_id"), col("frame_id").cast("int").as("frame_id"),
        md5(concat(col("text"), lit(":"), col("frame_id").cast("string"))).as("frame_hash"))
      .orderBy("doc_id", "frame_id")

  val queries: Map[String, Q] = Map(
    "mm_decode_meta" -> decodeMeta,
    "mm_frame_sample" -> frameSample,
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_meta" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
           md5(text) AS checksum
         FROM documents ORDER BY doc_id""",
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
                      unnest(generate_series(0, octet_length(encode(text)) // 100, 4)) AS frame_id
                    FROM documents)
         SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
           md5(text || ':' || CAST(frame_id AS VARCHAR)) AS frame_hash
         FROM f ORDER BY doc_id, frame_id""",
  )
}
