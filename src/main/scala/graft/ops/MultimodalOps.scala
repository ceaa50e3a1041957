package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded partition-wise.
  *
  * The IMAGE and AUDIO paths are real end-to-end: the fixture stage
  * encodes an actual PNG per image row (javax.imageio) and an actual
  * 16-bit PCM WAV per audio row (javax.sound.sampled), with dimensions,
  * sample counts and channel layout derived deterministically from the
  * document — and the decode stage parses those bytes back through the
  * same JDK codecs, so the oracle's closed-form metadata only matches
  * if the decoder truly read the PNG header / WAV fmt chunk. For audio
  * the schema reuses (width, height) as (sample_rate, n_frames). Video
  * decode remains a clearly-labeled deterministic FAKE (the JDK ships
  * no mp4 codec and this environment has no native media libraries);
  * those rows still exercise the same binary-payload + typed-schema +
  * per-partition-decoder plumbing.
  *
  * Frame sampling is pure column algebra (codegen'd), no UDF.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** A media payload: binary content + declared type. */
  case class MediaBlob(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded metadata for one media blob. */
  case class MediaMeta(doc_id: Long, media_type: String,
      width: Int, height: Int, channels: Int)

  private def mediaType(id: Long): String = (id % 3) match {
    case 0 => "image"; case 1 => "audio"; case _ => "video"
  }

  /** Deterministic PNG dimensions/color type for an image row — the
    * closed form the oracle re-states and the decode must recover. */
  private def imgWidth(id: Long): Int = 4 + (id % 29).toInt
  private def imgHeight(textLen: Int): Int = 3 + textLen % 17
  private def imgHasAlpha(id: Long): Boolean = (id / 3) % 2 == 1

  /** Deterministic WAV shape for an audio row — the closed form the
    * oracle re-states and the decode must recover. */
  private val AudioSampleRate = 8000
  private def audioFrames(textLen: Int): Int = 50 + textLen % 100
  private def audioChannels(id: Long): Int = 1 + (id % 2).toInt

  /** Fixture stage: synthesize the binary payload. Image rows carry a
    * REAL PNG (encoded with the JDK's ImageIO), audio rows a REAL
    * 16-bit PCM WAV (encoded with the JDK's AudioSystem); video rows
    * carry raw text bytes standing in for a container we can't encode. */
  private def makeContent(id: Long, text: String): Array[Byte] = mediaType(id) match {
    case "image" =>
      val (w, h) = (imgWidth(id), imgHeight(text.length))
      val kind =
        if (imgHasAlpha(id)) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB
      val img = new java.awt.image.BufferedImage(w, h, kind)
      // deterministic pixel content so real bytes flow, not just a header
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((id * 2654435761L + x * 31 + y) & 0xffffff).toInt)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    case "audio" =>
      val (frames, channels) = (audioFrames(text.length), audioChannels(id))
      val fmt = new javax.sound.sampled.AudioFormat(
        AudioSampleRate.toFloat, 16, channels, true, false)
      // deterministic PCM so real sample bytes flow, not just a header
      val pcm = Array.tabulate(frames * channels * 2)(i =>
        ((id * 31 + i) & 0xff).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Binary payloads per document; type assigned round-robin. The
    * mapPartitions shape matches a real ingest: encoder state could be
    * hoisted per partition (ImageIO's writer lookup is cached JVM-wide). */
  private def blobs(s: SparkSession, d: String) = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        MediaBlob(id, mediaType(id), makeContent(id, text))
      })
  }

  /** Partition-wise decoder: one reusable PNG ImageReader per partition
    * (the init-once-stream-batches shape a JNI/FFmpeg decoder needs;
    * ImageIO's disk cache is disabled so decode stays in-memory). Image
    * rows are REALLY decoded — width/height/channels come off the parsed
    * PNG, not the fixture formula; audio rows are REALLY decoded —
    * sample rate, frame count and channels come off the parsed WAV fmt
    * chunk, reported as (width=sample_rate, height=n_frames). Video
    * metadata is the labeled FAKE formula. */
  private def decodePartition(it: Iterator[MediaBlob]): Iterator[MediaMeta] = {
    javax.imageio.ImageIO.setUseCache(false) // per-partition decoder init
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    val decoded = it.map { blob =>
      blob.media_type match {
        case "image" =>
          val in = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(blob.content))
          try {
            reader.setInput(in)
            val img = reader.read(0)
            MediaMeta(blob.doc_id, blob.media_type,
              img.getWidth, img.getHeight, img.getRaster.getNumBands)
          } finally { reader.setInput(null); in.close() }
        case "audio" =>
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(blob.content))
          MediaMeta(blob.doc_id, blob.media_type,
            aff.getFormat.getSampleRate.toInt, aff.getFrameLength,
            aff.getFormat.getChannels)
        case _ => // video FAKE: no JDK mp4 codec; deterministic stand-in
          val n = blob.content.length
          MediaMeta(blob.doc_id, blob.media_type, 64 + n % 512, 64 + (n * 7) % 512, 3)
      }
    }
    decoded
  }

  /** Decode metadata through the partition-wise decoder. */
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
    // image rows: the closed form the PNG round-trip must recover;
    // audio rows: the closed form the WAV round-trip must recover
    // (width=sample_rate, height=n_frames); video re-states the fake
    "mm_decode_meta" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 4 + doc_id % 29
                WHEN 1 THEN 8000
                ELSE 64 + octet_length(encode(text)) % 512 END AS INT) AS width,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 3 + length(text) % 17
                WHEN 1 THEN 50 + length(text) % 100
                ELSE 64 + (octet_length(encode(text)) * 7) % 512 END AS INT) AS height,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN CASE WHEN (doc_id // 3) % 2 = 1 THEN 4 ELSE 3 END
                WHEN 1 THEN 1 + doc_id % 2
                ELSE 3 END AS INT) AS channels
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
