package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded partition-wise.
  *
  * ALL THREE media paths are real end-to-end: the fixture stage encodes
  * an actual PNG per image row (javax.imageio), an actual 16-bit PCM WAV
  * per audio row (javax.sound.sampled), and an actual ISO BMFF (MP4)
  * container per video row (ftyp + moov(mvhd + trak(tkhd + mdia(mdhd)))
  * + mdat — plain length-tagged boxes per the public ISO/IEC 14496-12
  * layout, written with ByteBuffer; container-level metadata needs no
  * codec). Dimensions, sample counts, channel layout and duration are
  * derived deterministically from the document — and the decode stage
  * parses those bytes back (JDK codecs for PNG/WAV, a recursive box-walk
  * for MP4), so the oracle's closed-form metadata only matches if the
  * decoder truly read the PNG header / WAV fmt chunk / tkhd+mdhd boxes.
  * Schema reuse: audio reports (width, height) as (sample_rate,
  * n_frames); video reports channels as duration_sec (from
  * mdhd.duration / mdhd.timescale).
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

  /** Deterministic MP4 display size / duration for a video row — the
    * closed form the oracle re-states and the box walk must recover. */
  private def vidWidth(id: Long): Int = 160 + (id % 8).toInt * 16
  private def vidHeight(textLen: Int): Int = 96 + (textLen % 6) * 16
  private def vidDurationSec(textLen: Int): Int = 1 + textLen % 30

  /** Minimal ISO BMFF (MP4) writer + box-walk reader. The container
    * format is plain length-tagged boxes (uint32 size + 4CC type, then
    * payload; container boxes nest child boxes as their payload) — so
    * track dimensions (tkhd, 16.16 fixed point) and duration
    * (mdhd.duration / mdhd.timescale) are readable from real bytes with
    * no codec. Public layout: ISO/IEC 14496-12 §8. */
  private[graft] object Mp4 {
    import java.nio.ByteBuffer

    private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(payload)
      bb.array()
    }

    /** ftyp + moov(mvhd + trak(tkhd + mdia(mdhd))) + mdat(data). */
    def write(width: Int, height: Int, durationSec: Int, data: Array[Byte]): Array[Byte] = {
      val timescale = 1000
      val dur = durationSec * timescale
      val ascii = java.nio.charset.StandardCharsets.US_ASCII

      val ftyp = box("ftyp", {
        val bb = ByteBuffer.allocate(16)
        bb.put("isom".getBytes(ascii)); bb.putInt(0)
        bb.put("isom".getBytes(ascii)); bb.put("mp41".getBytes(ascii))
        bb.array()
      })
      val mvhd = box("mvhd", {
        val bb = ByteBuffer.allocate(100)       // version-0 payload
        bb.putInt(0)                            // version + flags
        bb.putInt(0); bb.putInt(0)              // creation, modification
        bb.putInt(timescale); bb.putInt(dur)
        bb.putInt(0x00010000)                   // rate 1.0 (16.16)
        bb.putShort(0x0100.toShort)             // volume 1.0 (8.8)
        bb.position(bb.position() + 10)         // reserved
        putIdentityMatrix(bb)
        bb.position(bb.position() + 24)         // pre_defined
        bb.putInt(2)                            // next_track_ID
        bb.array()
      })
      val tkhd = box("tkhd", {
        val bb = ByteBuffer.allocate(84)        // version-0 payload
        bb.putInt(0x000007)                     // version 0, flags: enabled|in-movie|in-preview
        bb.putInt(0); bb.putInt(0)              // creation, modification
        bb.putInt(1)                            // track_ID
        bb.putInt(0)                            // reserved
        bb.putInt(dur)
        bb.position(bb.position() + 8)          // reserved
        bb.putShort(0); bb.putShort(0)          // layer, alternate_group
        bb.putShort(0)                          // volume (0 for video)
        bb.putShort(0)                          // reserved
        putIdentityMatrix(bb)
        bb.putInt(width << 16)                  // width  (16.16 fixed)
        bb.putInt(height << 16)                 // height (16.16 fixed)
        bb.array()
      })
      val mdhd = box("mdhd", {
        val bb = ByteBuffer.allocate(24)        // version-0 payload
        bb.putInt(0)                            // version + flags
        bb.putInt(0); bb.putInt(0)              // creation, modification
        bb.putInt(timescale); bb.putInt(dur)
        bb.putShort(0x55c4.toShort)             // language 'und' (packed ISO-639-2)
        bb.putShort(0)                          // pre_defined
        bb.array()
      })
      val trak = box("trak", tkhd ++ box("mdia", mdhd))
      val moov = box("moov", mvhd ++ trak)
      ftyp ++ moov ++ box("mdat", data)
    }

    private def putIdentityMatrix(bb: ByteBuffer): Unit = {
      // unity matrix: 0x00010000, 0, 0 / 0, 0x00010000, 0 / 0, 0, 0x40000000
      bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0)
      bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0)
      bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
    }

    /** Recursive-descent box walk: returns (width, height, durationSec)
      * from the first tkhd + mdhd found. Fails loudly on malformed
      * boxes rather than inventing metadata. */
    def parseMeta(bytes: Array[Byte]): (Int, Int, Int) = {
      val bb = ByteBuffer.wrap(bytes)
      var w = -1; var h = -1; var durSec = -1
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val size = bb.getInt(off)
          require(size >= 8 && off + size <= end,
            s"malformed MP4 box at offset $off: size=$size, container end=$end")
          val tpe = new String(bytes, off + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          val p = off + 8 // payload offset
          tpe match {
            case "moov" | "trak" | "mdia" => walk(p, off + size)
            case "tkhd" =>
              require((bb.getInt(p) >>> 24) == 0, "tkhd version != 0")
              w = bb.getInt(p + 76) >>> 16 // 16.16 fixed → integer part
              h = bb.getInt(p + 80) >>> 16
            case "mdhd" =>
              require((bb.getInt(p) >>> 24) == 0, "mdhd version != 0")
              val timescale = bb.getInt(p + 12)
              require(timescale > 0, "mdhd timescale must be positive")
              durSec = bb.getInt(p + 16) / timescale
            case _ => () // ftyp, mvhd, mdat, unknown: skip
          }
          off += size
        }
      }
      walk(0, bytes.length)
      require(w >= 0 && h >= 0 && durSec >= 0,
        "MP4 missing tkhd or mdhd box — not a parseable container")
      (w, h, durSec)
    }

    /** mdat payload extraction through the same top-level box walk
      * (mdat is a top-level box in this profile). Fails loudly on a
      * missing or malformed mdat rather than inventing content. */
    def payload(bytes: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.wrap(bytes)
      var off = 0
      while (off + 8 <= bytes.length) {
        val size = bb.getInt(off)
        require(size >= 8 && off + size <= bytes.length,
          s"malformed MP4 box at offset $off: size=$size")
        val tpe = new String(bytes, off + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        if (tpe == "mdat")
          return java.util.Arrays.copyOfRange(bytes, off + 8, off + size)
        off += size
      }
      throw new IllegalArgumentException("MP4 missing mdat box")
    }
  }

  /** PNG IHDR + JPEG SOF header reader — the Mp4 box-walk discipline
    * applied to images: at 100 TB you do NOT decode rasters to learn
    * dimensions; you read the first ~64 header bytes (PNG pins IHDR as
    * the first chunk; JPEG marker segments carry their own lengths, so
    * the frame header is reachable without entropy-coded data). This is
    * the bytes-level contrast to [[decodePartition]]'s ImageIO path,
    * which decodes the full raster — correct, and exactly what a
    * metadata pass must not pay. Fails loudly on malformed bytes
    * (bad signature, wrong first chunk, truncated segment, missing
    * frame header) rather than inventing metadata.
    *
    * Public layouts: PNG (RFC 2083 §3: 8-byte signature, then
    * length-tagged chunks, IHDR required first — width, height, bit
    * depth, color type); JPEG (ITU-T T.81 §B: SOI, then FF-marker
    * segments with 2-byte big-endian lengths; SOFn payload is
    * precision, height, width, component count). */
  private[graft] object ImageHeader {
    case class Meta(format: String, width: Int, height: Int, channels: Int)

    private def u16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    def parse(bytes: Array[Byte]): Meta = {
      require(bytes.length >= 2, s"image payload too short: ${bytes.length} bytes")
      val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
      if (b0 == 0x89 && b1 == 'P'.toInt) parsePng(bytes)
      else if (b0 == 0xff && b1 == 0xd8) parseJpeg(bytes)
      else throw new IllegalArgumentException(
        f"unrecognized image signature: first bytes $b0%02x $b1%02x")
    }

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def parsePng(b: Array[Byte]): Meta = {
      require(b.length >= 33, s"PNG shorter than signature+IHDR: ${b.length} bytes")
      require(b.slice(0, 8).sameElements(PngSig), "corrupt PNG signature")
      // the spec pins IHDR as the FIRST chunk — no walk needed
      require(u32(b, 8) == 13, s"first PNG chunk length ${u32(b, 8)} != 13 (IHDR)")
      val tpe = new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(tpe == "IHDR", s"first PNG chunk is '$tpe', not IHDR")
      val w = u32(b, 16); val h = u32(b, 20)
      require(w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue,
        s"PNG dimensions out of range: ${w}x$h")
      val colorType = b(25) & 0xff
      val channels = colorType match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case c => throw new IllegalArgumentException(s"invalid PNG color type $c")
      }
      Meta("png", w.toInt, h.toInt, channels)
    }

    private def parseJpeg(b: Array[Byte]): Meta = {
      // SOI already checked; walk marker segments to the frame header.
      // SOF markers are C0-CF minus C4 (DHT), C8 (JPG ext), CC (DAC).
      var off = 2
      while (off + 4 <= b.length) {
        require((b(off) & 0xff) == 0xff, f"expected JPEG marker at $off, got ${b(off) & 0xff}%02x")
        var m = b(off + 1) & 0xff
        while (m == 0xff && off + 2 < b.length) { off += 1; m = b(off + 1) & 0xff } // fill bytes
        require(m != 0xd9 && m != 0xda,
          s"JPEG reached ${if (m == 0xd9) "EOI" else "scan data"} before any frame header")
        if (m >= 0xd0 && m <= 0xd7) { off += 2 } // RSTn: standalone, no length
        else {
          val len = u16(b, off + 2)
          require(len >= 2 && off + 2 + len <= b.length,
            s"truncated JPEG segment ${f"$m%02x"} at $off: len=$len of ${b.length}")
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            require(len >= 8, s"JPEG frame header too short: $len")
            val h = u16(b, off + 5); val w = u16(b, off + 7)
            val nComp = b(off + 9) & 0xff
            require(w > 0 && h > 0 && nComp > 0, s"JPEG frame header out of range: ${w}x$h/$nComp")
            return Meta("jpeg", w, h, nComp)
          }
          off += 2 + len
        }
      }
      throw new IllegalArgumentException("JPEG ended before any frame header")
    }
  }

  /** WAV RIFF/fmt chunk reader — the header-walk discipline on the
    * audio container: sample rate, channel count, sample width and
    * frame count all live in the first ~50 bytes (RIFF magic, then
    * length-tagged chunks; `fmt ` carries the format fields, `data`'s
    * size over the frame stride is the frame count) — no sample decode.
    * RIFF is LITTLE-endian throughout, the opposite of PNG/MP4 — a pin
    * that the walkers read real layouts, not a shared helper's
    * assumption. Fails loudly on malformed bytes. Public layout:
    * RIFF/WAVE (IBM/Microsoft, 1991), chunk walk per the EA-IFF85
    * convention (odd-sized chunks pad one byte). */
  private[graft] object WavHeader {
    case class Meta(sampleRate: Int, channels: Int, bitsPerSample: Int,
        nFrames: Long)

    private def u16le(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def u32le(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def parse(b: Array[Byte]): Meta = {
      require(b.length >= 12, s"WAV payload too short: ${b.length} bytes")
      require(fourcc(b, 0) == "RIFF", s"not a RIFF container: '${fourcc(b, 0)}'")
      require(fourcc(b, 8) == "WAVE", s"RIFF form is '${fourcc(b, 8)}', not WAVE")
      var off = 12
      var rate = -1; var ch = -1; var bits = -1; var blockAlign = -1
      var frames = -1L
      while (off + 8 <= b.length) {
        val id = fourcc(b, off)
        val size = u32le(b, off + 4)
        require(size >= 0 && off + 8 + size <= b.length,
          s"truncated WAV chunk '$id' at $off: size=$size of ${b.length}")
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too short: $size")
            val fmtTag = u16le(b, off + 8)
            require(fmtTag == 1, s"not PCM (fmt tag $fmtTag)")
            ch = u16le(b, off + 10)
            rate = u32le(b, off + 12).toInt
            blockAlign = u16le(b, off + 20)
            bits = u16le(b, off + 22)
            require(ch > 0 && rate > 0 && blockAlign > 0 && bits > 0,
              s"fmt fields out of range: ch=$ch rate=$rate align=$blockAlign bits=$bits")
          case "data" =>
            require(blockAlign > 0, "data chunk before fmt — frame stride unknown")
            frames = size / blockAlign
          case _ => () // fact, LIST, ...: skip by the size tag
        }
        off += 8 + size.toInt + (size.toInt & 1) // odd chunks pad a byte
      }
      require(rate > 0 && frames >= 0,
        "WAV missing fmt or data chunk — not a parseable container")
      Meta(rate, ch, bits, frames)
    }
  }

  /** Decoded header metadata for one audio blob. */
  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_frames: Long)

  /** Header-level audio metadata over the audio-typed rows — the
    * [[imageMeta]] pass for WAV: real AudioSystem bytes, metadata
    * recovered from the chunk walk alone. */
  val audioMeta: Q = (s, d) => {
    import s.implicits._
    documents(s, d).where(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val m = WavHeader.parse(makeContent(id, if (text == null) "" else text))
        AudioMeta(id, m.sampleRate, m.channels, m.bitsPerSample, m.nFrames)
      }).toDF()
      .orderBy("doc_id")
  }

  /** Decoded header metadata for one image blob. */
  case class ImageMeta(doc_id: Long, fmt: String, width: Int, height: Int, channels: Int)

  /** Image fixture for [[imageMeta]]: the alpha rows encode as REAL
    * PNGs (alpha needs it), the rest as REAL baseline JPEGs — both via
    * JDK ImageIO, so the parsed bytes are a production encoder's, not
    * this file's. */
  private def makeImageBytes(id: Long, text: String): Array[Byte] = {
    val (w, h) = (imgWidth(id), imgHeight(text.length))
    val kind =
      if (imgHasAlpha(id)) java.awt.image.BufferedImage.TYPE_INT_ARGB
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, kind)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((id * 2654435761L + x * 31 + y) & 0xffffff).toInt)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (imgHasAlpha(id)) "png" else "jpg", baos)
    baos.toByteArray
  }

  /** Header-level image metadata over the image-typed rows: synthesize
    * real PNG/JPEG bytes, then recover format, dimensions and channel
    * count from the FIRST BYTES ALONE ([[ImageHeader]] — no raster
    * decode, the pass a 100 TB metadata sweep actually affords). The
    * oracle re-states the closed-form fixture metadata, so it only
    * matches if the header walk truly read the IHDR chunk / SOFn
    * segment. */
  val imageMeta: Q = (s, d) => {
    import s.implicits._
    documents(s, d).where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = makeImageBytes(id, if (text == null) "" else text)
        val m = ImageHeader.parse(bytes)
        ImageMeta(id, m.format, m.width, m.height, m.channels)
      }).toDF()
      .orderBy("doc_id")
  }

  /** javax.sound WAV codec, resolved ONCE per executor JVM and held by
    * strong reference. `AudioSystem`'s front door funnels EVERY call
    * through a JVM-global `synchronized` provider lookup whose cache is
    * a SoftReference (JDK13Services) — under Spark's allocation
    * pressure the soft cache empties and all task threads serialize on
    * repeated classpath scans: the sf1 fingerprint pass measured 18.0 s
    * at local[32] vs 5.5 s at local[1] (negative scaling — more threads,
    * slower). The SPI instances below are the SAME stateless singletons
    * AudioSystem dispatches to concurrently, so direct calls keep the
    * real-codec claim; only the global lock leaves the row loop. The
    * ImageIO analogue (reader hoisted per partition) already lives in
    * [[decodePartition]]. */
  private[graft] lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter in this JVM"))
  }

  private[graft] lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    // pick the provider that actually parses a WAV this JVM's writer
    // produced (provider order is unspecified; the wrong one throws
    // UnsupportedAudioFileException, exactly how AudioSystem probes)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val probeOut = new java.io.ByteArrayOutputStream()
    wavWriter.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](2)), fmt, 1L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, probeOut)
    val probe = probeOut.toByteArray
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala
      .find { r =>
        try { r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe)); true }
        catch { case _: Exception => false }
      }
      .getOrElse(throw new IllegalStateException("no WAV AudioFileReader in this JVM"))
  }

  /** Fixture stage: synthesize the binary payload. Image rows carry a
    * REAL PNG (encoded with the JDK's ImageIO), audio rows a REAL
    * 16-bit PCM WAV (encoded with the JDK's WAV codec), video rows a
    * REAL MP4 container (ftyp/moov/tkhd/mdhd boxes + the text bytes as
    * mdat payload, written by the Mp4 writer above). */
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
      wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    case _ =>
      Mp4.write(vidWidth(id), vidHeight(text.length), vidDurationSec(text.length),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Binary payloads per document; type assigned round-robin. The
    * mapPartitions shape matches a real ingest: encoder state could be
    * hoisted per partition (ImageIO's writer lookup is cached JVM-wide). */
  private def blobs(s: SparkSession, d: String) =
    blobsOf(s, documents(s, d))

  private def blobsOf(s: SparkSession, docs: org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // a null-text doc still owns a media slot: synthesize the
        // zero-payload container instead of NPE-ing the whole stage
        MediaBlob(id, mediaType(id), makeContent(id, if (text == null) "" else text))
      })
  }

  /** Partition-wise decoder: one reusable PNG ImageReader per partition
    * (the init-once-stream-batches shape a JNI/FFmpeg decoder needs;
    * ImageIO's disk cache is disabled so decode stays in-memory). Image
    * rows are REALLY decoded — width/height/channels come off the parsed
    * PNG, not the fixture formula; audio rows are REALLY decoded —
    * sample rate, frame count and channels come off the parsed WAV fmt
    * chunk, reported as (width=sample_rate, height=n_frames); video rows
    * are REALLY decoded — display size and duration come off the parsed
    * tkhd/mdhd boxes, reported as (width, height, channels=duration_sec). */
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
          val aff = wavReader.getAudioFileFormat(
            new java.io.ByteArrayInputStream(blob.content))
          MediaMeta(blob.doc_id, blob.media_type,
            aff.getFormat.getSampleRate.toInt, aff.getFrameLength,
            aff.getFormat.getChannels)
        case _ => // video: real ISO BMFF box walk (tkhd dims + mdhd duration)
          val (w, h, durSec) = Mp4.parseMeta(blob.content)
          MediaMeta(blob.doc_id, blob.media_type, w, h, durSec)
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

  /** Frame sampling over the video payloads, driven by REAL container
    * metadata: the frame budget is the mdhd duration the box walk
    * recovered (at the fixture's 1 fps), NOT a formula over raw bytes —
    * so a wrong parse produces wrong frame ids and the oracle catches
    * it. Every 4th frame is kept and tagged with a deterministic
    * fingerprint. One decode pass (the same partition-wise decoder as
    * [[decodeMeta]]); everything after it is pure column algebra in
    * whole-stage codegen. */
  val frameSample: Q = (s, d) => {
    import s.implicits._
    // media type is a pure doc_id formula, so restrict to video rows
    // BEFORE synthesis/decode — encoding and decoding the PNG/WAV blobs
    // of the other two thirds just to filter them out is wasted work
    blobsOf(s, documents(s, d).where(col("doc_id") % 3 === 2))
      .mapPartitions(decodePartition).toDF()
      .withColumn("n_frames", col("channels")) // duration_sec × 1 fps
      .select(col("doc_id"),
        explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_id"))
      .select(col("doc_id"), col("frame_id").cast("int").as("frame_id"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_id").cast("string"))).as("frame_hash"))
      .orderBy("doc_id", "frame_id")
  }

  // -------------------------------------------------------------------
  // Perceptual image near-dup — the visual analogue of dedup_simhash a
  // multimodal corpus needs: a 64-bit-class perceptual hash per image
  // (dHash: luma gradient signs over a downsampled grid — Krawetz's
  // difference hash, public method), then the SAME pigeonhole block
  // join the text-simhash family uses. The hash is brightness-shift
  // invariant by construction (a uniform luma shift preserves every
  // adjacent-cell comparison), which is exactly the perturbation the
  // fixture plants: every image doc gets a +8-per-channel re-encode
  // twin, and the pair row must find the twins WITHOUT all-pairs work.
  //
  // 100 TB shape: the decode+hash pass is embarrassingly parallel
  // (mapPartitions over the blobs, one reusable decoder per partition,
  // 8 bytes of hash out per image — the only thing that ever shuffles);
  // pairing reuses DedupOps.blockedPairsFrom, so candidate work is
  // Σ bucket², never |images|², and every emitted pair is exact-checked
  // with codegen'd bit_count(xor). Oracle parity is the mm-family
  // discipline: the raster is a closed integer formula both engines
  // restate, the PNG codec is lossless, and the Spark side derives the
  // hash from the REAL encoder's bytes (encode -> decode -> sample) —
  // so the compare only passes if the decode truly read the raster.
  // -------------------------------------------------------------------

  /** Per-channel raster formula constants: value =
    * (a·ar + x·(bx + (a % mx)·cx) + y·(by + (a % my)·cy)) % 256, with
    * `a` the per-image mixer. Id-dependent SLOPES (not just offsets)
    * decorrelate gradient signs across images — with fixed slopes every
    * image would share one gradient pattern and the pair row would
    * degenerate toward all-pairs. One Scala table, both engines. */
  private[graft] final case class DhashChan(
      ar: Int, bx: Int, mx: Int, cx: Int, by: Int, my: Int, cy: Int)
  private[graft] val DhashChans = Seq(
    DhashChan(1, 17, 13, 16, 11, 11, 8),   // R
    DhashChan(3, 19, 17, 12, 13, 7, 20),   // G
    DhashChan(7, 23, 19, 8, 29, 5, 24))    // B
  private def dhashMixer(id: Long): Long = (id * 2654435761L) % 1000003L
  private def chanVal(ch: DhashChan, a: Long, x: Int, y: Int): Int =
    ((a * ch.ar + x * (ch.bx + (a % ch.mx) * ch.cx) +
      y * (ch.by + (a % ch.my) * ch.cy)) % 256).toInt

  /** Normalized-thumbnail dimensions for the dedup fixture (near-dup
    * hashing runs post-transcode on a normalized raster, so unlike the
    * [[imageMeta]] fixture every row here is a lossless PNG — JPEG's
    * decoded raster is encoder-defined and could not be oracle-pinned). */
  private def dupImgW(id: Long): Int = 16 + (id % 17).toInt
  private def dupImgH(len: Int): Int = 16 + len % 13
  /** dHash grid: 9 columns × 7 rows → 8 comparisons/row × 7 = 56 bits,
    * comfortably inside a positive signed long in BOTH engines (bit 63
    * would turn the hash negative in one engine's shift and error in
    * the other's). Nearest-neighbor sampling (xs = cx·w/9, ys = cy·h/7,
    * floor) — a deterministic resize kernel both engines restate. */
  private[graft] val DhashCols = 9
  private[graft] val DhashRows = 7
  /** Brightness perturbation of the planted twin: +8 per channel,
    * clamped at 255. Unclamped, luma shifts EXACTLY +8 (integer div:
    * (n + 8·1000) / 1000 = n/1000 + 8) and the hash is unchanged;
    * clamped pixels flip only near-tie comparisons, so twins land at
    * hamming ~0-3. */
  private[graft] val DhashShift = 8
  private[graft] val DhashMaxHamming = 4
  /** Pigeonhole split for the pair join: 6 blocks, singleton combos —
    * lossless at hamming ≤ 4 (a ≤4-bit difference leaves ≥2 of 6 blocks
    * untouched; comboSize 1 ≤ 6 − 4). */
  private[graft] val DhashBlocks = 6

  /** One image dHash through the REAL codec path: formula raster →
    * ImageIO PNG encode → ImageIO decode → sampled luma grid →
    * gradient-sign hash. Shared by the batch fingerprint frame and the
    * streaming ingest form ([[graft.streaming.StreamingMediaDedup]]) so
    * the two can never hash the same document differently. */
  private[graft] def dhashOf(id: Long, textLen: Int, v: Int): Long = {
    val (w, h) = (dupImgW(id), dupImgH(textLen))
    val a = dhashMixer(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (x <- 0 until w; y <- 0 until h) {
      val Seq(r, g, b) = DhashChans.map { ch =>
        val c0 = chanVal(ch, a, x, y)
        if (v == 1) math.min(255, c0 + DhashShift) else c0
      }
      img.setRGB(x, y, 0xff000000 | (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    // --- real bytes boundary: everything below reads the decoded
    // raster, nothing reads the formula ---
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    def luma(cx: Int, cy: Int): Int = {
      val px = dec.getRGB(cx * w / DhashCols, cy * h / DhashRows)
      val (r, g, b) = ((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
      (299 * r + 587 * g + 114 * b) / 1000
    }
    var hash = 0L
    for (cy <- 0 until DhashRows; cx <- 0 until DhashCols - 1)
      if (luma(cx + 1, cy) > luma(cx, cy))
        hash |= 1L << (cy * (DhashCols - 1) + cx)
    hash
  }

  /** The (vid, src_doc, variant, fp_hi, fp_lo, dhash) fingerprint frame:
    * vid = doc_id·2 + variant keys original and twin in one id space. */
  private def imageDhashFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, text) =>
          val len = if (text == null) 0 else text.length
          (0 to 1).map { v =>
            val hash = dhashOf(id, len, v)
            (id * 2 + v, id, v, hash >>> 32, hash & 0xffffffffL, hash)
          }
        }
      }.toDF("doc_id", "src_doc", "variant", "fp_hi", "fp_lo", "dhash")
  }

  /** Per-image perceptual hash row — the registry-visible form of the
    * fingerprint frame ([[imageDhashFrame]]). */
  val imageDhash: Q = (s, d) =>
    imageDhashFrame(s, d)
      .select(col("doc_id").as("vid"), col("src_doc"),
        col("variant").cast("int").as("variant"), col("dhash"))
      .orderBy("vid")

  /** Near-dup image pairs at hamming ≤ [[DhashMaxHamming]] via the
    * [[DedupOps.blockedPairsFrom]] pigeonhole join ([[DhashBlocks]]
    * blocks, singleton combos — lossless at the threshold). The planted
    * +8-brightness twins are what it must find; ids are vids. */
  val imageNeardupPairs: Q = (s, d) =>
    DedupOps.blockedPairsFrom(
        imageDhashFrame(s, d).select("doc_id", "fp_hi", "fp_lo"),
        DhashBlocks, 1, DhashMaxHamming)
      .orderBy("doc_a", "doc_b")

  /** Measured-recall audit (the family convention): the blocked pair
    * set vs BRUTE-FORCE all-pairs truth at the same threshold. The
    * pigeonhole argument says recall is exactly 1.0; this measures it,
    * so a block-split regression fails here the round it lands, not in
    * a comment. Brute cost is |vids|² ~ millions of bit_counts at
    * verify scale — affordable as an AUDIT; the operator itself never
    * pays it. */
  val imageNeardupEval: Q = (s, d) => {
    val fp = imageDhashFrame(s, d).select("doc_id", "fp_hi", "fp_lo")
      .localCheckpoint()
    val truth = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.fp_hi").bitwiseXOR(col("b.fp_hi"))) +
          bit_count(col("a.fp_lo").bitwiseXOR(col("b.fp_lo"))))
          .cast("long").as("hamming"))
      .where(col("hamming") <= DhashMaxHamming)
    val blocked = DedupOps.blockedPairsFrom(fp, DhashBlocks, 1, DhashMaxHamming)
    val nT = truth.agg(count(lit(1)).as("n_truth"))
    val nB = blocked.agg(count(lit(1)).as("n_blocked"))
    val nBoth = truth.join(blocked, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    nT.crossJoin(nB).crossJoin(nBoth)
      .select(col("n_truth"), col("n_blocked"), col("n_both"),
        when(col("n_blocked") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_both").cast("double") / col("n_blocked"), 6))
          .as("precision_r"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_both").cast("double") / col("n_truth"), 6))
          .as("recall_r"))
  }

  // -------------------------------------------------------------------
  // Perceptual AUDIO near-dup — the acoustic analogue of the image
  // dHash family: a 56-bit energy-envelope gradient hash per audio
  // row (sign of adjacent frame-energy differences over 57 windows —
  // the time-domain skeleton of an acoustic fingerprint; volume
  // changes scale every window energy by the same factor, so the hash
  // is GAIN-invariant by construction, which is exactly the
  // perturbation the fixture plants: a 2× louder re-master twin whose
  // loudest samples clamp). Same deployment shape as images: 8 bytes
  // of hash per row is all that shuffles, pairing reuses the
  // pigeonhole block join, the eval row measures blocked-vs-brute.
  // The codec path is REAL: formula PCM → javax.sound WAV encode →
  // WAV decode → samples → energies — the oracle restates the closed
  // integer formula, so the compare only passes if the container
  // round-trip truly preserved the samples.
  // -------------------------------------------------------------------

  /** Dedup fixture PCM (normalized mono, the image-family's
    * post-transcode argument): sample k of row id is
    * (m·(m%4093)) % 34000 − 17000 with m = (a + k·2654435761) % 999983
    * and `a` the per-row mixer — a quadratic integer avalanche, every
    * product bounded far inside a signed long (linear ramp fixtures
    * failed twice at 10x density: fixed-slope sawtooths collide up to
    * phase, and even id-dependent slopes leave window MEANS
    * concentrated so the 56-bit space had far too little entropy;
    * pseudo-random samples make adjacent-window comparisons
    * independent coin flips and cross-row collisions at hamming ≤ 4
    * vanish by counting), amplitude ±17000 so
    * the 2× twin clamps ~3.6% of samples (the near-tie flips that give
    * the pair row its hamming spread, the brightness-clamp analogue).
    * All integer, positive-operand mod — identical in both engines. */
  private def audioSample(a: Long, k: Int): Int =
    {
    val m = (a + k * 2654435761L) % 999983L
    (((m * (m % 4093L)) % 34000L) - 17000L).toInt
  }
  private[graft] val AfpWindows = 57  // 56 adjacent comparisons = 56 bits
  private[graft] val AfpGain = 2      // the planted re-master's gain
  private def afpSamples(id: Long, len: Int): Int = 570 + len % 100

  /** The (vid, src_doc, variant, fp_hi, fp_lo, afp) fingerprint frame
    * over audio-typed rows (doc_id % 3 == 1): vid = doc_id·2 + variant.
    * REAL codec path per row: PCM from the formula, WAV-encoded with
    * javax.sound, DECODED back through AudioSystem, THEN windowed. */
  /** One acoustic fingerprint through the REAL codec path — shared by
    * the batch frame and the streaming ingest form, like [[dhashOf]]. */
  private[graft] def afpOf(id: Long, textLen: Int, v: Int): Long = {
    val n = afpSamples(id, textLen)
    val a = dhashMixer(id)
    val pcm = new Array[Byte](n * 2)
    for (k <- 0 until n) {
      val s0 = audioSample(a, k)
      val sv =
        if (v == 1) math.max(-32768, math.min(32767, s0 * AfpGain))
        else s0
      pcm(2 * k) = (sv & 0xff).toByte
      pcm(2 * k + 1) = ((sv >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    // --- real bytes boundary: decode the WAV back and window the
    // DECODED samples, nothing below reads the formula ---
    val dec = wavReader.getAudioInputStream(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    val raw = dec.readAllBytes()
    val energies = new Array[Long](AfpWindows)
    val counts = new Array[Long](AfpWindows)
    for (k <- 0 until raw.length / 2) {
      val sample = ((raw(2 * k) & 0xff) | (raw(2 * k + 1) << 8)).toShort.toInt
      val w = (k * AfpWindows) / n
      energies(w) += math.abs(sample); counts(w) += 1
    }
    // MEAN-energy comparison via integer cross-multiplication: window
    // sample counts alternate 10/11-12 under the floor boundaries, and
    // a raw-sum comparison is then dominated by the size pattern (a
    // pure function of n — rows sharing n collided wholesale at 10x
    // density before this)
    var hash = 0L
    for (f <- 0 until AfpWindows - 1)
      if (energies(f + 1) * counts(f) > energies(f) * counts(f + 1))
        hash |= 1L << f
    hash
  }

  /** The (vid, src_doc, variant, fp_hi, fp_lo, afp) fingerprint frame
    * over audio-typed rows (doc_id % 3 == 1): vid = doc_id·2 + variant,
    * the real codec path per row via [[afpOf]]. */
  private def audioFpFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).where(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val len = if (text == null) 0 else text.length
          (0 to 1).map { v =>
            val hash = afpOf(id, len, v)
            (id * 2 + v, id, v, hash >>> 32, hash & 0xffffffffL, hash)
          }
        }
      }.toDF("doc_id", "src_doc", "variant", "fp_hi", "fp_lo", "afp")
  }
  val audioFingerprint: Q = (s, d) =>
    audioFpFrame(s, d)
      .select(col("doc_id").as("vid"), col("src_doc"),
        col("variant").cast("int").as("variant"), col("afp"))
      .orderBy("vid")

  /** Near-dup audio pairs at hamming ≤ [[DhashMaxHamming]] — the same
    * lossless pigeonhole join as the image family. */
  val audioNeardupPairs: Q = (s, d) =>
    DedupOps.blockedPairsFrom(
        audioFpFrame(s, d).select("doc_id", "fp_hi", "fp_lo"),
        DhashBlocks, 1, DhashMaxHamming)
      .orderBy("doc_a", "doc_b")

  /** Blocked-vs-brute recall audit for the audio family (the
    * measured-audit convention, identical contract to
    * [[imageNeardupEval]]). */
  val audioNeardupEval: Q = (s, d) => {
    val fp = audioFpFrame(s, d).select("doc_id", "fp_hi", "fp_lo")
      .localCheckpoint()
    val truth = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.fp_hi").bitwiseXOR(col("b.fp_hi"))) +
          bit_count(col("a.fp_lo").bitwiseXOR(col("b.fp_lo"))))
          .cast("long").as("hamming"))
      .where(col("hamming") <= DhashMaxHamming)
    val blocked = DedupOps.blockedPairsFrom(fp, DhashBlocks, 1, DhashMaxHamming)
    val nT = truth.agg(count(lit(1)).as("n_truth"))
    val nB = blocked.agg(count(lit(1)).as("n_blocked"))
    val nBoth = truth.join(blocked, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    nT.crossJoin(nB).crossJoin(nBoth)
      .select(col("n_truth"), col("n_blocked"), col("n_both"),
        when(col("n_blocked") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_both").cast("double") / col("n_blocked"), 6))
          .as("precision_r"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_both").cast("double") / col("n_truth"), 6))
          .as("recall_r"))
  }

  // -------------------------------------------------------------------
  // Perceptual VIDEO near-dup — completes the modality triad. The
  // temporal analogue of the image/audio hashes: a 56-bit gradient hash
  // over 57 payload windows of the REAL container's mdat track — the
  // fingerprint a remux cannot move, because remuxing rewrites BOXES,
  // not the stream. The planted twin is that real-world class: v1
  // re-wraps the payload at 2× display size (tkhd metadata — a
  // display-resize remux) with the stream LSB-requantized (b & 0xFE,
  // one generation of quantization loss) — window means shift ~−0.5
  // with per-window noise, flipping only near-tie gradient bits:
  // measured hamming 0/1/2 = 109/26/5 twins at sf0.001, zero cross-doc
  // pairs at the ≤4 threshold. (A trailing-trim draft instead SHIFTED
  // every window boundary — windows are only len/57 ≈ 2-10 bytes, so a
  // ≤6-byte cut re-windowed the whole stream and only the len%7 == 0
  // twins survived: 22 of 140. Length perturbations are the wrong twin
  // for a relative-position window scheme.)
  // Codec path is REAL: write the container, WALK the boxes back
  // (parse validates tkhd dims loudly), extract mdat through the box
  // walk — nothing below the boundary reads `text`. The oracle
  // restates the payload arithmetic from the document bytes (the
  // corpus is ASCII — verified at every SF — so char codes ARE the
  // payload bytes), agreeing only if the container round-trip
  // preserved the stream byte-for-byte.
  // -------------------------------------------------------------------

  /** Minimum payload for a meaningful 57-window envelope (≥2 bytes per
    * window); shorter video rows are not fingerprinted — a real system
    * doesn't near-dup empty streams. */
  private[graft] val VfpMinLen = 128

  /** One temporal fingerprint through the REAL container path — shared
    * by the batch frame and the streaming ingest form, like
    * [[dhashOf]]/[[afpOf]]. */
  private[graft] def vfpOf(id: Long, text: String, v: Int): Long = {
    val full = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val scale = v + 1
    val data =
      if (v == 1) full.map(b => (b & 0xFE).toByte)
      else full
    val bytes = Mp4.write(vidWidth(id) * scale,
      vidHeight(text.length) * scale, vidDurationSec(text.length), data)
    // --- real bytes boundary: walk the container we just wrote;
    // everything below reads the PARSED payload ---
    val (pw, ph, _) = Mp4.parseMeta(bytes)
    require(pw == vidWidth(id) * scale && ph == vidHeight(text.length) * scale,
      s"box walk returned wrong dims for doc $id variant $v")
    val mdat = Mp4.payload(bytes)
    val n = mdat.length
    val energies = new Array[Long](AfpWindows)
    val counts = new Array[Long](AfpWindows)
    for (k <- 0 until n) {
      val w = (k * AfpWindows) / n
      energies(w) += (mdat(k) & 0xff); counts(w) += 1
    }
    var hash = 0L
    for (f <- 0 until AfpWindows - 1)
      if (energies(f + 1) * counts(f) > energies(f) * counts(f + 1))
        hash |= 1L << f
    hash
  }

  /** The (vid, src_doc, variant, fp_hi, fp_lo, vfp) fingerprint frame
    * over video-typed rows (doc_id % 3 == 2): vid = doc_id·2 + variant. */
  private def videoFpFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .where(col("doc_id") % 3 === 2 &&
        coalesce(length(col("text")), lit(0)) >= VfpMinLen)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          (0 to 1).map { v =>
            val hash = vfpOf(id, text, v)
            (id * 2 + v, id, v, hash >>> 32, hash & 0xffffffffL, hash)
          }
        }
      }.toDF("doc_id", "src_doc", "variant", "fp_hi", "fp_lo", "vfp")
  }

  /** Per-row temporal fingerprint — the registry-visible form. */
  val videoFingerprint: Q = (s, d) =>
    videoFpFrame(s, d)
      .select(col("doc_id").as("vid"), col("src_doc"),
        col("variant").cast("int").as("variant"), col("vfp"))
      .orderBy("vid")

  /** Near-dup video pairs at hamming ≤ [[DhashMaxHamming]] — the same
    * lossless pigeonhole join as the image and audio families. */
  val videoNeardupPairs: Q = (s, d) =>
    DedupOps.blockedPairsFrom(
        videoFpFrame(s, d).select("doc_id", "fp_hi", "fp_lo"),
        DhashBlocks, 1, DhashMaxHamming)
      .orderBy("doc_a", "doc_b")

  /** Blocked-vs-brute recall audit (the measured-audit convention,
    * identical contract to the image/audio evals). */
  val videoNeardupEval: Q = (s, d) => {
    val fp = videoFpFrame(s, d).select("doc_id", "fp_hi", "fp_lo")
      .localCheckpoint()
    val truth = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.fp_hi").bitwiseXOR(col("b.fp_hi"))) +
          bit_count(col("a.fp_lo").bitwiseXOR(col("b.fp_lo"))))
          .cast("long").as("hamming"))
      .where(col("hamming") <= DhashMaxHamming)
    val blocked = DedupOps.blockedPairsFrom(fp, DhashBlocks, 1, DhashMaxHamming)
    val nT = truth.agg(count(lit(1)).as("n_truth"))
    val nB = blocked.agg(count(lit(1)).as("n_blocked"))
    val nBoth = truth.join(blocked, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    nT.crossJoin(nB).crossJoin(nBoth)
      .select(col("n_truth"), col("n_blocked"), col("n_both"),
        when(col("n_blocked") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_both").cast("double") / col("n_blocked"), 6))
          .as("precision_r"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_both").cast("double") / col("n_truth"), 6))
          .as("recall_r"))
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_meta" -> decodeMeta,
    "mm_frame_sample" -> frameSample,
    "mm_image_meta" -> imageMeta,
    "mm_audio_meta" -> audioMeta,
    "mm_image_dhash" -> imageDhash,
    "mm_image_neardup_pairs" -> imageNeardupPairs,
    "mm_image_neardup_eval" -> imageNeardupEval,
    "mm_audio_fingerprint" -> audioFingerprint,
    "mm_audio_neardup_pairs" -> audioNeardupPairs,
    "mm_audio_neardup_eval" -> audioNeardupEval,
    "mm_video_fingerprint" -> videoFingerprint,
    "mm_video_neardup_pairs" -> videoNeardupPairs,
    "mm_video_neardup_eval" -> videoNeardupEval,
  )

  val oracles: Map[String, String] = Map(
    // image rows: the closed form the PNG round-trip must recover;
    // audio rows: the closed form the WAV round-trip must recover
    // (width=sample_rate, height=n_frames); video rows: the closed form
    // the MP4 box walk must recover (channels=duration_sec)
    "mm_decode_meta" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 4 + doc_id % 29
                WHEN 1 THEN 8000
                ELSE 160 + (doc_id % 8) * 16 END AS INT) AS width,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 3 + length(text) % 17
                WHEN 1 THEN 50 + length(text) % 100
                ELSE 96 + (length(text) % 6) * 16 END AS INT) AS height,
           CAST(CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN CASE WHEN (doc_id // 3) % 2 = 1 THEN 4 ELSE 3 END
                WHEN 1 THEN 1 + doc_id % 2
                ELSE 1 + length(text) % 30 END AS INT) AS channels
         FROM documents ORDER BY doc_id""",
    // video rows only; the frame budget is the closed-form duration the
    // real mdhd parse must recover (1 fps)
    "mm_frame_sample" ->
      """WITH v AS (SELECT doc_id, 1 + length(text) % 30 AS n_frames
                    FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
          f AS (SELECT doc_id,
                  unnest(generate_series(0, n_frames - 1, 4)) AS frame_id
                FROM v)
         SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_id AS VARCHAR)) AS frame_hash
         FROM f ORDER BY doc_id, frame_id""",
    // image rows only; fmt/channels follow the alpha formula (alpha
    // forces PNG; the rest are baseline JPEG), dimensions the fixture
    // formulas — recoverable only by truly reading IHDR / SOFn bytes
    "mm_image_meta" ->
      """SELECT doc_id,
           CASE WHEN (doc_id // 3) % 2 = 1 THEN 'png' ELSE 'jpeg' END AS fmt,
           CAST(4 + doc_id % 29 AS INT) AS width,
           CAST(3 + length(text) % 17 AS INT) AS height,
           CAST(CASE WHEN (doc_id // 3) % 2 = 1 THEN 4 ELSE 3 END AS INT) AS channels
         FROM documents WHERE CAST(doc_id % 3 AS INT) = 0 ORDER BY doc_id""",
    // audio rows only; the closed form the RIFF chunk walk must recover
    "mm_audio_meta" ->
      """SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(16 AS INT) AS bits_per_sample,
           CAST(50 + length(text) % 100 AS BIGINT) AS n_frames
         FROM documents WHERE CAST(doc_id % 3 AS INT) = 1 ORDER BY doc_id""",
    "mm_image_dhash" ->
      s"""WITH $DhashChainSql
          SELECT vid, src_doc, CAST(v AS INT) AS variant, dhash
          FROM hashes JOIN vids USING (vid) ORDER BY vid""",
    "mm_image_neardup_pairs" ->
      s"""WITH $DhashChainSql, $DhashBlockedSql
          SELECT doc_a, doc_b, hamming FROM bpairs ORDER BY doc_a, doc_b""",
    "mm_audio_fingerprint" ->
      s"""WITH $AfpChainSql
          SELECT vid, src_doc, CAST(v AS INT) AS variant, afp
          FROM hashes JOIN avids USING (vid) ORDER BY vid""",
    "mm_audio_neardup_pairs" ->
      s"""WITH $AfpChainSql, ${blockedPairsSql("afp")}
          SELECT doc_a, doc_b, hamming FROM bpairs ORDER BY doc_a, doc_b""",
    "mm_audio_neardup_eval" ->
      s"""WITH $AfpChainSql, ${blockedPairsSql("afp")},
          truth AS (SELECT a.vid AS doc_a, b.vid AS doc_b
                    FROM hashes a JOIN hashes b ON a.vid < b.vid
                    WHERE bit_count(xor(a.afp, b.afp)) <= $DhashMaxHamming),
          nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
          nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocked FROM bpairs),
          nx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
                 FROM truth SEMI JOIN bpairs USING (doc_a, doc_b))
          SELECT n_truth, n_blocked, n_both,
            CASE WHEN n_blocked = 0 THEN NULL
              ELSE round(CAST(n_both AS DOUBLE) / n_blocked, 6) END AS precision_r,
            CASE WHEN n_truth = 0 THEN NULL
              ELSE round(CAST(n_both AS DOUBLE) / n_truth, 6) END AS recall_r
          FROM nt, nb, nx""",
    "mm_image_neardup_eval" ->
      s"""WITH $DhashChainSql, $DhashBlockedSql,
          truth AS (SELECT a.vid AS doc_a, b.vid AS doc_b
                    FROM hashes a JOIN hashes b ON a.vid < b.vid
                    WHERE bit_count(xor(a.dhash, b.dhash)) <= $DhashMaxHamming),
          nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
          nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocked FROM bpairs),
          nx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
                 FROM truth SEMI JOIN bpairs USING (doc_a, doc_b))
          SELECT n_truth, n_blocked, n_both,
            CASE WHEN n_blocked = 0 THEN NULL
              ELSE round(CAST(n_both AS DOUBLE) / n_blocked, 6) END AS precision_r,
            CASE WHEN n_truth = 0 THEN NULL
              ELSE round(CAST(n_both AS DOUBLE) / n_truth, 6) END AS recall_r
          FROM nt, nb, nx""",
    "mm_video_fingerprint" ->
      s"""WITH $VfpChainSql
          SELECT vid, src_doc, CAST(v AS INT) AS variant, vfp
          FROM hashes JOIN vvids USING (vid) ORDER BY vid""",
    "mm_video_neardup_pairs" ->
      s"""WITH $VfpChainSql, ${blockedPairsSql("vfp")}
          SELECT doc_a, doc_b, hamming FROM bpairs ORDER BY doc_a, doc_b""",
    "mm_video_neardup_eval" ->
      s"""WITH $VfpChainSql, ${blockedPairsSql("vfp")},
          truth AS (SELECT a.vid AS doc_a, b.vid AS doc_b
                    FROM hashes a JOIN hashes b ON a.vid < b.vid
                    WHERE bit_count(xor(a.vfp, b.vfp)) <= $DhashMaxHamming),
          nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
          nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocked FROM bpairs),
          nx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
                 FROM truth SEMI JOIN bpairs USING (doc_a, doc_b))
          SELECT n_truth, n_blocked, n_both,
            CASE WHEN n_blocked = 0 THEN NULL
              ELSE round(CAST(n_both AS DOUBLE) / n_blocked, 6) END AS precision_r,
            CASE WHEN n_truth = 0 THEN NULL
              ELSE round(CAST(n_both AS DOUBLE) / n_truth, 6) END AS recall_r
          FROM nt, nb, nx""",
  )

  /** Closed-form dHash chain, generated from the SAME constants the
    * Spark fixture/decoder uses (one Scala table, both engines): per
    * (image doc × variant) the sampled-luma grid and the 56-bit
    * gradient-sign hash. The Spark side derives this through REAL PNG
    * encode/decode; the oracle restates the raster formula — they agree
    * only if the codec round-trip is exact AND the decode truly read
    * the raster. */
  private lazy val DhashChainSql: String = {
    def chanSql(ch: DhashChan, shifted: Boolean): String = {
      val base = s"(a * ${ch.ar} + x * (${ch.bx} + (a % ${ch.mx}) * ${ch.cx})" +
        s" + y * (${ch.by} + (a % ${ch.my}) * ${ch.cy})) % 256"
      if (shifted) s"least(255, ($base) + $DhashShift)" else s"($base)"
    }
    val Seq(rE, gE, bE) = DhashChans.map(ch =>
      s"CASE WHEN v = 1 THEN ${chanSql(ch, shifted = true)} ELSE ${chanSql(ch, shifted = false)} END")
    s"""imgs AS (SELECT doc_id, COALESCE(length(text), 0) AS len FROM documents
                 WHERE CAST(doc_id % 3 AS INT) = 0),
        vids AS MATERIALIZED (SELECT doc_id * 2 + v AS vid, doc_id AS src_doc, v,
                 16 + doc_id % 17 AS w, 16 + len % 13 AS h,
                 (doc_id * 2654435761) % 1000003 AS a
               FROM imgs, (SELECT unnest([0, 1]) AS v)),
        cells AS (SELECT vid, v, a, cy, cx, (cx * w) // $DhashCols AS x,
                    (cy * h) // $DhashRows AS y
                  FROM vids,
                    (SELECT unnest(generate_series(0, ${DhashRows - 1})) AS cy),
                    (SELECT unnest(generate_series(0, ${DhashCols - 1})) AS cx)),
        lum AS MATERIALIZED (SELECT vid, cy, cx,
                 (299 * r + 587 * g + 114 * b) // 1000 AS l
               FROM (SELECT vid, cy, cx, $rE AS r, $gE AS g, $bE AS b FROM cells)),
        hashes AS MATERIALIZED (SELECT l1.vid,
                 CAST(COALESCE(SUM(CASE WHEN l2.l > l1.l
                   THEN (1::BIGINT << (l1.cy * ${DhashCols - 1} + l1.cx))
                   ELSE 0 END), 0) AS BIGINT) AS dhash
               FROM lum l1 JOIN lum l2
                 ON l2.vid = l1.vid AND l2.cy = l1.cy AND l2.cx = l1.cx + 1
               WHERE l1.cx < ${DhashCols - 1}
               GROUP BY l1.vid)"""
  }

  /** The [[DhashBlocks]]-block pigeonhole join over `hashes`, mirroring
    * [[DedupOps.blockedPairsFrom]]'s MSB-first split of the 64-bit
    * packed fingerprint (the hash's top 8 bits are structurally zero) —
    * block bounds computed numerically from the same arithmetic.
    * Parameterized on the hash column so the image and audio families
    * share one generator. */
  private def blockedPairsSql(hashCol: String): String = {
    val sizes = Array.tabulate(DhashBlocks)(i =>
      64 / DhashBlocks + (if (i < 64 % DhashBlocks) 1 else 0))
    val starts = sizes.scanLeft(0)(_ + _)
    val blockRows = (0 until DhashBlocks).map { i =>
      val div = 1L << (64 - starts(i) - sizes(i))
      val mod = 1L << sizes(i)
      s"SELECT vid, $hashCol, $i AS blk, ($hashCol // $div) % $mod AS bval FROM hashes"
    }.mkString("\n            UNION ALL ")
    s"""blocks AS ($blockRows),
        bpairs AS (SELECT doc_a, doc_b, hamming FROM (
              SELECT DISTINCT a.vid AS doc_a, b.vid AS doc_b,
                CAST(bit_count(xor(a.$hashCol, b.$hashCol)) AS BIGINT) AS hamming
              FROM blocks a JOIN blocks b
                ON a.blk = b.blk AND a.bval = b.bval AND a.vid < b.vid)
            WHERE hamming <= $DhashMaxHamming)"""
  }
  private lazy val DhashBlockedSql: String = blockedPairsSql("dhash")

  /** Closed-form acoustic-fingerprint chain (the [[DhashChainSql]]
    * discipline on the audio rows): per (audio doc × variant) the
    * windowed energy envelope and the 56-bit gradient-sign hash. The
    * Spark side derives this through REAL javax.sound WAV
    * encode/decode; the oracle restates the PCM formula. */
  private lazy val AfpChainSql: String = {
    val s0 = "((((a + k * 2654435761) % 999983) * (((a + k * 2654435761) % 999983) % 4093)) % 34000) - 17000"
    s"""auds AS (SELECT doc_id, COALESCE(length(text), 0) AS len FROM documents
                 WHERE CAST(doc_id % 3 AS INT) = 1),
        avids AS MATERIALIZED (SELECT doc_id * 2 + v AS vid, doc_id AS src_doc, v,
                 570 + len % 100 AS n, (doc_id * 2654435761) % 1000003 AS a
               FROM auds, (SELECT unnest([0, 1]) AS v)),
        asmp AS (SELECT vid, v, n, a, unnest(generate_series(0, n - 1)) AS k
                 FROM avids),
        aen AS MATERIALIZED (SELECT vid, (k * $AfpWindows) // n AS w,
                 CAST(SUM(abs(CASE WHEN v = 1
                   THEN greatest(-32768, least(32767, ($s0) * $AfpGain))
                   ELSE $s0 END)) AS BIGINT) AS e,
                 CAST(COUNT(*) AS BIGINT) AS c
               FROM asmp GROUP BY vid, (k * $AfpWindows) // n),
        hashes AS MATERIALIZED (SELECT e1.vid,
                 CAST(COALESCE(SUM(CASE WHEN e2.e * e1.c > e1.e * e2.c
                   THEN (1::BIGINT << e1.w) ELSE 0 END), 0) AS BIGINT) AS afp
               FROM aen e1 JOIN aen e2 ON e2.vid = e1.vid AND e2.w = e1.w + 1
               WHERE e1.w < ${AfpWindows - 1}
               GROUP BY e1.vid)"""
  }

  /** Closed-form temporal-fingerprint chain (the [[AfpChainSql]]
    * discipline on the video rows): per (video doc × variant) the
    * mdat-payload energy envelope and the 56-bit gradient-sign hash.
    * The Spark side derives this through the REAL MP4 write → box-walk
    * → mdat-extract path; the oracle restates the payload bytes as the
    * document's char codes (ASCII corpus — char codes == UTF-8 bytes),
    * with v1's remux trim as the length cut. */
  private lazy val VfpChainSql: String =
    s"""vdocs AS (SELECT doc_id, text, length(text) AS len FROM documents
                 WHERE CAST(doc_id % 3 AS INT) = 2
                   AND COALESCE(length(text), 0) >= $VfpMinLen),
        vvids AS MATERIALIZED (SELECT doc_id * 2 + v AS vid, doc_id AS src_doc, v,
                 text, len AS n
               FROM vdocs, (SELECT unnest([0, 1]) AS v)),
        vsmp AS (SELECT vid, v, n, text, unnest(generate_series(0, n - 1)) AS k
                 FROM vvids),
        ven AS MATERIALIZED (SELECT vid, (k * $AfpWindows) // n AS w,
                 CAST(SUM(CASE WHEN v = 1 THEN a - a % 2 ELSE a END) AS BIGINT) AS e,
                 CAST(COUNT(*) AS BIGINT) AS c
               FROM (SELECT vid, v, n, k,
                       ascii(substr(text, CAST(k + 1 AS INT), 1)) AS a
                     FROM vsmp)
               GROUP BY vid, (k * $AfpWindows) // n),
        hashes AS MATERIALIZED (SELECT e1.vid,
                 CAST(COALESCE(SUM(CASE WHEN e2.e * e1.c > e1.e * e2.c
                   THEN (1::BIGINT << e1.w) ELSE 0 END), 0) AS BIGINT) AS vfp
               FROM ven e1 JOIN ven e2 ON e2.vid = e1.vid AND e2.w = e1.w + 1
               WHERE e1.w < ${AfpWindows - 1}
               GROUP BY e1.vid)"""
}
