package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Temporal video-fingerprint pins against an independent from-scratch
  * reference (the AudioFpSpec discipline, video edition): the
  * reference computes the payload-window hash straight from the
  * document BYTES; the operator goes through the REAL MP4 write →
  * box-walk → mdat-extract path — agreement proves the container
  * round-trip preserved the stream AND the window/energy/gradient
  * arithmetic. Also pins remux+requant twin recovery at small hamming
  * and pigeonhole losslessness. */
class VideoFpSpec extends SparkSpec {

  private def writeDocs(rows: Seq[Row]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vfp").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      docSchema).write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- independent reference: bytes -> windows -> hash ----
  private def refHash(text: String, variant: Int): Long = {
    val bs = text.getBytes("UTF-8")
      .map(b => if (variant == 1) (b & 0xFE).toByte else b)
    val n = bs.length
    val e = new Array[Long](57); val c = new Array[Long](57)
    for (k <- 0 until n) {
      val w = (k * 57) / n
      e(w) += (bs(k) & 0xff); c(w) += 1
    }
    var hash = 0L
    for (f <- 0 until 56)
      if (e(f + 1) * c(f) > e(f) * c(f + 1)) hash |= 1L << f
    hash
  }

  // varied deterministic byte content (constant bytes would hash every
  // doc to 0 and collide the corpus wholesale); one short row under
  // VfpMinLen that must NOT be fingerprinted
  private def body(id: Long, len: Int): String =
    (0 until len).map(i => ('a' + ((id * 31 + i * 7 + i * i) % 26)).toChar).mkString
  private val docs: Seq[Row] =
    (0L to 29L).map(i => Row(i, body(i, 128 + (i % 17).toInt * 23), "en", "s0", 0L)) :+
      Row(32L, "too short for a video fingerprint", "en", "s0", 0L)
  private lazy val dir = writeDocs(docs)
  private def videoTexts = docs.collect {
    case Row(id: Long, t: String, _, _, _) if id % 3 == 2 && t.length >= 128 => id -> t }

  test("operator hash (real MP4 write->walk->mdat) == byte reference, bit for bit; short rows excluded") {
    val got = ops.MultimodalOps.queries("mm_video_fingerprint")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = videoTexts.flatMap { case (id, t) =>
      (0 to 1).map(v => (id * 2 + v) -> refHash(t, v))
    }.toMap
    assert(got == want, s"fingerprint diverged from the byte reference:\n$got\nvs\n$want")
    assert(!got.contains(64L) && !got.contains(65L),
      "the under-VfpMinLen row must not be fingerprinted")
    assert(got.values.forall(h => h >= 0 && h < (1L << 56)),
      "hashes must stay inside the positive 56-bit range")
  }

  test("pairs: every remux+requant twin surfaces at small hamming; pigeonhole == brute") {
    val pairs = ops.MultimodalOps.queries("mm_video_neardup_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((id, _) <- videoTexts) {
      val twin = pairs.find(p => p._1 == id * 2 && p._2 == id * 2 + 1)
      assert(twin.isDefined, s"requant twin of doc $id not found: ${pairs.toSeq}")
      assert(twin.get._3 <= 4, s"twin of doc $id beyond threshold: $twin")
    }
    val hs = videoTexts.flatMap { case (id, t) =>
      (0 to 1).map(v => (id * 2 + v) -> refHash(t, v)) }
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 4
    } yield (ia, ib, ham.toLong)).sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == brute,
      s"blocked pairs != brute truth:\n${pairs.toSeq}\nvs\n$brute")
  }

  test("eval: measured recall and precision are exactly 1.0 on the fixture corpus") {
    val r = ops.MultimodalOps.queries("mm_video_neardup_eval")(spark, dir)
      .collect().head
    assert(r.getLong(0) > 0, s"audit needs a nonempty truth set: $r")
    assert(r.getLong(0) == r.getLong(1) && r.getLong(1) == r.getLong(2), s"count mismatch: $r")
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0, s"recall/precision: $r")
  }
}
