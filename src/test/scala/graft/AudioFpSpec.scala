package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Acoustic-fingerprint pins against an independent from-scratch
  * reference (the ImageDhashSpec discipline, audio edition): the
  * reference computes the energy-envelope hash straight from the PCM
  * FORMULA; the operator goes through the REAL javax.sound WAV
  * encode → decode path — agreement proves the container round-trip
  * preserved every sample AND the window/energy/gradient arithmetic.
  * Also pins gain-invariance (the 2× twin lands at small hamming) and
  * pigeonhole losslessness. */
class AudioFpSpec extends SparkSpec {

  private def writeDocs(rows: Seq[Row]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_afp").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      docSchema).write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- independent reference: formula -> windows -> hash ----
  private def refSample(a: Long, k: Int): Int = {
    val m = (a + k * 2654435761L) % 999983L
    (((m * (m % 4093L)) % 34000L) - 17000L).toInt
  }
  private def refHash(id: Long, len: Int, variant: Int): Long = {
    val n = 570 + len % 100
    val a = (id * 2654435761L) % 1000003L
    val e = new Array[Long](57); val c = new Array[Long](57)
    for (k <- 0 until n) {
      val s0 = refSample(a, k)
      val sv = if (variant == 1) math.max(-32768, math.min(32767, s0 * 2)) else s0
      val w = (k * 57) / n
      e(w) += math.abs(sv); c(w) += 1
    }
    var hash = 0L
    for (f <- 0 until 56)
      if (e(f + 1) * c(f) > e(f) * c(f + 1)) hash |= 1L << f
    hash
  }

  private val docs = (0L to 29L).map(i =>
    Row(i, "y" * (7 + (i % 31).toInt), "en", "s0", 0L))
  private lazy val dir = writeDocs(docs)
  private def audioIds = docs.collect {
    case Row(id: Long, _, _, _, _) if id % 3 == 1 => id }

  test("operator hash (real WAV encode->decode) == formula reference, bit for bit") {
    val got = ops.MultimodalOps.queries("mm_audio_fingerprint")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = docs.collect { case Row(id: Long, t: String, _, _, _) if id % 3 == 1 =>
      (0 to 1).map(v => (id * 2 + v) -> refHash(id, t.length, v))
    }.flatten.toMap
    assert(got == want, s"fingerprint diverged from the formula reference:\n$got\nvs\n$want")
    assert(got.nonEmpty && got.values.forall(h => h >= 0 && h < (1L << 56)),
      "hashes must stay inside the positive 56-bit range")
  }

  test("pairs: every 2x-gain twin surfaces at small hamming; pigeonhole == brute") {
    val pairs = ops.MultimodalOps.queries("mm_audio_neardup_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (id <- audioIds) {
      val twin = pairs.find(p => p._1 == id * 2 && p._2 == id * 2 + 1)
      assert(twin.isDefined, s"2x-gain twin of doc $id not found: ${pairs.toSeq}")
      assert(twin.get._3 <= 4, s"twin of doc $id beyond threshold: $twin")
    }
    val hs = docs.collect { case Row(id: Long, t: String, _, _, _) if id % 3 == 1 =>
      (0 to 1).map(v => (id * 2 + v) -> refHash(id, t.length, v))
    }.flatten
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 4
    } yield (ia, ib, ham.toLong)).sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == brute,
      s"blocked pairs != brute truth:\n${pairs.toSeq}\nvs\n$brute")
  }

  test("eval: measured recall and precision are exactly 1.0 on the fixture corpus") {
    val r = ops.MultimodalOps.queries("mm_audio_neardup_eval")(spark, dir)
      .collect().head
    assert(r.getLong(0) > 0, s"audit needs a nonempty truth set: $r")
    assert(r.getLong(0) == r.getLong(1) && r.getLong(1) == r.getLong(2), s"count mismatch: $r")
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0, s"recall/precision: $r")
  }
}
