package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Perceptual image near-dup pins against an independent from-scratch
  * reference (the mortonRef discipline — no shared code with the
  * operator): the reference computes dHash straight from the raster
  * FORMULA, the operator through the REAL ImageIO PNG encode → decode
  * path, so agreement proves both the codec round-trip and the
  * grid/luma/gradient arithmetic. Also pins the semantics the fixture
  * plants: brightness-shift near-invariance (twins at small hamming)
  * and pigeonhole losslessness at the threshold. */
class ImageDhashSpec extends SparkSpec {

  private def writeDocs(rows: Seq[Row]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dhash").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      docSchema).write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- independent reference: raster formula -> luma grid -> hash ----
  private def refChan(ar: Int, bx: Int, mx: Int, cx: Int, by: Int, my: Int,
      cy: Int, a: Long, x: Int, y: Int): Int =
    ((a * ar + x * (bx + (a % mx) * cx) + y * (by + (a % my) * cy)) % 256).toInt
  private def refHash(id: Long, len: Int, variant: Int): Long = {
    val (w, h) = (16 + (id % 17).toInt, 16 + len % 13)
    val a = (id * 2654435761L) % 1000003L
    def luma(cx: Int, cy: Int): Int = {
      val (x, y) = (cx * w / 9, cy * h / 7)
      def v(c: Int): Int = if (variant == 1) math.min(255, c + 8) else c
      val r = v(refChan(1, 17, 13, 16, 11, 11, 8, a, x, y))
      val g = v(refChan(3, 19, 17, 12, 13, 7, 20, a, x, y))
      val b = v(refChan(7, 23, 19, 8, 29, 5, 24, a, x, y))
      (299 * r + 587 * g + 114 * b) / 1000
    }
    var hash = 0L
    for (cy <- 0 until 7; cx <- 0 until 8)
      if (luma(cx + 1, cy) > luma(cx, cy)) hash |= 1L << (cy * 8 + cx)
    hash
  }

  private val docs = (0L to 29L).map(i =>
    Row(i, "x" * (5 + (i % 23).toInt), "en", "s0", 0L))
  private lazy val dir = writeDocs(docs)

  test("operator hash (real PNG encode->decode) == formula reference, bit for bit") {
    val got = ops.MultimodalOps.queries("mm_image_dhash")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = docs.collect { case Row(id: Long, t: String, _, _, _) if id % 3 == 0 =>
      (0 to 1).map(v => (id * 2 + v) -> refHash(id, t.length, v))
    }.flatten.toMap
    assert(got == want, s"dhash diverged from the formula reference:\n$got\nvs\n$want")
    assert(got.nonEmpty && got.values.forall(h => h >= 0 && h < (1L << 56)),
      "hashes must stay inside the positive 56-bit range")
  }

  test("pairs: every planted brightness twin is found at small hamming; pigeonhole == brute") {
    val pairs = ops.MultimodalOps.queries("mm_image_neardup_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val imageIds = docs.collect { case Row(id: Long, _, _, _, _) if id % 3 == 0 => id }
    // the +8 twin preserves every unclamped comparison, so each
    // (original, twin) pair must appear within the threshold
    for (id <- imageIds) {
      val twin = pairs.find(p => p._1 == id * 2 && p._2 == id * 2 + 1)
      assert(twin.isDefined, s"planted twin of doc $id not found: ${pairs.toSeq}")
      assert(twin.get._3 <= 4, s"twin of doc $id beyond threshold: $twin")
    }
    // pigeonhole losslessness, independently recomputed: brute-force
    // all-pairs at the threshold over the reference hashes
    val hs = docs.collect { case Row(id: Long, t: String, _, _, _) if id % 3 == 0 =>
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
    val r = ops.MultimodalOps.queries("mm_image_neardup_eval")(spark, dir)
      .collect().head
    assert(r.getLong(0) > 0, s"audit needs a nonempty truth set: $r")
    assert(r.getLong(0) == r.getLong(1) && r.getLong(1) == r.getLong(2), s"count mismatch: $r")
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0, s"recall/precision: $r")
  }
}
