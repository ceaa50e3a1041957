package graft

import org.apache.spark.sql.DataFrame
import graft.ops.DedupOps

/** Pigeonhole block-index property tests (VERDICT r2 item 7): the
  * generalized (nBlocks, comboSize) candidate index is LOSSLESS at the
  * declared hamming radius — for any fingerprint set, it emits exactly
  * the brute-force pair set — across block splits including ones whose
  * blocks straddle the fp_hi/fp_lo boundary and uneven 64/nBlocks
  * splits. Plus corpus-level equivalence of the (6,2) block-pair form
  * vs the registered 4-block operator, and the precondition guard.
  */
class SimhashBlockSpec extends SparkSpec {

  import spark.implicits._

  private def fpDf(fps: Seq[(Long, Long, Long)]): DataFrame =
    fps.toDF("doc_id", "fp_hi", "fp_lo")

  /** Driver-side brute force: all pairs within hamming ≤ k. */
  private def bruteForce(fps: Seq[(Long, Long, Long)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (a, i) <- fps.zipWithIndex
      b <- fps.drop(i + 1)
      if a._1 != b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= k
    } yield {
      val (lo, hi) = if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
      (lo, hi, d.toLong)
    }).toSet

  private def blocked(fps: Seq[(Long, Long, Long)], b: Int, m: Int, k: Int): Set[(Long, Long, Long)] =
    DedupOps.blockedPairsFrom(fpDf(fps), b, m, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Seeded fingerprints: uniform background plus planted near-pairs at
    * controlled distances 0..6 (some inside the radius, some out). */
  private def seededFps(seed: Long, n: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    def u32() = rnd.nextLong() & 0xffffffffL
    val base = (0 until n).map(i => (i.toLong, u32(), u32()))
    val planted = (0 until n by 7).map { i =>
      val (_, hi, lo) = base(i)
      val flips = rnd.nextInt(7) // 0..6 bit flips over the packed 64
      var (h2, l2) = (hi, lo)
      (0 until flips).foreach { _ =>
        val bit = rnd.nextInt(64)
        if (bit < 32) h2 ^= (1L << (31 - bit)) else l2 ^= (1L << (63 - bit))
      }
      ((n + i).toLong, h2, l2)
    }
    base ++ planted
  }

  for ((b, m, k) <- Seq((4, 1, 3), (6, 2, 3), (6, 3, 3), (8, 2, 3), (8, 3, 5))) {
    test(s"($b blocks, $m-combos) index is lossless at hamming <= $k") {
      val fps = seededFps(seed = 100L * b + 10L * m + k, n = 120)
      val expected = bruteForce(fps, k)
      assert(expected.nonEmpty, "seed planted no in-radius pairs; bad fixture")
      assert(blocked(fps, b, m, k) === expected)
    }
  }

  test("(6,2) block-pair form == registered 4-block operator on the corpus") {
    val d = "/root/testdata/sf0.001"
    val four = DedupOps.simhashPairs(spark, d).collect().toSeq
    val six = DedupOps.simhashPairsBlocked(6, 2)(spark, d).collect().toSeq
    assert(four.nonEmpty)
    assert(six === four)
  }

  test("comboSize beyond the pigeonhole bound is rejected") {
    val fps = fpDf(Seq((1L, 0L, 0L)))
    // 6 - 3 = 3: comboSize 4 can miss pairs -> must throw
    intercept[IllegalArgumentException] {
      DedupOps.blockedPairsFrom(fps, 6, 4, 3)
    }
  }
}
