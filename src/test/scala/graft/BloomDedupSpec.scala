package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Probe-then-insert bloom dedup (twin #25) against an independent
  * plain-Scala simulation of the whole protocol — per chunk: probe the
  * standing filter, elect min-doc_id keepers within the batch, enroll
  * kept hashes — plus the replay pins: a redelivered batch (whose probe
  * answers CHANGE because the filter now contains its own hashes) and a
  * duplicated decision write both fold back to the first delivery's
  * answers. */
class BloomDedupSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bdd").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rws = rows.map { case (id, text) =>
      Row(id, text, "en", "src0", text.length.toLong) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rws).asJava),
      schema).write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- independent reference filter (SketchSpec's helpers) ----
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def hex32(h: String): Long = java.lang.Long.parseLong(h.take(8), 16)
  private val Salts = 4
  private def refGeom(nDistinct: Long): Long = {
    val n = math.max(nDistinct, 1L)
    (8 to 26).map(p => 1L << p).find(_ >= 8 * n).getOrElse(1L << 26)
  }
  private def refPositions(ch: String, m: Long): Seq[Long] =
    (0 until Salts).map(i => hex32(md5hex(s"bloom$i:$ch")) % m)
  private def refHit(ch: String, m: Long, words: Map[Long, Long]): Int =
    if (refPositions(ch, m).forall(p =>
      (words.getOrElse(p / 32, 0L) >> (p % 32).toInt & 1L) == 1L)) 1 else 0

  /** The full protocol in arrays and loops: returns per-doc
    * (bloom_hit, keep) after feeding the chunks in order. */
  private def refProtocol(chunks: Seq[Seq[(Long, String)]]): Map[Long, (Int, Int)] = {
    val m = refGeom(chunks.head.map(t => md5hex(t._2)).distinct.size.toLong)
    var words = Map.empty[Long, Long]
    val out = scala.collection.mutable.Map.empty[Long, (Int, Int)]
    for (chunk <- chunks) {
      val hashed = chunk.map { case (id, text) => (id, md5hex(text)) }
      // probe-then-insert at BATCH granularity: all probes read the
      // standing filter as of the batch start
      val hits = hashed.map { case (id, ch) => id -> refHit(ch, m, words) }.toMap
      val keeper = hashed.groupBy(_._2).map { case (ch, xs) => ch -> xs.map(_._1).min }
      for ((id, ch) <- hashed) {
        val keep = if (hits(id) == 0 && keeper(ch) == id) 1 else 0
        out(id) = (hits(id), keep)
      }
      val kept = hashed.filter { case (id, ch) => hits(id) == 0 && keeper(ch) == id }
        .map(_._2).distinct
      for (ch <- kept; p <- refPositions(ch, m))
        words = words.updated(p / 32, words.getOrElse(p / 32, 0L) | (1L << (p % 32).toInt))
    }
    out.toMap
  }

  /** Chunk A (ids 0-9): five within-batch dup pairs. Chunk B (ids
    * 10-19): doc 10 duplicates doc 0 across chunks; the rest unique. */
  private lazy val corpus: Seq[Seq[(Long, String)]] = Seq(
    (0L until 10L).map { i =>
      val text =
        if (i % 2 == 1) s"probe insert corpus text ${i - 1} about things"
        else s"probe insert corpus text $i about things"
      (i, text)
    },
    (10L until 20L).map { i =>
      val text =
        if (i == 10L) "probe insert corpus text 0 about things"
        else s"unique late arrival $i with its own words"
      (i, text)
    })

  test("probe-then-insert protocol matches the plain-Scala simulation decision for decision") {
    val base = java.nio.file.Files.createTempDirectory("graft_bdd_b").toString
    val dir = s"$base/filter"
    import spark.implicits._
    corpus.zipWithIndex.foreach { case (chunk, i) =>
      streaming.BloomDedupIngest.processBatch(spark, dir,
        chunk.toDF("doc_id", "text"), i.toLong)
    }
    val got = streaming.BloomDedupIngest.decisionsFromDir(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got == refProtocol(corpus))
    // the crafted expectations, spelled out: within-batch dup pairs
    // keep the even keeper; the cross-chunk dup (10) reads hit=1
    assert(got(0L) == (0, 1) && got(1L) == (0, 0), s"within-batch pair: $got")
    assert(got(10L) == (1, 0), s"cross-chunk dup must probe hot: $got")
    assert(got(11L) == (0, 1))
  }

  test("redelivered batch and duplicated decision files fold to the first delivery's answers") {
    val base = java.nio.file.Files.createTempDirectory("graft_bdd_r").toString
    val dir = s"$base/filter"
    import spark.implicits._
    corpus.zipWithIndex.foreach { case (chunk, i) =>
      streaming.BloomDedupIngest.processBatch(spark, dir,
        chunk.toDF("doc_id", "text"), i.toLong)
    }
    val first = streaming.BloomDedupIngest.decisionsFromDir(spark, dir)
      .orderBy("doc_id").collect().toSeq
    // redelivery of batch 0 AFTER its own enrollment: every probe now
    // reads hit=1 — the exact rows the min/max fold exists to absorb
    streaming.BloomDedupIngest.processBatch(spark, dir,
      corpus.head.toDF("doc_id", "text"), 0L)
    val afterReplay = streaming.BloomDedupIngest.decisionsFromDir(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(afterReplay == first, "a replayed batch changed folded decisions")
    // the other interleaving: decisions written, crash before
    // enrollment, full retry — duplicated IDENTICAL decision rows
    val d0 = spark.read.parquet(dir + "/decisions")
      .where($"batch_id" === 0L)
    d0.write.mode("append").parquet(dir + "/decisions")
    val afterDup = streaming.BloomDedupIngest.decisionsFromDir(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(afterDup == first, "duplicated decision files changed folded decisions")
  }

  test("streaming form (twin #25): chunked feed, killed between chunks == direct protocol") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val base = JFiles.createTempDirectory("graft_bdd_s").toString
    val srcDir = s"$base/src"
    JFiles.createDirectories(JPaths.get(srcDir))
    val dir = s"$base/filter"
    corpus.zipWithIndex.foreach { case (chunk, i) =>
      val lines = chunk.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
      JFiles.writeString(JPaths.get(srcDir, f"f$i%03d.json"),
        lines.mkString("", "\n", "\n"))
      val docs = spark.readStream.schema("doc_id LONG, text STRING").json(srcDir)
      val q = streaming.BloomDedupIngest.ingest(docs, dir)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val got = streaming.BloomDedupIngest.decisionsFromDir(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got == refProtocol(corpus))
  }
}
