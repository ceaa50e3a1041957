package graft

import org.apache.spark.sql.functions._

/** Twin #40 parity pins: the streaming reconciliation ledger must
  * reproduce the batch `set_diff_refresh` byte-for-byte once the
  * refresh closes, under chunking, redelivery, and kill-between-chunks
  * restarts — plus the replay trap specific to a self-appending
  * registry (a redelivered doc must not compare against its own
  * enrolled fingerprint). */
class SetDiffIngestSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val batchDiff =
    SparkEntry.queries("set_diff_refresh")(spark, sf).collect().toSeq

  private def standing = Tables.documents(spark, sf).select("doc_id", "text")
  private def refreshed = graft.ops.RefOps.refreshedDocs(spark, sf)
  private def got(dir: String) =
    streaming.SetDiffIngest.diffFromDir(spark, dir).collect().toSeq

  test("seed + one refresh batch == batch set_diff_refresh") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdiff1").toString
    streaming.SetDiffIngest.buildFpIndex(spark, standing, dir)
    streaming.SetDiffIngest.processBatch(spark, dir, refreshed, 0L)
    assert(got(dir) == batchDiff)
  }

  test("chunked + redelivered refresh stays row-identical (the own-fp replay trap)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdiff2").toString
    streaming.SetDiffIngest.buildFpIndex(spark, standing, dir)
    val c1 = refreshed.where(pmod(col("doc_id"), lit(3)) === 1)
    streaming.SetDiffIngest.processBatch(spark, dir,
      refreshed.where(pmod(col("doc_id"), lit(3)) === 0), 0L)
    streaming.SetDiffIngest.processBatch(spark, dir, c1, 1L)
    // the replayed chunk must contain 'changed' docs, or the trap this
    // test exists for (replay comparing a doc against its OWN enrolled
    // fp and flipping changed -> unchanged) is never exercised
    val changedInC1 = batchDiff.filter(r => r.getString(1) == "changed" &&
      r.getLong(0) % 3 == 1)
    assert(changedInC1.nonEmpty, "fixture must put changed docs in the replayed chunk")
    streaming.SetDiffIngest.processBatch(spark, dir, c1, 1L) // redelivery
    streaming.SetDiffIngest.processBatch(spark, dir,
      refreshed.where(pmod(col("doc_id"), lit(3)) === 2), 2L)
    assert(got(dir) == batchDiff)
  }

  test("intra-batch duplicate doc_id elects ONE deterministic fp (replay byte-identical)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdiff4").toString
    streaming.SetDiffIngest.buildFpIndex(spark,
      Seq((1L, "old body")).toDF("doc_id", "text"), dir)
    // a crawler delivering the same doc twice in one batch with
    // different bodies (redirect + canonical fetch) — without the
    // per-batch fold this enrolls two fps at one batch_id and the
    // probe's max_by ties nondeterministically
    val dup = Seq((1L, "body A"), (1L, "body B"), (2L, "fresh"))
      .toDF("doc_id", "text")
    streaming.SetDiffIngest.processBatch(spark, dir, dup, 0L)
    val first = got(dir)
    assert(first.count(_.getLong(0) == 1L) == 1,
      "duplicate delivery must fold to ONE decision row")
    assert(first.map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "changed", 2L -> "added"))
    // registry holds exactly one fp for doc 1 at batch 0
    val enrolled = spark.read.parquet(dir + "/fps")
      .where(col("batch_id") === 0L && col("doc_id") === 1L).collect()
    assert(enrolled.length == 1)
    streaming.SetDiffIngest.processBatch(spark, dir, dup, 0L) // redelivery
    assert(got(dir) == first, "replay of the duplicate batch must be byte-identical")
  }

  test("set-diff ingest (twin #40): chunked file stream, killed between chunks == batch op") {
    import java.nio.file.{Files => JFiles}
    val base = JFiles.createTempDirectory("graft_sdiff3").toString
    val dir = s"$base/index"
    streaming.SetDiffIngest.buildFpIndex(spark, standing, dir)
    val srcDir = s"$base/src"
    (0 to 3).foreach { m =>
      refreshed.where(pmod(col("doc_id"), lit(4)) === m)
        .write.mode("append").parquet(srcDir)
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(srcDir)
      val q = streaming.SetDiffIngest.ingest(stream, dir)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(got(dir) == batchDiff,
      "streamed reconciliation must equal the batch operator at refresh close")
  }
}
