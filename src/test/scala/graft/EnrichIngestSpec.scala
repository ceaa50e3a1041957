package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Twin #41 parity pins: the streaming enrichment ledger must (a) show
  * the placeholder state mid-stream that the batch operator can never
  * see — facts emitted with matched=0 before their dim lands, (b)
  * upgrade those rows when the dim CDC arrives, (c) reproduce the
  * batch `join_left_outer_enrich` byte-for-byte once both streams
  * close, under chunking, redelivery, kill-between-chunks restarts,
  * and ledger compaction. */
class EnrichIngestSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val batchResult =
    SparkEntry.queries("join_left_outer_enrich")(spark, sf).collect().toSeq

  private def facts = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
  private def dims = Tables.customer(spark, sf)
    .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
    .select("c_custkey", "c_name", "c_mktsegment")

  private def envOf(f: DataFrame, dm: DataFrame): DataFrame =
    f.select(lit("fact").as("kind"), col("o_orderkey"), col("o_custkey"),
      lit(null).cast("long").as("c_custkey"),
      lit(null).cast("string").as("c_name"),
      lit(null).cast("string").as("c_mktsegment"))
      .unionByName(dm.select(lit("dim").as("kind"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("long").as("o_custkey"),
        col("c_custkey"), col("c_name"), col("c_mktsegment")))

  private def got(dir: String) =
    streaming.EnrichIngest.ledgerFromDir(spark, dir).collect().toSeq

  test("facts-before-dims: placeholders mid-stream, upgrades on dim arrival, final == batch op") {
    // non-vacuity: the batch result must contain both classes or the
    // upgrade path is never exercised
    assert(batchResult.exists(_.getInt(4) == 1) && batchResult.exists(_.getInt(4) == 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_enr1").toString
    streaming.EnrichIngest.init(spark, dir)
    // batch 0: EVERY fact, NO dims — the state the batch operator
    // cannot represent: the report must exist, all placeholders
    streaming.EnrichIngest.processBatch(spark, dir, envOf(facts, dims.limit(0)), 0L)
    val mid = got(dir)
    assert(mid.size == batchResult.size)
    assert(mid.forall(r => r.getInt(4) == 0 && r.getString(2) == "unknown" &&
      r.getString(3) == "(none)"), "pre-dim reads must be all placeholders")
    // batch 1: the dim CDC lands — every batch-matched fact upgrades
    streaming.EnrichIngest.processBatch(spark, dir, envOf(facts.limit(0), dims), 1L)
    assert(got(dir) == batchResult,
      "ledger after dim arrival must equal the batch operator")
  }

  test("interleaved chunks + redelivered batch stays byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_enr2").toString
    streaming.EnrichIngest.init(spark, dir)
    // chunk m: facts by orderkey mod, dims by custkey mod — the mods
    // disagree, so some facts precede their dim (upgrade path) and
    // some dims precede their facts (immediate-match path)
    def chunk(m: Int) = envOf(
      facts.where(pmod(col("o_orderkey"), lit(3)) === m),
      dims.where(pmod(col("c_custkey"), lit(3)) === (2 - m)))
    streaming.EnrichIngest.processBatch(spark, dir, chunk(0), 0L)
    streaming.EnrichIngest.processBatch(spark, dir, chunk(1), 1L)
    streaming.EnrichIngest.processBatch(spark, dir, chunk(1), 1L) // redelivery
    streaming.EnrichIngest.processBatch(spark, dir, chunk(2), 2L)
    assert(got(dir) == batchResult)
  }

  test("enrich ingest (twin #41): chunked file stream, killed between chunks == batch op") {
    import java.nio.file.{Files => JFiles}
    val base = JFiles.createTempDirectory("graft_enr3").toString
    val dir = s"$base/store"
    streaming.EnrichIngest.init(spark, dir)
    val srcDir = s"$base/src"
    (0 to 3).foreach { m =>
      envOf(facts.where(pmod(col("o_orderkey"), lit(4)) === m),
        dims.where(pmod(col("c_custkey"), lit(4)) === (3 - m)))
        .write.mode("append").parquet(srcDir)
      val stream = spark.readStream
        .schema("kind STRING, o_orderkey LONG, o_custkey LONG, " +
          "c_custkey LONG, c_name STRING, c_mktsegment STRING")
        .parquet(srcDir)
      val q = streaming.EnrichIngest.ingest(stream, dir)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(got(dir) == batchResult,
      "streamed enrichment must equal the batch operator at stream close")
  }

  test("ledger compaction: elected-fold fixed point, probe parity vs a never-compacted twin") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_enr4a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_enr4b").toString
    for (dir <- Seq(dirA, dirB)) {
      streaming.EnrichIngest.init(spark, dir)
      streaming.EnrichIngest.processBatch(spark, dir,
        envOf(facts, dims.where(pmod(col("c_custkey"), lit(2)) === 0)), 0L)
    }
    // compact A mid-campaign (placeholders + half the upgrades logged)
    streaming.EnrichIngest.compact(spark, dirA)
    assert(spark.read.parquet(dirA + "/ledger").count() ==
      spark.read.parquet(dirA + "/ledger").select("o_orderkey").distinct().count(),
      "compaction must fold to one elected row per fact")
    // post-compaction appends (the rest of the dims, plus a replayed
    // batch) must fold identically on both stores
    for (dir <- Seq(dirA, dirB)) {
      streaming.EnrichIngest.processBatch(spark, dir,
        envOf(facts.limit(0), dims.where(pmod(col("c_custkey"), lit(2)) === 1)), 1L)
      streaming.EnrichIngest.processBatch(spark, dir,
        envOf(facts, dims.where(pmod(col("c_custkey"), lit(2)) === 0)), 0L) // replay
    }
    assert(got(dirA) == got(dirB), "compacted and never-compacted stores must agree")
    assert(got(dirA) == batchResult)
  }

  test("dim versions fold deterministically: intra-batch duplicates and cross-batch CDC updates") {
    import spark.implicits._
    def env(fs: Seq[(Long, Long)], ds: Seq[(Long, String, String)]) = envOf(
      fs.toDF("o_orderkey", "o_custkey"),
      ds.toDF("c_custkey", "c_name", "c_mktsegment"))
    def run(dir: String): Unit = {
      streaming.EnrichIngest.init(spark, dir)
      // batch 0: fact 1 + TWO versions of dim 10 in the same batch —
      // un-folded this emits two matched rows at one batch_id and the
      // ledger election ties nondeterministically
      streaming.EnrichIngest.processBatch(spark, dir,
        env(Seq((1L, 10L)), Seq((10L, "v-b", "SEG-B"), (10L, "v-a", "SEG-A"))), 0L)
      // batch 1: a CDC UPDATE of dim 10 (new attributes) + a LATE fact
      // on the same key — the late fact must see the batch-0 elected
      // version, not the update (first-enrolled-version-wins, the
      // ledger's own min-batch preference direction)
      streaming.EnrichIngest.processBatch(spark, dir,
        env(Seq((2L, 10L)), Seq((10L, "v-z", "SEG-Z"))), 1L)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_enr5").toString
    run(dir)
    val rows = got(dir)
    assert(rows.map(_.getLong(0)) == Seq(1L, 2L))
    // both facts: exactly one row each, matched, the lexicographic-min
    // intra-batch version of batch 0
    assert(rows.forall(r => r.getInt(4) == 1 && r.getString(2) == "v-a" &&
      r.getString(3) == "SEG-A"), rows.toString)
    // the raw ledger itself carries ONE emission per (fact, batch) —
    // the double-emit hazard, pinned at the log level, replay included
    streaming.EnrichIngest.processBatch(spark, dir,
      env(Seq((1L, 10L)), Seq((10L, "v-b", "SEG-B"), (10L, "v-a", "SEG-A"))), 0L) // replay
    val perBatch = spark.read.parquet(dir + "/ledger")
      .groupBy("o_orderkey", "batch_id", "o_custkey", "cust_name", "segment", "matched")
      .count().where(col("o_orderkey") === 1L && col("batch_id") === 0L).collect()
    assert(perBatch.length == 1 && perBatch.head.getLong(6) == 2L,
      s"replayed batch must re-emit the byte-identical single row: ${perBatch.toSeq}")
    // determinism across an independent campaign
    val dir2 = java.nio.file.Files.createTempDirectory("graft_enr5b").toString
    run(dir2)
    assert(got(dir2) == rows)
  }

  test("init into a previously used store dir clears the ledger") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_enr6").toString
    streaming.EnrichIngest.init(spark, dir)
    streaming.EnrichIngest.processBatch(spark, dir, envOf(
      Seq((1L, 10L)).toDF("o_orderkey", "o_custkey"),
      Seq((10L, "n", "SEG")).toDF("c_custkey", "c_name", "c_mktsegment")), 0L)
    assert(got(dir).nonEmpty)
    streaming.EnrichIngest.init(spark, dir) // new campaign, same dir
    assert(got(dir).isEmpty,
      "a re-initialized store must not carry the old campaign's emissions")
  }
}
