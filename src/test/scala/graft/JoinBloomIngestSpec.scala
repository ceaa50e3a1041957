package graft

/** Twin #35: streaming dim ingest maintains the join-pruning bloom ==
  * the batch operator, under kill-between-every-chunk restarts and
  * replayed appends. The filter is an OR-monoid, so chunked enrollment
  * must land byte-identical words to a one-shot enrollment, and the
  * prefiltered join must equal the batch `join_bloom_prefilter` rows
  * once the full dim has streamed through. */
class JoinBloomIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming dim ingest twin: chunked feed, killed between every chunk, join == batch op") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val rows = graft.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderpriority").collect()
      .map(r => s"""{"o_orderkey":${r.getLong(0)},"o_orderpriority":"${r.getString(1)}"}""")
      .toSeq
    val base = JFiles.createTempDirectory("graft_joinbloom_stream").toString
    val srcDir = s"$base/src"
    JFiles.createDirectories(JPaths.get(srcDir))
    val dir = s"$base/jbloom"
    // geometry frozen up front from planned capacity (the build corpus)
    graft.ops.SketchOps.buildJoinBloomGeom(spark, sf, dir)
    var nFile = 0
    rows.grouped(math.max(rows.size / 4, 1)).foreach { chunk =>
      JFiles.writeString(JPaths.get(srcDir, f"f$nFile%03d.json"),
        chunk.mkString("", "\n", "\n"))
      nFile += 1
      // a FRESH query per chunk, resumed from the shared checkpoint
      val in = spark.readStream
        .schema("o_orderkey LONG, o_orderpriority STRING").json(srcDir)
      val q = graft.streaming.JoinBloomIngest.ingest(in, dir)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // 1. chunked enrollment == one-shot enrollment, word for word (the
    //    OR monoid makes the append log path-independent)
    val oneShot = s"$base/oneshot"
    graft.ops.SketchOps.buildJoinBloomGeom(spark, sf, oneShot)
    graft.streaming.JoinBloomIngest.appendBatch(spark, oneShot,
      graft.Tables.orders(spark, sf))
    def mergedWords(d: String) =
      spark.read.parquet(d + "/words").groupBy("word_idx")
        .agg(org.apache.spark.sql.functions.expr("bit_or(word)").as("word"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mergedWords(dir) == mergedWords(oneShot),
      "chunked and one-shot enrollment built different filters")
    // 2. the prefiltered join over the maintained filter == the batch
    //    operator's rows
    val streamed = graft.streaming.JoinBloomIngest
      .prefilterFromIndex(spark, sf, dir).collect().toSeq
    val batch = ops.SketchOps.queries("join_bloom_prefilter")(spark, sf)
      .collect().toSeq
    assert(streamed == batch,
      s"prefilter over the maintained filter != batch operator (${streamed.size} vs ${batch.size} rows)")
    // 3. replayed append: re-enroll the FIRST chunk — OR idempotence
    //    absorbs it with no batch-id machinery
    val chunk0 = rows.take(math.max(rows.size / 4, 1))
    JFiles.writeString(JPaths.get(base, "replay.json"),
      chunk0.mkString("", "\n", "\n"))
    graft.streaming.JoinBloomIngest.appendBatch(spark, dir,
      spark.read.schema("o_orderkey LONG, o_orderpriority STRING")
        .json(s"$base/replay.json"))
    assert(mergedWords(dir) == mergedWords(oneShot),
      "a replayed enrollment changed the filter")
    val replayed = graft.streaming.JoinBloomIngest
      .prefilterFromIndex(spark, sf, dir).collect().toSeq
    assert(replayed == batch, "a replayed enrollment changed the join")
  }
}
