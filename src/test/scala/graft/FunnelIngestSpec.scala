package graft

import org.apache.spark.sql.Row

/** Twin #33: streaming funnel-accounting maintenance == the batch
  * operator, byte for byte, under kill-between-every-chunk restarts
  * and replayed appends (the DriftIngest directory-as-state contract
  * re-proven for the curation-funnel family — meta + shingle state
  * appended per batch, the five-stage fold shared verbatim). */
class FunnelIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming ingest twin: chunked feed, killed between every chunk, funnel == batch op") {
    import java.nio.file.{Files => JFiles}
    val docsDf = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
    val all = docsDf.collect().toSeq
    val schema = docsDf.schema
    val base = JFiles.createTempDirectory("graft_funnel_stream").toString
    val srcDir = s"$base/src"
    val dir = s"$base/funnel"
    def chunkDf(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val chunks = all.grouped(math.max(all.size / 4, 1)).toSeq
    chunks.foreach { chunk =>
      // parquet feed, not JSON: the funnel's md5/quality/token stages
      // are byte-sensitive to the text, so the transport must
      // round-trip it exactly
      chunkDf(chunk).coalesce(1).write.mode("append").parquet(srcDir)
      // a FRESH query per chunk, resumed from the shared checkpoint —
      // the file-source offsets are the only checkpointed state, the
      // meta/shingle directories carry everything else
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = graft.streaming.FunnelIngest.ingest(src, dir)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val streamed = graft.streaming.FunnelIngest.funnelFromState(spark, dir)
      .collect().toSeq
    val batch = ops.PipelineOps.queries("corpus_funnel")(spark, sf)
      .collect().toSeq
    assert(streamed == batch,
      s"streamed funnel != batch operator:\n$streamed\nvs\n$batch")
    // replayed append: re-deliver the FIRST batch's exact content under
    // its own batch id — meta dedups by doc_id, shingles by (doc_id,
    // sh), so the retry is invisible to the report
    graft.streaming.FunnelIngest.appendState(spark, dir, chunkDf(chunks.head), 0L)
    val replayed = graft.streaming.FunnelIngest.funnelFromState(spark, dir)
      .collect().toSeq
    assert(replayed == batch, "a replayed batch append changed the funnel")
  }
}
