package graft

/** Twin #19: streaming drift-monitor maintenance == the batch operator,
  * byte for byte, under kill-between-every-chunk restarts and replayed
  * appends (the TextIndexIngest contract re-proven for the drift
  * family). */
class DriftIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming ingest twin: chunked feed, killed between every chunk, drift row == batch op") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val tuples = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).replace("\n", " "))).toSeq
    val rows = tuples.map { case (id, t) =>
      val esc = t.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"doc_id":$id,"text":"$esc"}"""
    }
    val base = JFiles.createTempDirectory("graft_drift_stream").toString
    val srcDir = s"$base/src"
    JFiles.createDirectories(JPaths.get(srcDir))
    val dir = s"$base/drift"
    var nFile = 0
    rows.grouped(math.max(rows.size / 4, 1)).foreach { chunk =>
      JFiles.writeString(JPaths.get(srcDir, f"f$nFile%03d.json"),
        chunk.mkString("", "\n", "\n"))
      nFile += 1
      // a FRESH query per chunk, resumed from the shared checkpoint —
      // the file-source offsets are the only checkpointed state, the
      // partials directory carries everything else
      val docs = spark.readStream.schema("doc_id LONG, text STRING").json(srcDir)
      val q = graft.streaming.DriftIngest.ingest(docs, dir)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val streamed = graft.streaming.DriftIngest.driftFromPartials(spark, dir)
      .collect().toSeq
    val batch = ops.PipelineOps.queries("corpus_drift")(spark, sf).collect().toSeq
    assert(streamed == batch,
      s"streamed drift row != batch operator:\n$streamed\nvs\n$batch")
    // replayed append: re-deliver the FIRST batch's exact content under
    // its own batch id — the (batch_id, tok) dedup absorbs it
    import spark.implicits._
    val chunk0 = tuples.take(math.max(tuples.size / 4, 1))
    graft.streaming.DriftIngest.appendPartials(spark, dir,
      chunk0.toDF("doc_id", "text"), 0L)
    val replayed = graft.streaming.DriftIngest.driftFromPartials(spark, dir)
      .collect().toSeq
    assert(replayed == batch, "a replayed batch append changed the drift row")
  }
}
