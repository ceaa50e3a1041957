package graft

/** Twin #20: streaming model scoring at ingest == the batch apply, row
  * for row, under kill-between-every-chunk restarts and a re-delivered
  * batch — with the model trained ONCE over the standing corpus by the
  * batch trainer (the train-offline / score-online split the family's
  * scaladoc names as the production shape). */
class ModelScoreIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming scores under the standing model: chunked feed, killed between chunks, == batch apply") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val wm = streaming.ModelScoreIngest.standingModel(spark, sf)
    assert(wm.length == ops.ClassifierOps.QcWidth)

    val tuples = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).replace("\n", " "))).toSeq
    val rows = tuples.map { case (id, t) =>
      val esc = t.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"doc_id":$id,"text":"$esc"}"""
    }
    val base = JFiles.createTempDirectory("graft_qscore_stream").toString
    val srcDir = s"$base/src"
    JFiles.createDirectories(JPaths.get(srcDir))
    val dir = s"$base/model_scores"
    var nFile = 0
    rows.grouped(math.max(rows.size / 4, 1)).foreach { chunk =>
      JFiles.writeString(JPaths.get(srcDir, f"f$nFile%03d.json"),
        chunk.mkString("", "\n", "\n"))
      nFile += 1
      // a FRESH query per chunk, resumed from the shared checkpoint —
      // scoring is stateless, so the file-source offsets are the ONLY
      // checkpointed state
      val docs = spark.readStream.schema("doc_id LONG, text STRING").json(srcDir)
      val q = streaming.ModelScoreIngest.ingest(docs, dir, wm)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val streamed = streaming.ModelScoreIngest.scoresFromDir(spark, dir)
      .orderBy("doc_id").collect().toSeq
    // the batch apply trains on the SAME corpus the standing model saw,
    // so the standing model IS apply's model and rows must match exactly
    val batch = ops.ClassifierOps.queries("quality_classifier_apply")(spark, sf)
      .collect().toSeq
    assert(streamed == batch,
      s"streamed scores != batch apply (first diff: ${
        streamed.zip(batch).find { case (a, b) => a != b }})")

    // re-delivered batch: append the FIRST chunk's scores again under
    // its own batch id — byte-identical rows, the doc_id dedup absorbs it
    import spark.implicits._
    val chunk0 = tuples.take(math.max(tuples.size / 4, 1))
    streaming.ModelScoreIngest.appendScores(spark, dir,
      chunk0.toDF("doc_id", "text"), wm, 0L)
    val replayed = streaming.ModelScoreIngest.scoresFromDir(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(replayed == batch, "a replayed batch append changed the scores")
  }
}
