package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Keyed upsert sink — the engine's equivalent of Flink's upsert-kafka
  * sink (reference: 01-basic-jdbc.json:26): latest value per key wins,
  * a null/tombstone marker deletes the key.
  *
  * Local/test materialization is a parquet "keyed table" merged per
  * micro-batch via foreachBatch. At cluster scale the same merge logic
  * targets a compacted Kafka topic (append with key bytes; compaction
  * collapses) or a MERGE-capable table format — the per-batch dedup
  * (latest image per key) is the part that must be correct either way.
  */
object UpsertSink {

  /** Merge one (micro-)batch into the keyed parquet table at `path`.
    * - batch rows are deduped to latest-per-key by (versionCol, tiebreak);
    * - rows with `deleteCol = true` act as tombstones;
    * - existing keys not in the batch are preserved.
    * The swap is write-to-tmp + rename so a concurrent reader never sees
    * a half-written table.
    */
  def mergeBatch(batch: DataFrame, keyCols: Seq[String], versionCol: String,
      path: String, deleteCol: Option[String] = None,
      tiebreakCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(versionCol).desc +: tiebreakCols.map(col(_).desc)): _*)
    val latest = batch
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing: Option[DataFrame] =
      if (fs.exists(new Path(path))) Some(spark.read.parquet(path)) else None

    val survivors = deleteCol match {
      case Some(c) => latest.where(!coalesce(col(c), lit(false))).drop(c)
      case None => latest
    }
    val merged = existing match {
      case Some(ex) =>
        // old rows whose key is untouched this batch + the new images
        ex.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(survivors.select(ex.columns.map(col): _*))
      case None => survivors
    }
    val tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val target = new Path(path)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(new Path(tmp), target)
  }

  /** Attach the upsert sink to a streaming changelog. */
  def writeUpsertStream(decoded: DataFrame, keyCols: Seq[String],
      versionCol: String, path: String, checkpoint: String,
      deleteCol: Option[String] = None): StreamingQuery =
    decoded.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, keyCols, versionCol, path, deleteCol)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
