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
    // latest-wins ACROSS batch and existing table: CDC delivery is
    // at-least-once and may replay old events, so an image (or tombstone)
    // only applies if its version is >= what the table already holds.
    // Ties prefer the batch (the result-table use case carries a constant
    // version and must take the fresh recompute).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(versionCol).desc +: col("_from_batch").desc
        +: tiebreakCols.map(col(_).desc)): _*)
    val delCol = deleteCol.getOrElse("_no_delete")
    val batchTagged = (deleteCol match {
      case Some(c) => batch.withColumn(c, coalesce(col(c), lit(false)))
      case None => batch.withColumn(delCol, lit(false))
    }).withColumn("_from_batch", lit(1))

    val existing: Option[DataFrame] = readKeyedTable(spark, path)

    val merged = existing match {
      case Some(ex) =>
        val touchedKeys = batchTagged.select(keyCols.map(col): _*).distinct()
        val exTouched = ex.join(touchedKeys, keyCols, "left_semi")
          .withColumn(delCol, lit(false)).withColumn("_from_batch", lit(0))
        val winners = exTouched
          .unionByName(batchTagged.select(exTouched.columns.map(col): _*))
          .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
          .where(!col(delCol)).drop("_rn", delCol, "_from_batch")
        ex.join(touchedKeys, keyCols, "left_anti").unionByName(winners)
      case None =>
        batchTagged
          .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
          .where(!col(delCol)).drop("_rn", delCol, "_from_batch")
    }
    // Crash-safe swap: the previous table is renamed to .bak (not deleted)
    // before the new one moves in, so at every instant either the target
    // or the backup holds a complete table; readKeyedTable falls back to
    // the backup. (A production deployment uses a table format with
    // atomic commits — Delta/Iceberg — or a compacted Kafka topic; this
    // keeps the parquet harness honest about crashes.)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val bak = new Path(path + ".bak")
    val target = new Path(path)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(target)) fs.rename(target, bak)
    fs.rename(tmp, target)
    if (fs.exists(bak)) fs.delete(bak, true)
  }

  /** Read a keyed table written by [[mergeBatch]], falling back to the
    * .bak copy if a crash happened mid-swap. */
  def readKeyedTable(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) Some(spark.read.parquet(path))
    else if (fs.exists(new Path(path + ".bak"))) Some(spark.read.parquet(path + ".bak"))
    else None
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
