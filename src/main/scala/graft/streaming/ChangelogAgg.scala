package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Aggregation over a changelog input — the reference's scenario-6 shape
  * (GROUP BY + JSON_ARRAYAGG consuming CDC updates, SURVEY.md §7.4 risk 2).
  *
  * Spark's built-in streaming aggregation assumes append-only input: a
  * CDC update would double-count. The correct incremental pattern, per
  * micro-batch:
  *   1. upsert the batch's latest images into the keyed state table
  *      (retraction = replacing the old image);
  *   2. recompute the aggregate ONLY for the groups touched by this
  *      batch, from the post-upsert state;
  *   3. upsert those recomputed groups into the result table (update
  *      mode, keyed by the group columns).
  * Work per batch is proportional to touched groups, not table size —
  * the property that matters at 100 TB. Deletes retract naturally: the
  * key disappears from state, the group recomputes without it (a group
  * whose last row disappears is written with its aggregate over zero
  * rows filtered out — i.e. removed from the result).
  *
  * Caveat (documented, matching the reference's usage where group keys
  * are derived from the row's PK): if an UPDATE moves a row between
  * groups, the old group is found via the state table (pre-upsert scan
  * of the batch keys), so both sides recompute.
  */
object ChangelogAgg {

  /** @param decoded   streaming changelog (Debezium.decode output: row
    *                  image + `_op`)
    * @param keyCols   upsert key of the underlying table
    * @param versionCol monotone version column for latest-image dedup
    * @param groupCols the aggregation's GROUP BY columns
    * @param agg       aggregation over a (sub)table → one row per group
    */
  def run(decoded: DataFrame, keyCols: Seq[String], versionCol: String,
      groupCols: Seq[String], agg: DataFrame => DataFrame,
      statePath: String, resultPath: String, checkpoint: String): StreamingQuery =
    decoded.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, keyCols, versionCol, groupCols, agg, statePath, resultPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  private[graft] def processBatch(batch: DataFrame, keyCols: Seq[String],
      versionCol: String, groupCols: Seq[String], agg: DataFrame => DataFrame,
      statePath: String, resultPath: String): Unit = {
    val spark = batch.sparkSession

    // groups touched by the new images...
    val newGroups = batch.select(groupCols.map(col): _*).distinct()
    // ...plus the groups the touched keys belonged to before the upsert
    // (handles group-moving updates and deletes)
    val oldGroups = UpsertSink.readKeyedTable(spark, statePath) match {
      case Some(state) =>
        state.join(batch.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
          .select(groupCols.map(col): _*).distinct()
      case None => newGroups.limit(0)
    }
    // Materialize BEFORE the upsert swaps the state files — a lazy plan
    // would recompute against deleted files. Materialize DISTRIBUTED, to a
    // scratch parquet dir next to the state table, never to the driver: a
    // CDC burst can touch millions of groups, and a driver collect() of
    // that set is an OOM. The scratch write is proportional to
    // groups-touched-per-batch and is overwritten every batch.
    val affectedPath = statePath + ".affected"
    newGroups.unionByName(oldGroups).distinct()
      .write.mode("overwrite").parquet(affectedPath)
    val affected = spark.read.parquet(affectedPath)

    // 1. upsert latest images (deletes drop the key)
    UpsertSink.mergeBatch(batch.withColumn("_deleted", col("_op") === "d"),
      keyCols, versionCol, statePath, deleteCol = Some("_deleted"))

    // 2. recompute affected groups from post-upsert state
    val state = UpsertSink.readKeyedTable(spark, statePath)
      .getOrElse(sys.error(s"state table missing after merge: $statePath"))
    val recomputed = agg(state.join(affected, groupCols, "left_semi"))

    // 3. upsert recomputed groups into the result; groups that vanished
    // entirely are removed via tombstone
    val gone = affected.join(recomputed.select(groupCols.map(col): _*), groupCols, "left_anti")
    val upserts = recomputed.withColumn("_gone", lit(false))
      .unionByName(gone.select(
        (groupCols.map(col) :+ lit(true).as("_gone")) ++
          recomputed.columns.filterNot(c => groupCols.contains(c))
            .map(c => lit(null).as(c)): _*), allowMissingColumns = true)
    UpsertSink.mergeBatch(upserts.withColumn("_v", lit(0L)), groupCols, "_v",
      resultPath, deleteCol = Some("_gone"))
  }
}
