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
  * micro-batch via foreachBatch. The table is laid out in hash buckets
  * of the key (`graft_bucket=K/` partition dirs) so a merge rewrites
  * ONLY the buckets containing batch keys — per-batch write cost is
  * O(touched buckets), not O(table), which is what survives a 100 TB
  * result table. At cluster scale the same merge logic targets a
  * compacted Kafka topic (append with key bytes; compaction collapses)
  * or a MERGE-capable table format — the per-batch dedup (latest image
  * per key) is the part that must be correct either way.
  */
object UpsertSink {

  /** Bucket count for the keyed-table layout. Each bucket is swapped as a
    * unit, so this bounds both merge parallelism and rewrite granularity;
    * at larger table sizes raise it so a single bucket stays well under
    * executor memory. Changing it on an existing table is safe only via a
    * full rewrite (the layout migration branch in mergeBatch). */
  val DefaultBuckets = 64

  private val BucketCol = "graft_bucket"

  /** Park suffix for WHOLE-TABLE swaps (first write / migration /
    * re-bucket) — distinct from the per-bucket `.bak` park because its
    * contents carry the old layout's bucket count and must never be
    * merged dir-by-dir into the new layout. */
  private val BakFullSuffix = ".bak.full"

  /** Layout marker persisted at the table root: the bucket count the
    * stored rows were hashed with. Underscore-prefixed so Spark's parquet
    * reader and the data-presence check both ignore it. */
  private val LayoutMarker = "_graft_nbuckets"

  private def bucketOf(keyCols: Seq[String], n: Int) =
    pmod(hash(keyCols.map(col): _*), lit(n))

  private def writeLayoutMarker(fs: org.apache.hadoop.fs.FileSystem,
      target: Path, n: Int): Unit = {
    val out = fs.create(new Path(target, LayoutMarker), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readLayoutMarker(fs: org.apache.hadoop.fs.FileSystem,
      target: Path): Option[Int] = {
    val p = new Path(target, LayoutMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        // read to EOF: a single read() may return short on non-local
        // filesystems, and truncated digits would misparse the bucket
        // count (silently forcing a full-table rewrite on every merge)
        val buf = new java.io.ByteArrayOutputStream()
        val bytes = new Array[Byte](32)
        var n = in.read(bytes)
        while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
        new String(buf.toByteArray, "UTF-8").trim.toIntOption
      } finally in.close()
    }
  }

  /** Hook for tests: invoked between a bucket's rename-out and rename-in
    * during the per-bucket swap, so a concurrent-reader test can observe
    * the table mid-swap deterministically. */
  private[graft] var midSwapPause: () => Unit = () => ()

  /** Whether a Delta Lake runtime can execute MERGE in this session:
    * the delta-spark jar must be on the classpath AND the session must
    * have been BUILT with Delta's SQL extension (it cannot be retrofitted
    * onto a live session). The extension is visible either through the
    * `spark.sql.extensions` conf (spark-submit style) or through the
    * injected parser's class (programmatic `.withExtensions(...)` never
    * sets the conf). Feature detection only — no compile-time dependency
    * on Delta anywhere in this file.
    *
    * Sandbox note: no delta-spark jar exists in /opt/spark/jars or the
    * offline coursier cache (verified round 5; the environment has zero
    * egress), so the MERGE branch's dispatch and guard are tested but
    * the MERGE SQL itself has never executed here — it runs the first
    * time the library meets a real Delta-enabled session. */
  def deltaAvailable(spark: SparkSession): Boolean =
    scala.util.Try(Class.forName("io.delta.sql.DeltaSparkSessionExtension")).isSuccess && {
      spark.conf.getOption("spark.sql.extensions")
        .exists(_.contains("DeltaSparkSessionExtension")) ||
        spark.sessionState.sqlParser.getClass.getName.toLowerCase.contains("delta")
    }

  /** Delta-format merge: same latest-per-key + tombstone + version-gate
    * semantics as the parquet path, expressed as one MERGE INTO statement
    * (real snapshot isolation, no swap protocol needed — this is the
    * production shape the parquet harness stands in for). Uses only SQL
    * strings and a `_delta_log` existence probe, so it compiles without
    * Delta and dispatches at runtime when [[deltaAvailable]]. */
  private def mergeBatchDelta(batch: DataFrame, keyCols: Seq[String],
      versionCol: String, path: String, deleteCol: Option[String],
      tiebreakCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    require(deltaAvailable(spark),
      "format=delta requires the delta-spark jar on the classpath and a session " +
        "built with spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension")
    val delCol = deleteCol.getOrElse("_no_delete")
    val tagged = (deleteCol match {
      case Some(c) => batch.withColumn(c, coalesce(col(c), lit(false)))
      case None => batch.withColumn(delCol, lit(false))
    })
    // latest image per key WITHIN the batch (at-least-once delivery can
    // carry several versions of a key in one micro-batch); the cross-
    // table version gate lives in the MERGE conditions
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(versionCol).desc +: tiebreakCols.map(col(_).desc)): _*)
    val latest = tagged.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path, "_delta_log"))) {
      latest.where(!col(delCol)).drop(delCol)
        .write.format("delta").mode("overwrite").save(path)
    } else {
      // schema evolution, mirroring the parquet path: columns the batch
      // ADDS are declared on the target first (ALTER TABLE — Delta
      // metadata-only), columns the batch LACKS ride as nulls so the
      // UPDATE/INSERT lists always reference the union surface
      val stored = spark.read.format("delta").load(path).schema.fields.toSeq
      val storedNames = stored.map(_.name).toSet
      val batchAdds = latest.schema.fields
        .filterNot(f => f.name == delCol || storedNames.contains(f.name))
      if (batchAdds.nonEmpty)
        spark.sql(s"ALTER TABLE delta.`$path` ADD COLUMNS (" +
          batchAdds.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ") + ")")
      val widened = stored.filterNot(f => latest.columns.contains(f.name))
        .foldLeft(latest)((acc, f) => acc.withColumn(f.name, lit(null).cast(f.dataType)))
      val dataCols = widened.columns.filterNot(_ == delCol).toSeq
      val view = s"graft_merge_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      widened.createOrReplaceTempView(view)
      try {
        val onClause = keyCols.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
        val setClause = dataCols.map(c => s"t.`$c` = s.`$c`").mkString(", ")
        val insCols = dataCols.map(c => s"`$c`").mkString(", ")
        val insVals = dataCols.map(c => s"s.`$c`").mkString(", ")
        // clause order matters: versions strictly older than the stored
        // row fall through every WHEN and are ignored (replay safety);
        // ties take the batch image, matching the parquet path
        spark.sql(
          s"""MERGE INTO delta.`$path` t USING $view s ON $onClause
             |WHEN MATCHED AND s.`$delCol` AND s.`$versionCol` >= t.`$versionCol` THEN DELETE
             |WHEN MATCHED AND NOT s.`$delCol` AND s.`$versionCol` >= t.`$versionCol` THEN UPDATE SET $setClause
             |WHEN NOT MATCHED AND NOT s.`$delCol` THEN INSERT ($insCols) VALUES ($insVals)
             |""".stripMargin)
      } finally spark.catalog.dropTempView(view)
    }
  }

  /** Merge one (micro-)batch into the keyed parquet table at `path`.
    * - batch rows are deduped to latest-per-key by (versionCol, tiebreak);
    * - rows with `deleteCol = true` act as tombstones;
    * - existing keys not in the batch are preserved;
    * - only buckets containing batch keys are rewritten (untouched bucket
    *   files are not opened, let alone rewritten).
    *
    * Crash story (parquet harness; production = Delta/Iceberg MERGE or a
    * compacted topic): each bucket flips old→new atomically via rename,
    * and a crash mid-swap leaves every bucket complete (old or new) with
    * displaced old buckets parked in `path.bak` for [[readKeyedTable]]'s
    * recovery. Cross-bucket atomicity is NOT claimed: after a crash some
    * buckets may be new and some restored-old, and correctness instead
    * comes from replay — the streaming checkpoint re-delivers the batch
    * and the version-gated latest-wins merge is idempotent, so the retry
    * converges every bucket to the new state. Concurrent readers of the
    * raw directory may transiently miss a mid-rename bucket; single-writer
    * single-reader-after-batch is the supported harness mode.
    */
  def mergeBatch(batch: DataFrame, keyCols: Seq[String], versionCol: String,
      path: String, deleteCol: Option[String] = None,
      tiebreakCols: Seq[String] = Nil,
      nBuckets: Int = DefaultBuckets,
      format: String = "parquet"): Unit = {
    format match {
      case "parquet" => // the zero-dependency default below
      case "delta" =>
        mergeBatchDelta(batch, keyCols, versionCol, path, deleteCol, tiebreakCols)
        return
      case other =>
        throw new IllegalArgumentException(
          s"unsupported upsert format '$other' (supported: parquet, delta)")
    }
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
    val batchTagged0 = (deleteCol match {
      case Some(c) => batch.withColumn(c, coalesce(col(c), lit(false)))
      case None => batch.withColumn(delCol, lit(false))
    }).withColumn("_from_batch", lit(1))
      .withColumn(BucketCol, bucketOf(keyCols, nBuckets))

    val existingRaw: Option[DataFrame] = readKeyedTableRaw(spark, path)

    // Schema evolution: a batch may ADD columns (upstream DDL change) or
    // arrive WITHOUT columns the table already carries. Widen BOTH sides
    // to the union of data columns (the missing side null-filled) and
    // drop the stored bucket column, which routes this merge through the
    // whole-table rewrite: a per-bucket swap would leave mixed-schema
    // bucket directories that a plain parquet read cannot assemble.
    // Schema changes are rare; one rewrite per change is the honest cost.
    val helperCols = Set(delCol, "_from_batch", BucketCol)
    def addMissing(df: DataFrame,
        want: Seq[org.apache.spark.sql.types.StructField]): DataFrame =
      want.filterNot(f => df.columns.contains(f.name)).foldLeft(df)((acc, f) =>
        acc.withColumn(f.name, lit(null).cast(f.dataType)))
    val batchDataFields = batchTagged0.schema.fields.filterNot(f => helperCols(f.name)).toSeq
    val exDataFields = existingRaw
      .map(_.schema.fields.filterNot(_.name == BucketCol).toSeq).getOrElse(Nil)
    // compare (name, type), not names alone: a TYPE change (upstream
    // widened int → long) must also take the full rewrite, or touched
    // buckets get the new physical type while untouched keep the old —
    // exactly the mixed-schema layout this branch exists to prevent
    def shape(fs: Seq[org.apache.spark.sql.types.StructField]) =
      fs.map(f => f.name -> f.dataType.catalogString).toSet
    val schemaChanged = existingRaw.isDefined &&
      shape(exDataFields) != shape(batchDataFields)
    val existing =
      if (!schemaChanged) existingRaw
      else existingRaw.map(ex => addMissing(
        if (ex.columns.contains(BucketCol)) ex.drop(BucketCol) else ex,
        batchDataFields))
    val batchTagged =
      if (!schemaChanged) batchTagged0 else addMissing(batchTagged0, exDataFields)

    // Buckets the batch touches — at most nBuckets values, so the driver
    // collect here is bounded by the layout constant, never by data size.
    val touched: Seq[Int] = batchTagged.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

    // A per-bucket merge is only sound when the stored rows were hashed
    // with the SAME bucket count the batch uses: otherwise a key's old
    // image can live in a bucket this batch never touches and survive as a
    // duplicate. The persisted layout marker is authoritative; a bucketed
    // table without one (pre-marker layout) counts as a mismatch and takes
    // the full-rewrite path once, which re-buckets and writes the marker.
    val fsEarly = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketCountMatches =
      readLayoutMarker(fsEarly, new Path(path)).contains(nBuckets)

    val merged = existing match {
      case Some(ex) if ex.columns.contains(BucketCol) && bucketCountMatches =>
        // Partition-pruned read: only touched bucket dirs are scanned.
        val exTouchedBuckets = ex.where(col(BucketCol).isin(touched: _*))
        val touchedKeys = batchTagged.select(keyCols.map(col): _*).distinct()
        val exTouched = exTouchedBuckets.join(touchedKeys, keyCols, "left_semi")
          .withColumn(delCol, lit(false)).withColumn("_from_batch", lit(0))
        val winners = exTouched
          .unionByName(batchTagged.select(exTouched.columns.map(col): _*))
          .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
          .where(!col(delCol)).drop("_rn", delCol, "_from_batch")
        // Bucket-resident keys NOT in the batch ride along unchanged —
        // the bucket is the rewrite unit.
        exTouchedBuckets.join(touchedKeys, keyCols, "left_anti")
          .unionByName(winners)
      case Some(exRaw) =>
        // Layout migration: a pre-bucketing flat table, OR a bucketed
        // table whose stored bucket count differs from this call's
        // nBuckets — merge the old way and rewrite everything once into
        // the (re-)bucketed layout.
        val ex = if (exRaw.columns.contains(BucketCol)) exRaw.drop(BucketCol) else exRaw
        val touchedKeys = batchTagged.select(keyCols.map(col): _*).distinct()
        val exTouched = ex.join(touchedKeys, keyCols, "left_semi")
          .withColumn(delCol, lit(false)).withColumn("_from_batch", lit(0))
          .withColumn(BucketCol, bucketOf(keyCols, nBuckets))
        val winners = exTouched
          .unionByName(batchTagged.select(exTouched.columns.map(col): _*))
          .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
          .where(!col(delCol)).drop("_rn", delCol, "_from_batch")
        ex.join(touchedKeys, keyCols, "left_anti")
          .withColumn(BucketCol, bucketOf(keyCols, nBuckets))
          .unionByName(winners)
      case None =>
        batchTagged
          .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
          .where(!col(delCol)).drop("_rn", delCol, "_from_batch")
    }

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val isBucketedMerge =
      existing.exists(_.columns.contains(BucketCol)) && bucketCountMatches
    val fullRewrite = !isBucketedMerge // fresh table, migration, or re-bucket

    val tmp = new Path(path + ".tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.write.mode("overwrite").partitionBy(BucketCol).parquet(tmp.toString)

    if (fullRewrite) {
      // Whole-table swap (first write / migration / re-bucket): same
      // protocol with the entire table as the single swap unit — parked
      // under the DISTINCT `.bak.full` name, because its bucket dirs
      // carry the OLD layout's bucket count: if readers or recovery
      // treated them as per-bucket parks (the `.bak` form), old-layout
      // buckets would be unioned or renamed into the new-layout table,
      // duplicating and resurrecting keys.
      val bak = new Path(path + BakFullSuffix)
      if (fs.exists(bak)) fs.delete(bak, true)
      if (fs.exists(target)) fs.rename(target, bak)
      fs.rename(tmp, target)
      writeLayoutMarker(fs, target, nBuckets)
      if (fs.exists(bak)) fs.delete(bak, true)
    } else {
      // Per-bucket swap: park old buckets in .bak, move new ones in.
      val bakRoot = new Path(path + ".bak")
      if (fs.exists(bakRoot)) fs.delete(bakRoot, true)
      fs.mkdirs(bakRoot)
      touched.foreach { b =>
        val dir = s"$BucketCol=$b"
        val tgtB = new Path(target, dir)
        val tmpB = new Path(tmp, dir)
        if (fs.exists(tgtB)) fs.rename(tgtB, new Path(bakRoot, dir))
        midSwapPause()
        // A bucket emptied by tombstones has no tmp dir — absence IS the
        // new state.
        if (fs.exists(tmpB)) fs.rename(tmpB, tgtB)
      }
      fs.delete(bakRoot, true)
      fs.delete(tmp, true)
    }
  }

  /** Read a keyed table written by [[mergeBatch]] (bucket column hidden).
    *
    * Crash/race consistency: when a swap is (or was) in flight — the
    * `.bak` park directory exists — the read does NOT mutate anything
    * (renaming parked buckets back would corrupt a LIVE writer's swap
    * protocol). Instead it assembles a complete snapshot from concrete
    * directories: every bucket present at the target plus every parked
    * bucket whose target dir is missing. Mid-swap each bucket is thus
    * seen exactly once, at either its old or new image — the same
    * per-bucket atomicity [[mergeBatch]] documents. Listing races with a
    * concurrent rename are absorbed by a bounded retry, and any snapshot
    * that references PARKED dirs is materialized eagerly before being
    * returned — the live writer deletes `.bak` the moment its swap
    * completes, so a lazy plan over parked paths could fail (or silently
    * lose buckets) at its first action; a FileNotFound during the
    * materialization itself means we raced the swap's completion, and
    * the retry re-lists onto the post-swap layout. The materialized
    * snapshot lives in executor storage — the price of a consistent
    * read in the parquet harness (production = a MERGE-capable table
    * format with real snapshot isolation). */
  def readKeyedTable(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val bakRoot = new Path(path + ".bak")
    var attempt = 0
    var result: Option[Option[DataFrame]] = None
    while (result.isEmpty) {
      attempt += 1
      try {
        result = Some {
          val bakFull = new Path(path + BakFullSuffix)
          if (fs.exists(bakFull)) {
            // whole-table swap in flight (or crashed): once the target
            // exists the new table is COMMITTED (the rename beat the
            // cleanup) — read it; otherwise the park IS the table. Never
            // union the two: the park carries the old bucket layout.
            if (fs.exists(target) && hasData(fs, target))
              Some(dropBucket(spark.read.parquet(path).localCheckpoint()))
            else if (hasData(fs, bakFull))
              Some(dropBucket(spark.read.parquet(bakFull.toString).localCheckpoint()))
            else None
          } else if (!fs.exists(bakRoot)) {
            // no swap in flight at the CHECK — but one may start before
            // the caller's first action, so materialize here too: the
            // snapshot contract is a consistent frame, not a lazy plan
            if (hasData(fs, target))
              Some(dropBucket(spark.read.parquet(path).localCheckpoint()))
            else None
          } else if (!fs.exists(target)) {
            // whole-table swap died after target->bak: bak IS the table
            if (hasData(fs, bakRoot))
              Some(dropBucket(spark.read.parquet(bakRoot.toString).localCheckpoint()))
            else None
          } else {
            val tgtDirs = fs.listStatus(target).map(_.getPath)
              .filter(_.getName.startsWith(s"$BucketCol="))
            val parked = fs.listStatus(bakRoot).map(_.getPath)
              .filter(p => p.getName.startsWith(s"$BucketCol=") &&
                !fs.exists(new Path(target, p.getName)))
            val dirs = (tgtDirs ++ parked).map(_.toString).sorted
            if (dirs.isEmpty) None
            // reading concrete bucket dirs skips partition discovery, so
            // the frame comes back without the bucket column — exactly
            // this method's contract. Eager localCheckpoint: see doc.
            else Some(spark.read.parquet(dirs: _*).localCheckpoint())
          }
        }
      } catch {
        case e: Throwable if attempt < 5 && causedByMissingFile(e) =>
          Thread.sleep(50L * attempt) // raced a rename/delete; re-list
      }
    }
    result.get
  }

  /** FileNotFound may surface directly (driver-side listing) or wrapped
    * in SparkException layers (task failure during materialization). */
  private def causedByMissingFile(e: Throwable): Boolean = {
    var cur = e
    var depth = 0
    while (cur != null && depth < 10) {
      if (cur.isInstanceOf[java.io.FileNotFoundException]) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  private def dropBucket(df: DataFrame): DataFrame =
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df

  private def hasData(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists(s =>
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))

  /** Read including the layout's bucket column, recovering from a crashed
    * swap first: any bucket parked in `.bak` whose target dir is missing
    * is restored (safe — the interrupted micro-batch replays and the
    * version-gated merge converges it forward). */
  private def readKeyedTableRaw(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val bakRoot = new Path(path + ".bak")
    // Recovery first, so every later read (and the next merge) sees a
    // complete table AT THE TARGET path and never holds a lazy plan over
    // parked files a subsequent swap would delete:
    // - whole-table swap (`.bak.full`) died before its commit rename:
    //   restore the park wholesale; died after: the target is the new
    //   table and the park is a stale OLD-LAYOUT copy — delete it (its
    //   bucket dirs must never be merged into the new layout);
    // - per-bucket swap (`.bak`) died mid-loop: restore each parked
    //   bucket whose target dir is missing (safe — the interrupted
    //   micro-batch replays and the version-gated merge converges it
    //   forward).
    val bakFull = new Path(path + BakFullSuffix)
    if (fs.exists(bakFull)) {
      if (!fs.exists(target)) fs.rename(bakFull, target)
      else fs.delete(bakFull, true)
    }
    if (fs.exists(bakRoot)) {
      if (!fs.exists(target)) fs.rename(bakRoot, target)
      else {
        fs.listStatus(bakRoot).foreach { st =>
          val tgtB = new Path(target, st.getPath.getName)
          if (st.getPath.getName.startsWith(s"$BucketCol=") && !fs.exists(tgtB))
            fs.rename(st.getPath, tgtB)
        }
        fs.delete(bakRoot, true)
      }
    }
    if (fs.exists(target) && fs.listStatus(target).exists(s =>
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")))
      Some(spark.read.parquet(path))
    else None
  }

  /** Attach the upsert sink to a streaming changelog. */
  def writeUpsertStream(decoded: DataFrame, keyCols: Seq[String],
      versionCol: String, path: String, checkpoint: String,
      deleteCol: Option[String] = None,
      format: String = "parquet"): StreamingQuery =
    decoded.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, keyCols, versionCol, path, deleteCol, format = format)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
