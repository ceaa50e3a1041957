package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Diagnostic main: measured THROUGHPUT of the streaming layer at one
  * SF dir — rows/sec through each stateful shape fed as chunked
  * micro-batches via MemoryStream (memory sink, so the number is the
  * operator + state store, not an external system). Test scope like
  * AnnProbe: a measurement harness, not library surface. Run on a
  * quiet box.
  *
  * Context for the numbers: the reference's only quantitative latency
  * fact is the 6-66 MINUTE hourly batch it replaces, and its streaming
  * claim is qualitative ("as soon as an order is emitted",
  * README.md:251) at Flink parallelism 1. These probes put a measured
  * rows/sec on the equivalent Spark twins. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nChunks = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // streaming plans
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def run[A](tag: String, rows: Seq[A], mk: MemoryStream[A] => org.apache.spark.sql.DataFrame)(
        implicit enc: org.apache.spark.sql.Encoder[A]): Unit = {
      val input = MemoryStream[A]
      val q = mk(input).writeStream
        .format("memory").queryName(s"probe_$tag").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        rows.grouped(math.max(rows.size / nChunks, 1)).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val out = spark.table(s"probe_$tag").count()
        println(f"STREAM $tag%-16s rows=${rows.size}%7d  wall=$wall%7.2f s  " +
          f"rows/s=${rows.size / wall}%9.0f  batches=$nChunks  out=$out")
      } finally q.stop()
    }

    val events = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3).toSeq
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    // 1. session windows (the scenario-4 shape): watermarked session
    //    agg over the full event stream
    run[(Long, Long, Long)]("sessionize", events, { in =>
      in.toDF().toDF("user_id", "event_id", "us")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
        .withWatermark("ts", "1 second")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
    })

    // 2. exact content dedup at ingest (state: hash -> seen, horizon-GC'd)
    run[(Long, String, Long)]("dedup_exact", docs.map(t => (t._1, t._2, 1700000000000000L + t._1 * 1000000L)), { in =>
      graft.streaming.StreamingDedup.dedupExact(
        in.toDF().toDF("doc_id", "text", "us")
          .select(col("doc_id"), col("text"), timestamp_micros(col("us")).as("eventTime")),
        "eventTime", "30 days")
    })

    // 3. simhash NEAR-dedup at ingest (pigeonhole bucket state)
    run[(Long, String, Long)]("near_dedup", docs.map(t => (t._1, t._2, 1700000000000000L + t._1 * 1000000L)), { in =>
      graft.streaming.StreamingSimhash.pairs(
        in.toDF().toDF("doc_id", "text", "us")
          .select(col("doc_id"), col("text"), timestamp_micros(col("us")).as("eventTime")),
        "30 days").toDF()
    })

    // 3b. substring NEAR-dedup at ingest (fp-bucket state, per-fp pair
    //     evidence; the consumer-side >= 2 fold is stateless and not
    //     part of the stream measurement)
    run[(Long, String, Long)]("substring_dedup", docs.map(t => (t._1, t._2, 1700000000000000L + t._1 * 1000000L)), { in =>
      graft.streaming.StreamingSubstring.hits(
        in.toDF().toDF("doc_id", "text", "us")
          .select(col("doc_id"), col("text"), timestamp_micros(col("us")).as("eventTime")),
        "30 days").toDF()
    })

    // 4. restart-safe shard layout (two longs of state per shard)
    run[(Long, Long)]("shard_assign", docs.map(t => (t._1, t._3)), { in =>
      graft.streaming.ShardAssign.assign(
        in.toDF().toDF("doc_id", "n_chars")).toDF()
    })

    spark.stop()
  }
}
