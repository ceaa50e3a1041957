package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium JSON envelope handling — the engine-explicit equivalent of
  * Flink's `'value.format' = 'debezium-json'`
  * (reference: flink-applications/03-kafka-cdc-flink-jdbc.json:8,
  * envelope fields modeled at 05-kafka-logical-msg-flink.json:4).
  */
object Debezium {

  /** Debezium `source` block (the subset the reference surfaces:
    * connector name, commit timestamp, table, transaction id / lsn —
    * 05-kafka-logical-msg-flink.json:4). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType), StructField("connector", StringType),
    StructField("name", StringType), StructField("ts_ms", LongType),
    StructField("snapshot", StringType), StructField("db", StringType),
    StructField("schema", StringType), StructField("table", StringType),
    StructField("txId", LongType), StructField("lsn", LongType),
    StructField("xmin", LongType)))

  /** Full envelope for a given row schema. */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema), StructField("after", rowSchema),
    StructField("source", sourceSchema), StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Decode a stream/batch of raw envelope JSON strings into changelog
    * rows: the row image (after for c/u/r, before for d), `_op`, the
    * source commit time as `_source_ts` (the METADATA column of
    * 06-flink-cdc-temporal-join.json:4), and `_tx_id` for
    * transaction-aware consumers (README.md:486).
    */
  def decode(raw: DataFrame, rowSchema: StructType, valueCol: String = "value"): DataFrame =
    raw
      .withColumn("_env", from_json(col(valueCol), envelopeSchema(rowSchema)))
      .withColumn("_row",
        when(col("_env.op") === "d", col("_env.before")).otherwise(col("_env.after")))
      .withColumn("_op", col("_env.op"))
      .withColumn("_source_ts", timestamp_millis(col("_env.source.ts_ms")))
      .withColumn("_tx_id", col("_env.source.txId"))
      .select((rowSchema.fieldNames.map(f => col(s"_row.$f")) ++
        Seq(col("_op"), col("_source_ts"), col("_tx_id"))): _*)

  /** [[decode]] with poison-message quarantine instead of silent nulls:
    * a value whose envelope fails to parse (corrupt bytes, truncated
    * message, non-envelope JSON) or that lacks an `op` is flagged
    * `_quarantined` with null row fields and its raw bytes preserved in
    * `_raw` — the caller routes those to a dead-letter sink and the good
    * rows flow on. An at-least-once pipeline must never stall on one bad
    * message, and silently decoding a corrupt envelope as all-null row
    * fields (what plain from_json does) poisons downstream aggregates
    * instead of isolating the message. */
  def decodeFlagged(raw: DataFrame, rowSchema: StructType,
      valueCol: String = "value"): DataFrame = {
    val q = col("_quarantined")
    raw
      .withColumn("_env", from_json(col(valueCol), envelopeSchema(rowSchema)))
      .withColumn("_quarantined", col("_env").isNull || col("_env.op").isNull)
      .withColumn("_row",
        when(col("_env.op") === "d", col("_env.before")).otherwise(col("_env.after")))
      .select((rowSchema.fieldNames.map(f =>
        when(q, lit(null)).otherwise(col(s"_row.$f")).as(f)) ++
        Seq(when(q, lit(null)).otherwise(col("_env.op")).as("_op"),
          when(q, lit(null)).otherwise(timestamp_millis(col("_env.source.ts_ms"))).as("_source_ts"),
          when(q, lit(null)).otherwise(col("_env.source.txId")).as("_tx_id"),
          q, col(valueCol).as("_raw"))): _*)
  }

  /** Collapse a decoded changelog to the latest image per key (deletes
    * produce no row) — what a keyed upsert sink needs per micro-batch
    * (README.md:260-301). Deterministic via the (version, tiebreak)
    * ordering. One shuffle on the key. */
  def latestImagePerKey(decoded: DataFrame, keyCols: Seq[String],
      versionCol: String, tiebreakCols: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(versionCol).desc +: tiebreakCols.map(col(_).desc)): _*)
    decoded
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("_op") =!= "d")
      .drop("_rn")
  }
}
