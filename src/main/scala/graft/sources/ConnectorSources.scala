package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.app.FlinkDdl
import graft.streaming.Debezium

/** Connector-option interpreter: maps a parsed Flink `WITH (...)` clause
  * to the Spark reader that serves it — the deployment half of the source
  * abstraction the offline harness stubs with parquet.
  *
  * The reference drives four connectors
  * (flink-applications/01-basic-jdbc.json:4 `'connector' = 'jdbc'`,
  * 03-kafka-cdc-flink-jdbc.json:8 kafka + `'scan.startup.mode' =
  * 'earliest-offset'`, 03-flink-cdc-jdbc.json postgres-cdc,
  * upsert-kafka sinks throughout). Resolution is split in two layers so
  * the option plumbing is unit-testable without a broker or database:
  *
  *  - [[plan]]: pure `TableDef → SourcePlan` — which connector, which
  *    Spark data source, which options. No SparkSession.
  *  - [[readerOptions]]: `SourcePlan → (format, options)` — the exact
  *    `.format(...).options(...)` a deployment issues.
  *  - [[decodeKafka]]: kafka-wire DataFrame (the fixed key/value/topic/...
  *    schema Spark's kafka source emits) → typed rows per the DDL's
  *    `value.format`. Testable by synthesizing wire rows.
  *  - [[resolve]]: glue the above into a live DataFrame. The jdbc branch
  *    runs end-to-end in tests against an embedded Derby database; the
  *    kafka branch is the one layer needing a live broker.
  */
object ConnectorSources {

  sealed trait SourcePlan { def format: String }

  /** `'connector' = 'jdbc'` → `spark.read.format("jdbc")`. Batch scan;
    * Spark pushes filters/projections into the database query. */
  case class JdbcScan(url: String, dbtable: String,
      user: Option[String], password: Option[String]) extends SourcePlan {
    def format = "jdbc"
  }

  /** `'connector' = 'kafka'` (or `'upsert-kafka'`) →
    * `spark.readStream.format("kafka")`. `startingOffsets` carries the
    * translated `scan.startup.mode`; `valueFormat` picks the decode
    * applied on top of the wire frame. */
  case class KafkaScan(bootstrap: String, topic: String,
      startingOffsets: String, valueFormat: String,
      keyFormat: Option[String], upsert: Boolean) extends SourcePlan {
    def format = "kafka"
  }

  /** `'connector' = 'postgres-cdc'`: Flink taps the WAL directly; the
    * Spark deployment consumes the Debezium topic the connector config
    * (kafka-connectors/orders-cdc.json) produces for the same table —
    * topic `server.schema.table`, debezium-json envelopes. `serverName`
    * and the broker address come from the connector/deployment config,
    * not the DDL, so both are resolver parameters with the reference's
    * defaults — without a bootstrap address Spark's kafka source cannot
    * build a runnable reader at all. */
  case class PgCdcScan(database: String, schema: String, table: String,
      serverName: String, bootstrap: String) extends SourcePlan {
    def format = "kafka"
    def topic: String = s"$serverName.$schema.$table"
  }

  /** Interpret the WITH-options of a parsed source DDL. Unknown
    * connectors fail loudly — a silently-parquet fallback would mask a
    * deployment misconfiguration. */
  def plan(td: FlinkDdl.TableDef,
      cdcServerName: String = "my_pg",
      cdcBootstrap: String = "kafka:9092"): SourcePlan = {
    val o = td.options
    def req(k: String): String = o.getOrElse(k,
      throw new IllegalArgumentException(
        s"source ${td.name}: connector '${td.connector}' requires option '$k'"))
    td.connector match {
      case "jdbc" =>
        JdbcScan(req("url"), req("table-name"), o.get("username"), o.get("password"))
      case c @ ("kafka" | "upsert-kafka") =>
        KafkaScan(
          bootstrap = req("properties.bootstrap.servers"),
          topic = req("topic"),
          startingOffsets = o.get("scan.startup.mode") match {
            case Some("earliest-offset") | None => "earliest"
            case Some("latest-offset") => "latest"
            case Some(other) => throw new IllegalArgumentException(
              s"source ${td.name}: unsupported scan.startup.mode '$other'")
          },
          valueFormat = o.getOrElse("value.format", o.getOrElse("format", "json")),
          keyFormat = o.get("key.format"),
          upsert = c == "upsert-kafka")
      case "postgres-cdc" =>
        PgCdcScan(req("database-name"), req("schema-name"), req("table-name"),
          cdcServerName, cdcBootstrap)
      case other =>
        throw new IllegalArgumentException(
          s"source ${td.name}: unknown connector '$other'")
    }
  }

  /** The exact Spark reader options for a plan. JDBC credentials ride as
    * `user`/`password` (Spark's names for Flink's username/password). */
  def readerOptions(p: SourcePlan): Map[String, String] = p match {
    case j: JdbcScan =>
      Map("url" -> j.url, "dbtable" -> j.dbtable) ++
        j.user.map("user" -> _) ++ j.password.map("password" -> _)
    case k: KafkaScan =>
      Map("kafka.bootstrap.servers" -> k.bootstrap, "subscribe" -> k.topic,
        "startingOffsets" -> k.startingOffsets)
    case c: PgCdcScan =>
      // consumed via the Debezium topic; offsets from earliest so the
      // snapshot reads the whole changelog (the connector's snapshot mode)
      Map("kafka.bootstrap.servers" -> c.bootstrap,
        "subscribe" -> c.topic, "startingOffsets" -> "earliest")
  }

  /** Decode a kafka-wire frame (`key`/`value` binary + topic/partition/
    * offset/timestamp — Spark's kafka source schema) into rows of the
    * DDL's schema:
    *  - `debezium-json` → [[Debezium.decode]]: row image + `_op` +
    *    `_source_ts` (feeds `METADATA FROM 'value.source.timestamp'`) +
    *    `_tx_id`;
    *  - `json` → `from_json` against the DDL schema (scenario-5 consumes
    *    the raw envelope this way, 05-kafka-logical-msg-flink.json:4);
    *  - upsert-kafka sources: a null value is a tombstone for the JSON
    *    key → synthesized `_op = 'd'` carrying the key fields.
    */
  def decodeKafka(wire: DataFrame, p: KafkaScan, td: FlinkDdl.TableDef): DataFrame = {
    val text = wire.withColumn("value", col("value").cast("string"))
    p.valueFormat match {
      case "debezium-json" =>
        Debezium.decode(text, td.schema)
      case "json" if p.upsert =>
        // key join-back: tombstone rows only have the key image
        val keySchema = org.apache.spark.sql.types.StructType(
          td.schema.filter(f => td.primaryKey.contains(f.name)))
        text
          .withColumn("_key", from_json(col("key").cast("string"), keySchema))
          .withColumn("_row", from_json(col("value"), td.schema))
          .select(td.schema.fieldNames.map { f =>
            (if (td.primaryKey.contains(f)) coalesce(col(s"_row.$f"), col(s"_key.$f"))
             else col(s"_row.$f")).as(f)
          } :+ when(col("value").isNull, "d").otherwise("u").as("_op"): _*)
      case "json" =>
        text.withColumn("_row", from_json(col("value"), td.schema))
          .select(td.schema.fieldNames.map(f => col(s"_row.$f")): _*)
      case other =>
        throw new IllegalArgumentException(
          s"source ${td.name}: unsupported value.format '$other'")
    }
  }

  /** Encode rows for an upsert-kafka SINK (the reference's eight sinks,
    * e.g. 06-flink-cdc-temporal-join.json `order_output`): JSON key from
    * the DDL's PRIMARY KEY, JSON value from the full row — or a NULL
    * value (tombstone) when `deleteCol` marks a retraction. The output
    * carries exactly the `key`/`value`/`topic` columns Spark's kafka
    * writer consumes; [[decodeKafka]] with the same DDL round-trips it. */
  def encodeKafka(df: DataFrame, td: FlinkDdl.TableDef,
      deleteCol: Option[String] = None): DataFrame = {
    require(td.connector == "upsert-kafka" || td.connector == "kafka",
      s"sink ${td.name}: connector '${td.connector}' is not a kafka sink")
    require(td.connector != "upsert-kafka" || td.primaryKey.nonEmpty,
      s"sink ${td.name}: upsert-kafka requires a PRIMARY KEY")
    val topic = td.options.getOrElse("topic", td.name)
    val keyJson = to_json(struct(td.primaryKey.map(col): _*)).cast("binary")
    val rowJson = to_json(struct(td.schema.fieldNames.map(col): _*)).cast("binary")
    val value = deleteCol match {
      case Some(dc) => when(col(dc), lit(null).cast("binary")).otherwise(rowJson)
      case None => rowJson
    }
    df.select(keyJson.as("key"), value.as("value"), lit(topic).as("topic"))
  }

  /** Execute a plan against the live external system. The jdbc branch is
    * tested against a real (embedded Derby) database; the kafka branches
    * read the broker by default, and every decision they make is pinned
    * by the [[plan]]/[[readerOptions]]/[[decodeKafka]] tests.
    *
    * Sandbox note: the live kafka `.load()` has never run here — neither
    * spark-sql-kafka nor an embeddable kafka-server jar exists in
    * /opt/spark/jars or the offline coursier cache (verified round 5).
    * ConnectorSpec carries a feature-detected test that cancels visibly
    * on that absence and boots an in-JVM broker the day the jars appear;
    * until then the branch is proven row-identical to the Derby-jdbc
    * branch on recorded wire frames (AppSpecSpec).
    *
    * `wireSource` substitutes a recorded kafka-wire frame (the fixed
    * key/value/topic/... schema, [[CdcFixtures.wireSchema]]) for the live
    * broker reader — the replay/backfill deployment mode, and the seam
    * that lets tests drive the full kafka branch (plan → options →
    * decode) from files with no broker. Only the `.load()` itself is
    * substituted; topic selection and decoding are the same code path. */
  def resolve(spark: SparkSession, td: FlinkDdl.TableDef,
      cdcServerName: String = "my_pg",
      cdcBootstrap: String = "kafka:9092",
      wireSource: Option[SourcePlan => DataFrame] = None): DataFrame =
    plan(td, cdcServerName, cdcBootstrap) match {
      case j: JdbcScan =>
        spark.read.format(j.format).options(readerOptions(j)).load()
      case k: KafkaScan =>
        val wire = wireSource.map(_(k)).getOrElse(
          spark.readStream.format(k.format).options(readerOptions(k)).load())
        decodeKafka(wire, k, td)
      case c: PgCdcScan =>
        // same wire + decode as an explicit kafka debezium source
        val asKafka = KafkaScan(bootstrap = c.bootstrap, topic = c.topic,
          startingOffsets = "earliest", valueFormat = "debezium-json",
          keyFormat = None, upsert = false)
        val wire = wireSource.map(_(c)).getOrElse(
          spark.readStream.format(c.format).options(readerOptions(c)).load())
        decodeKafka(wire, asKafka, td)
    }
}
