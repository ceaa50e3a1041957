package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Standalone Debezium envelope generator driven by the connector config
  * shape the reference deploys (kafka-connectors/orders-cdc.json:1-15:
  * `database.server.name`, `database.dbname`, `table.include.list`,
  * filtered publication). One generator, reused by every test that needs
  * envelope fixtures, instead of per-test inline JSON — and a living spec
  * of the wire contract: topic naming `server.schema.table`, include-list
  * filtering, envelope field layout (05-kafka-logical-msg-flink.json:4).
  */
object CdcFixtures {

  /** The subset of the Debezium Postgres connector config that shapes the
    * wire output. `includeList` entries are `schema.table`. */
  case class ConnectorConfig(name: String, serverName: String,
      database: String, includeList: Seq[String]) {

    def topicFor(schema: String, table: String): String = {
      require(includeList.contains(s"$schema.$table"),
        s"table $schema.$table not in connector $name include list " +
          s"(${includeList.mkString(",")}) — a filtered publication emits no topic for it")
      s"$serverName.$schema.$table"
    }
  }

  object ConnectorConfig {
    private val mapper = new ObjectMapper()

    /** Parse the reference's connector JSON (kafka-connectors dir). */
    def fromJson(json: String): ConnectorConfig = {
      val root = mapper.readTree(json)
      def req(k: String): String = {
        val n = root.get(k)
        require(n != null, s"connector config missing '$k'")
        n.asText()
      }
      ConnectorConfig(req("name"), req("database.server.name"),
        req("database.dbname"),
        req("table.include.list").split(",").map(_.trim).toSeq)
    }
  }

  /** One Debezium envelope JSON string. `rowJson` is the row image (the
    * caller renders it — keeps the generator schema-generic); op `d`
    * places it in `before`, everything else in `after`. */
  def envelope(cfg: ConnectorConfig, schema: String, table: String,
      op: String, rowJson: String, tsMs: Long, txId: Long): String = {
    require(cfg.includeList.contains(s"$schema.$table"),
      s"table $schema.$table not captured by connector ${cfg.name}")
    val (before, after) = if (op == "d") (rowJson, "null") else ("null", rowJson)
    s"""{"before":$before,"after":$after,"source":{"version":"2","connector":"postgresql","name":"${cfg.serverName}","ts_ms":$tsMs,"snapshot":"false","db":"${cfg.database}","schema":"$schema","table":"$table","txId":$txId,"lsn":${txId * 100},"xmin":null},"op":"$op","ts_ms":$tsMs}"""
  }

  /** One changelog event to render onto the wire. `keyJson` null ⇒ no
    * message key (Debezium always keys by PK; null is for plain-JSON
    * topics). */
  case class Event(op: String, keyJson: String, rowJson: String,
      tsMs: Long, txId: Long)

  /** The fixed schema Spark's kafka source emits — synthesized wire rows
    * must match it so [[ConnectorSources.decodeKafka]] sees exactly what
    * it would see from a broker. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Render a table's changelog as a kafka-wire DataFrame on the topic
    * the connector would produce: envelopes in `value`, key JSON in
    * `key`, offsets in event order, all partitions 0 (single-partition
    * fixture — ordering guarantees match Debezium's per-key ordering). */
  def kafkaWire(spark: SparkSession, cfg: ConnectorConfig, schema: String,
      table: String, events: Seq[Event]): DataFrame = {
    val topic = cfg.topicFor(schema, table)
    val rows = events.zipWithIndex.map { case (e, i) =>
      Row(
        Option(e.keyJson).map(_.getBytes("UTF-8")).orNull,
        envelope(cfg, schema, table, e.op, e.rowJson, e.tsMs, e.txId)
          .getBytes("UTF-8"),
        topic, 0, i.toLong, new java.sql.Timestamp(e.tsMs), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), wireSchema)
  }
}
