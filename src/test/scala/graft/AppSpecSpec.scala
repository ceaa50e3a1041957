package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.app.{AppRunner, AppSpec, FlinkDdl, FlinkSqlShim}
import graft.model.Pizzeria

/** Runs the REAL reference application specs (read from /root/reference,
  * the declared API surface) through the AppSpec interpreter against the
  * seed fixtures, checking the FIXTURES.md goldens. Skips gracefully if
  * the reference checkout is absent. */
class AppSpecSpec extends SparkSpec {

  private val refDir = "/root/reference/flink-applications"

  private def loadSpec(name: String): Option[AppSpec] = {
    val p = Paths.get(refDir, name)
    if (Files.exists(p)) Some(AppSpec.fromJson(Files.readString(p))) else None
  }

  private lazy val seed = Pizzeria.seed(spark)

  /** Resolve the scenario-1 JDBC sources to the seed tables (note the
    * reference's own 'table_assigment' typo in the DDL option — resolution
    * is by the declared table-name, typo included). */
  private def pizzeriaResolver(td: FlinkDdl.TableDef): DataFrame =
    td.options.getOrElse("table-name", td.name) match {
      case "tables" => seed.tables
      case "pizzas" => seed.pizzas
      case "clients" => seed.clients
      case "table_assignment" | "table_assigment" => seed.assignments
      case "orders" => seed.orders
      case other => fail(s"unexpected table-name $other")
    }

  test("DDL parse: scenario-6 orders source (PK, metadata, strict watermark)") {
    loadSpec("06-flink-cdc-temporal-join.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        val td = spec.sources.map(s => FlinkDdl.parse(s.createTable))
          .find(_.name == "src_orders").get
        assert(td.primaryKey == Seq("id"))
        assert(td.watermark.contains(FlinkDdl.WatermarkDef("event_time", "0 seconds")))
        assert(td.metadata.map(_.name) == Seq("event_time"))
        assert(td.schema.fieldNames.toSeq ==
          Seq("id", "table_assignment_id", "order_time", "pizzas"))
        assert(td.connector == "kafka")
        assert(td.options("value.format") == "debezium-json")
    }
  }

  test("DDL parse: nested ROW schema of the scenario-5 message source") {
    loadSpec("05-kafka-logical-msg-flink.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        val td = FlinkDdl.parse(spec.sources.head.createTable)
        val src = td.schema("source").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        assert(src.fieldNames.contains("txId") && src.fieldNames.contains("table"))
        val msg = td.schema("message").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        assert(msg.fieldNames.toSeq == Seq("prefix", "content"))
    }
  }

  test("DDL parse: comparison operators in computed columns don't corrupt the split") {
    // '<'/'>' count as nesting only after a type constructor — a bare
    // comparison in a computed column must not eat the following commas.
    val td = FlinkDdl.parse(
      """CREATE TABLE t (
        |  id INT,
        |  price DOUBLE,
        |  tags ARRAY<ROW<k STRING, v INT>>,
        |  is_big AS price > 5,
        |  is_small AS price < 2,
        |  PRIMARY KEY (id) NOT ENFORCED
        |) WITH ('connector' = 'datagen')""".stripMargin)
    assert(td.cols.map(_.name) == Seq("id", "price", "tags"))
    assert(td.cols.last.sparkType == "ARRAY<STRUCT<k: STRING, v: INT>>")
    assert(td.computed == Seq(
      FlinkDdl.ComputedCol("is_big", "price > 5"),
      FlinkDdl.ComputedCol("is_small", "price < 2")))
    assert(td.primaryKey == Seq("id"))
  }

  test("scenario 1 app spec runs end-to-end (incl. the ARRAYAGG erratum fix)") {
    loadSpec("01-basic-jdbc.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        // injected clock 21:30 => window (21:00, 22:00] => orders {2,3,4}
        val res = AppRunner.run(spark, spec, pizzeriaResolver,
          evalTime = Some("2023-09-23 21:30:00"))
        assert(res.sink.map(_.name).contains("order_output"))
        assert(res.sink.map(_.primaryKey).contains(Seq("order_id")))
        val rows = res.df.collect()
        val byId = rows.map(r => r.getInt(0) -> (r.getString(1), r.getString(3))).toMap
        assert(byId.keySet == Set(2, 3, 4))
        assert(byId(2)._1 == "Wall Smith")
        // UNNEST duplicates preserved: order 2 = [1,1,1,1] -> 4 elements
        assert(byId(2)._2 ==
          """[{"pizza":"Master Splinter","price":8},{"pizza":"Master Splinter","price":8},{"pizza":"Master Splinter","price":8},{"pizza":"Master Splinter","price":8}]""")
    }
  }

  test("scenario 1 through a REAL jdbc database (embedded Derby end-to-end)") {
    loadSpec("01-basic-jdbc.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        import graft.sources.ConnectorSources
        val url = "jdbc:derby:memory:pizzeria;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          st.execute("CREATE TABLE tables (id INT, name VARCHAR(32), seats INT)")
          graft.model.Pizzeria.tables.foreach(t =>
            st.execute(s"INSERT INTO tables VALUES (${t.id},'${t.name}',${t.seats})"))
          st.execute("CREATE TABLE pizzas (id INT, name VARCHAR(32), price INT)")
          graft.model.Pizzeria.pizzas.foreach(p =>
            st.execute(s"INSERT INTO pizzas VALUES (${p.id},'${p.name}',${p.price})"))
          st.execute("CREATE TABLE clients (id INT, name VARCHAR(32))")
          graft.model.Pizzeria.clients.foreach(c =>
            st.execute(s"INSERT INTO clients VALUES (${c.id},'${c.name}')"))
          // note the reference DDL's own 'table_assigment' typo — the DB
          // table must carry it for 'table-name' resolution to work
          st.execute("CREATE TABLE table_assigment (id INT, client_id INT, table_id INT, in_time TIMESTAMP, out_time TIMESTAMP)")
          graft.model.Pizzeria.assignments.foreach { a =>
            val out = a.out_time.map(t => s"TIMESTAMP('$t')").getOrElse("NULL")
            st.execute(s"INSERT INTO table_assigment VALUES (${a.id},${a.client_id},${a.table_id},TIMESTAMP('${a.in_time}'),$out)")
          }
          // Derby has no array type: pizzas ride as CSV, the resolver adapts
          st.execute("CREATE TABLE orders (id INT, table_assignment_id INT, order_time TIMESTAMP, pizzas VARCHAR(64))")
          graft.model.Pizzeria.orders.foreach(o =>
            st.execute(s"INSERT INTO orders VALUES (${o.id},${o.table_assignment_id},TIMESTAMP('${o.order_time}'),'${o.pizzas.mkString(",")}')"))
          st.close()
        } finally conn.close()
        def resolver(td: FlinkDdl.TableDef): DataFrame = {
          // a deployment injects the real endpoint into the spec's URL
          val real = td.copy(options = td.options + ("url" -> url))
          val df = ConnectorSources.resolve(spark, real)
          if (td.name == "src_orders")
            df.withColumn("pizzas", split(col("pizzas"), ",").cast("array<int>"))
          else df
        }
        val res = AppRunner.run(spark, spec, resolver _,
          evalTime = Some("2023-09-23 21:30:00"))
        val rows = res.df.collect()
        val byId = rows.map(r => r.getInt(0) -> (r.getString(1), r.getString(3))).toMap
        assert(byId.keySet == Set(2, 3, 4))
        assert(byId(2)._1 == "Wall Smith")
        assert(byId(2)._2.contains("Master Splinter"))
    }
  }

  test("scenario 3 app spec: lookup join against the enriched view (batch form)") {
    loadSpec("03-flink-cdc-jdbc.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        // order_joining_view equivalent (ANY semantics) + the CDC orders
        val view = graft.queries.Scenarios.enrichedOrdersAny(seed)
          .select(col("order_id"), col("client_name"), col("table_name"),
            col("order_time"), col("pizzas").as("json_agg"))
        def resolver(td: FlinkDdl.TableDef): DataFrame =
          td.options.getOrElse("table-name", "") match {
            case "order_joining_view" => view
            case "orders" => seed.orders // postgres-cdc source, batch image
            case other => fail(s"unexpected $other")
          }
        val res = AppRunner.run(spark, spec, resolver)
        val got = res.df.select("order_id", "client_name").collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap
        assert(got == Map(1 -> "Medonna", 2 -> "Wall Smith",
          3 -> "Duvid Beckham", 4 -> "Duvid Beckham", 5 -> "Duvid Beckham"))
    }
  }

  test("scenario 2 app spec: view scan + hourly window (clock 21:30 -> orders {2,3,4})") {
    loadSpec("02-view-based-jdbc copy.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        val view = graft.queries.Scenarios.enrichedOrdersAny(seed)
          .select(col("order_id"), col("client_name"), col("table_name"),
            col("order_time"), col("pizzas").as("json_agg"))
        val res = AppRunner.run(spark, spec, _ => view,
          evalTime = Some("2023-09-23 21:30:00"))
        val got = res.df.select("order_id").collect().map(_.getInt(0)).toSet
        assert(got == Set(2, 3, 4))
    }
  }

  test("scenario 5 app spec: base64 + JSON_VALUE/JSON_QUERY decode") {
    loadSpec("05-kafka-logical-msg-flink.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        import spark.implicits._
        val payload =
          """{"order_id":6,"client_name":"Duvid Beckham","table_name":"Leonardo","pizzas":[{"pizza":"Krang","price":5}]}"""
        val b64 = java.util.Base64.getEncoder.encodeToString(payload.getBytes("UTF-8"))
        val msgs = Seq(("m", 1L, ("myprefix", b64)))
          .toDF("op", "ts_ms", "message")
          .withColumn("message", struct(col("message._1").as("prefix"), col("message._2").as("content")))
          .withColumn("source", lit(null).cast(graft.streaming.Debezium.sourceSchema))
        val res = AppRunner.run(spark, spec, _ => msgs)
        val r = res.df.collect().head
        assert(r.getInt(0) == 6)
        assert(r.getString(1) == "Duvid Beckham")
        assert(r.getString(2) == "Leonardo")
        assert(r.getString(3).contains("Krang"))
    }
  }

  test("scenario 4 app spec: outbox passthrough") {
    loadSpec("04-flink-cdc-outbox.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        import spark.implicits._
        val outbox = Seq((1, "Medonna", "Michelangelo", """[{"pizza":"Krang","price":5}]"""))
          .toDF("order_id", "client_name", "table_name", "pizzas")
        val res = AppRunner.run(spark, spec, _ => outbox)
        assert(res.df.collect().map(_.getInt(0)).toSeq == Seq(1))
    }
  }

  test("scenario 4 app spec runs as a REAL streaming query (cdc wire -> resolve -> statement -> sink)") {
    loadSpec("04-flink-cdc-outbox.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.sources.{CdcFixtures, ConnectorSources}
        // the outbox changelog as debezium envelopes on the topic the
        // postgres-cdc plan derives (my_pg.public.orders_outbox),
        // delivered through a STREAMING wire frame — so the whole app
        // (resolve -> decode -> statement -> sink encode) runs as one
        // structured streaming query, the reference's actual mode
        val cfg = CdcFixtures.ConnectorConfig("outbox", "my_pg", "defaultdb",
          Seq("public.orders_outbox"))
        val rows = Seq(
          (1, "Medonna", "Michelangelo", """[{"pizza":"Krang","price":5}]"""),
          (2, "Wall Smith", "Donatello", """[{"pizza":"Master Splinter","price":8}]"""))
        val envs = rows.map { case (id, cn, tn, pz) =>
          CdcFixtures.envelope(cfg, "public", "orders_outbox", "c",
            s"""{"order_id":$id,"client_name":"$cn","table_name":"$tn","pizzas":${jsonStr(pz)}}""",
            1695510000000L, id.toLong)
        }
        val input = MemoryStream[String]
        val wire = input.toDF()
          .select(lit(null).cast("binary").as("key"),
            col("value").cast("binary").as("value"),
            lit(cfg.topicFor("public", "orders_outbox")).as("topic"),
            lit(0).as("partition"), lit(0L).as("offset"),
            timestamp_millis(lit(1695510000000L)).as("timestamp"),
            lit(0).as("timestampType"))
        def resolver(td: FlinkDdl.TableDef): DataFrame =
          ConnectorSources.resolve(spark, td, wireSource = Some(_ => wire))
        val res = AppRunner.run(spark, spec, resolver _)
        assert(res.df.isStreaming, "the resolved app must be a streaming query")
        assert(res.sink.exists(_.connector == "upsert-kafka"))
        // write through the sink encode — the upsert-kafka wire shape
        val q = ConnectorSources.encodeKafka(res.df, res.sink.get)
          .writeStream.format("memory").queryName("sc4_out")
          .outputMode("append").start()
        try {
          input.addData(envs)
          q.processAllAvailable()
          val got = spark.table("sc4_out").collect().map { r =>
            (new String(r.getAs[Array[Byte]]("key")),
              new String(r.getAs[Array[Byte]]("value")), r.getString(2))
          }.sortBy(_._1)
          assert(got.map(_._3).distinct.toSeq == Seq("order_output"))
          assert(got.map(_._1).toSeq ==
            Seq("""{"order_id":1}""", """{"order_id":2}"""))
          assert(got.head._2.contains("\"client_name\":\"Medonna\"") &&
            got.head._2.contains("Krang"))
        } finally q.stop()
    }
  }

  /** JSON-escape a string value for embedding in an envelope row image. */
  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("scenario 6 app spec: temporal join statement (batch image of the dims)") {
    loadSpec("06-flink-cdc-temporal-join.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        // batch image: each dim at its current version; FOR SYSTEM_TIME is
        // stripped (the versioned streaming form is graft.streaming.AsOfJoin)
        val withEt = (df: DataFrame) =>
          df.withColumn("event_time", lit("2023-09-23 20:00:00").cast("timestamp"))
        def resolver(td: FlinkDdl.TableDef): DataFrame = td.name match {
          case "src_tables" => withEt(seed.tables)
          case "src_pizzas" => withEt(seed.pizzas)
          case "src_clients" => withEt(seed.clients)
          case "src_table_assignment" => withEt(seed.assignments)
          case "src_orders" => withEt(seed.orders
            .withColumn("order_time", unix_millis(col("order_time").cast("timestamp"))))
          case other => fail(s"unexpected $other")
        }
        val res = AppRunner.run(spark, spec, resolver)
        val rows = res.df.collect().map(r => r.getInt(0) -> r.getString(3)).toMap
        assert(rows.keySet == Set(1, 2, 3, 4, 5))
        assert(rows(2).contains("Master Splinter"))
    }
  }

  test("scenario 6 through the kafka wire path: connector topics -> envelopes -> decode -> run") {
    loadSpec("06-flink-cdc-temporal-join.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        import graft.sources.{CdcFixtures, ConnectorSources}
        // the all-tables connector deployment (kafka-connectors/
        // all-tables-cdc.json include list) for the my_pg3 server the
        // scenario-6 DDL topics name
        val cfg = CdcFixtures.ConnectorConfig("all-tables", "my_pg3", "defaultdb",
          Seq("public.orders", "public.tables", "public.clients",
            "public.pizzas", "public.table_assignment"))
        val snapTs = 1695510000000L
        def wireOf(pg: String, df: DataFrame): DataFrame = {
          val rows = df.selectExpr("id", "to_json(struct(*)) AS j").collect()
            .map(r => CdcFixtures.Event("c", s"""{"id":${r.getInt(0)}}""",
              r.getString(1), snapTs, r.getInt(0).toLong))
          CdcFixtures.kafkaWire(spark, cfg, "public", pg, rows.toIndexedSeq)
        }
        val wires = Map(
          "src_tables" -> wireOf("tables", seed.tables),
          "src_pizzas" -> wireOf("pizzas", seed.pizzas),
          "src_clients" -> wireOf("clients", seed.clients),
          "src_table_assignment" -> wireOf("table_assignment", seed.assignments
            .select(col("id"), col("client_id"), col("table_id"),
              unix_millis(col("in_time")).as("in_time"),
              unix_millis(col("out_time")).as("out_time"))),
          "src_orders" -> wireOf("orders", seed.orders
            .select(col("id"), col("table_assignment_id"),
              unix_millis(col("order_time")).as("order_time"), col("pizzas"))))
        def resolver(td: FlinkDdl.TableDef): DataFrame = {
          val plan = ConnectorSources.plan(td).asInstanceOf[ConnectorSources.KafkaScan]
          // the topic the connector generates IS the topic the DDL declares
          assert(plan.topic == cfg.topicFor("public",
            td.options("topic").split("\\.").last))
          ConnectorSources.decodeKafka(wires(td.name), plan, td)
        }
        val res = AppRunner.run(spark, spec, resolver _)
        // metadata column (event_time METADATA FROM 'value.source.timestamp')
        // materialized from the envelope's source.ts_ms by applyDerived
        val et = spark.table("src_orders").select("event_time").distinct().collect()
        assert(et.map(_.getTimestamp(0).getTime).toSeq == Seq(snapTs))
        val rows = res.df.collect().map(r => r.getInt(0) -> r.getString(3)).toMap
        assert(rows.keySet == Set(1, 2, 3, 4, 5))
        assert(rows(2).contains("Master Splinter"))
    }
  }

  test("scenario 3 (kafka-cdc variant): resolve's kafka branch == jdbc branch on the same fixture, end-to-end through AppRunner") {
    loadSpec("03-kafka-cdc-flink-jdbc.json") match {
      case None => cancel("reference not available")
      case Some(spec) =>
        import graft.sources.{CdcFixtures, ConnectorSources}
        // ---- jdbc side: embedded Derby carrying BOTH the enriched view
        // (the spec's jdbc source) and the raw orders (the parity twin
        // of the kafka topic). order_time stored as epoch-ms BIGINT to
        // match the kafka DDL's BIGINT column type exactly.
        val url = "jdbc:derby:memory:sc3;create=true"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          st.execute("CREATE TABLE orders (id INT, table_assignment_id INT, order_time BIGINT, pizzas VARCHAR(64))")
          Pizzeria.orders.foreach { o =>
            val ms = o.order_time.getTime
            st.execute(s"INSERT INTO orders VALUES (${o.id},${o.table_assignment_id},$ms,'${o.pizzas.mkString(",")}')")
          }
          st.execute("CREATE TABLE order_joining_view (order_id INT, client_name VARCHAR(64), table_name VARCHAR(64), order_time TIMESTAMP, json_agg VARCHAR(2000))")
          graft.queries.Scenarios.enrichedOrdersAny(seed)
            .select(col("order_id"), col("client_name"), col("table_name"),
              col("order_time").cast("string"), col("pizzas"))
            .collect().foreach { r =>
              st.execute(s"INSERT INTO order_joining_view VALUES (${r.getInt(0)}," +
                s"'${r.getString(1)}','${r.getString(2)}'," +
                s"TIMESTAMP('${r.getString(3)}'),'${r.getString(4)}')")
            }
          st.close()
        } finally conn.close()
        // ---- kafka side: the orders changelog as debezium envelopes on
        // the topic the spec's DDL subscribes to (my_pg.public.orders),
        // recorded in the exact wire schema Spark's kafka source emits
        val cfg = CdcFixtures.ConnectorConfig("orders-cdc", "my_pg", "defaultdb",
          Seq("public.orders"))
        val events = seed.orders
          .selectExpr("id",
            "to_json(struct(id, table_assignment_id, unix_millis(order_time) AS order_time, pizzas)) AS j")
          .collect()
          .map(r => CdcFixtures.Event("c", s"""{"id":${r.getInt(0)}}""",
            r.getString(1), 1695510000000L, r.getInt(0).toLong))
        val wire = CdcFixtures.kafkaWire(spark, cfg, "public", "orders",
          events.toIndexedSeq)
        val kafkaTd = spec.sources.map(s => FlinkDdl.parse(s.createTable))
          .find(_.connector == "kafka").get
        assert(ConnectorSources.plan(kafkaTd)
          .asInstanceOf[ConnectorSources.KafkaScan].topic ==
            cfg.topicFor("public", "orders"),
          "the DDL's topic must be the one the connector config produces")
        // ---- parity: the SAME logical table through the two resolve
        // branches — recorded-wire kafka vs Derby jdbc — row-for-row
        val viaKafka = ConnectorSources
          .resolve(spark, kafkaTd, wireSource = Some(_ => wire))
          .select("id", "table_assignment_id", "order_time", "pizzas")
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getSeq[Int](3)))
          .toSet
        val jdbcTd = FlinkDdl.parse(
          s"""CREATE TABLE orders_jdbc (
             |  id INT, table_assignment_id INT, order_time BIGINT, pizzas STRING
             |) WITH ('connector' = 'jdbc', 'url' = '$url', 'table-name' = 'orders')""".stripMargin)
        val viaJdbc = ConnectorSources.resolve(spark, jdbcTd)
          .withColumn("pizzas", split(col("pizzas"), ",").cast("array<int>"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getSeq[Int](3)))
          .toSet
        assert(viaKafka == viaJdbc,
          s"kafka resolve branch diverged from jdbc branch:\nkafka=$viaKafka\njdbc=$viaJdbc")
        // ---- end-to-end: run the REAL app spec with each source served
        // by its own resolve branch (jdbc url injected, kafka from the
        // recorded wire), like a deployment would
        def resolver(td: FlinkDdl.TableDef): DataFrame = td.connector match {
          case "jdbc" => ConnectorSources.resolve(spark,
            td.copy(options = td.options + ("url" -> url)))
          case "kafka" => ConnectorSources.resolve(spark, td,
            wireSource = Some(_ => wire))
          case other => fail(s"unexpected connector $other")
        }
        val res = AppRunner.run(spark, spec, resolver _)
        val got = res.df.select("order_id", "client_name").collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap
        assert(got == Map(1 -> "Medonna", 2 -> "Wall Smith",
          3 -> "Duvid Beckham", 4 -> "Duvid Beckham", 5 -> "Duvid Beckham"))
    }
  }

  test("shim output is inspectable and sink-aware") {
    val sh = FlinkSqlShim.rewrite(
      "INSERT INTO out SELECT CEIL(LOCALTIMESTAMP to hour) FROM t;",
      Some("2024-01-01 00:30:00"))
    assert(sh.sinkTable.contains("out"))
    assert(sh.selectSql.contains("ceil_to_hour(timestamp'2024-01-01 00:30:00')"))
    assert(!sh.selectSql.toLowerCase.contains("insert"))
  }
}
