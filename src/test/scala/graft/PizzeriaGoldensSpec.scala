package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.model.Pizzeria
import graft.queries.Scenarios

/** Golden-output tests from FIXTURES.md §2 — derived by hand from the
  * reference seed data (scripts/load_dims.sql). */
class PizzeriaGoldensSpec extends SparkSpec {

  private lazy val t = Pizzeria.seed(spark)

  private def pizzasByOrder(df: org.apache.spark.sql.DataFrame): Map[Int, String] =
    df.select("order_id", "pizzas").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  test("UNNEST semantics preserve duplicate array elements (FIXTURES.md 2a)") {
    val got = pizzasByOrder(Scenarios.enrichedOrdersUnnest(t))
    assert(got.keySet == Set(1, 2, 3, 4, 5))
    // order 2 has pizzas [1,1,1,1] -> four Master Splinter entries
    assert(got(2) ==
      """[{"pizza":"Master Splinter","price":8},{"pizza":"Master Splinter","price":8},{"pizza":"Master Splinter","price":8},{"pizza":"Master Splinter","price":8}]""")
    // order 5 single Krang
    assert(got(5) == """[{"pizza":"Krang","price":5}]""")
    // order 3: [2,3,4,1,1,4] -> 6 elements, sorted by (pizza, price)
    assert(got(3) ==
      """[{"pizza":"Bebop and Rocksteady","price":6},{"pizza":"Bebop and Rocksteady","price":6},{"pizza":"Krang","price":5},{"pizza":"Master Splinter","price":8},{"pizza":"Master Splinter","price":8},{"pizza":"Shredder","price":7}]""")
  }

  test("= ANY(array) semantics collapse duplicates (FIXTURES.md 2b, pinned divergence)") {
    val got = pizzasByOrder(Scenarios.enrichedOrdersAny(t))
    assert(got(2) == """[{"pizza":"Master Splinter","price":8}]""")
    assert(got(4) == """[{"pizza":"Master Splinter","price":8}]""")
    assert(got(3) ==
      """[{"pizza":"Bebop and Rocksteady","price":6},{"pizza":"Krang","price":5},{"pizza":"Master Splinter","price":8},{"pizza":"Shredder","price":7}]""")
    // orders 1 and 5 have no duplicates -> same as UNNEST
    val unnest = pizzasByOrder(Scenarios.enrichedOrdersUnnest(t))
    assert(got(1) == unnest(1) && got(5) == unnest(5))
    // and the duplicate orders DIVERGE
    assert(got(2) != unnest(2) && got(3) != unnest(3) && got(4) != unnest(4))
  }

  test("client/table enrichment matches the seed FK graph") {
    val got = Scenarios.enrichedOrdersUnnest(t)
      .select("order_id", "client_name", "table_name").distinct()
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1, "Medonna", "Michelangelo"),
      (2, "Wall Smith", "Michelangelo"),
      (3, "Duvid Beckham", "Leonardo"),
      (4, "Duvid Beckham", "Leonardo"),
      (5, "Duvid Beckham", "Leonardo")))
  }

  test("hour-window filter: (CEIL(now TO HOUR) - 1h, CEIL(now TO HOUR)]") {
    // eval 21:30 => CEIL = 22:00 => window (21:00,22:00] => orders {2,3,4}
    val w1 = Scenarios.q01BasicJoin(t, lit("2023-09-23 21:30:00").cast("timestamp"))
      .select("order_id").collect().map(_.getInt(0)).toSet
    assert(w1 == Set(2, 3, 4))
    // eval 20:30 => CEIL = 21:00 => window (20:00,21:00] => orders {1,5}
    val w2 = Scenarios.q01BasicJoin(t, lit("2023-09-23 20:30:00").cast("timestamp"))
      .select("order_id").collect().map(_.getInt(0)).toSet
    assert(w2 == Set(1, 5))
    // exact-hour eval is a CEIL fixpoint: eval 21:00:00 => window (20:00,21:00]
    val w3 = Scenarios.q01BasicJoin(t, lit("2023-09-23 21:00:00").cast("timestamp"))
      .select("order_id").collect().map(_.getInt(0)).toSet
    assert(w3 == Set(1, 5))
    // an hour with no orders => empty
    val w4 = Scenarios.q01BasicJoin(t, lit("2023-09-23 23:30:00").cast("timestamp"))
      .select("order_id").collect().map(_.getInt(0)).toSet
    assert(w4 == Set.empty[Int])
  }

  test("scenario 6 batch: full temporal pipeline equals the UNNEST enrichment on single-version dims") {
    import org.apache.spark.sql.DataFrame
    val et = (df: DataFrame) =>
      df.withColumn("event_time", lit("2023-09-23 19:00:00").cast("timestamp"))
    val orders6 = t.orders
      .withColumn("event_time", col("order_time").cast("timestamp"))
    val got = Scenarios.q06TemporalJoin(orders6, et(t.pizzas), et(t.assignments),
        et(t.clients), et(t.tables))
      .select("order_id", "client_name", "table_name", "pizzas")
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(3))).toMap
    val want = Scenarios.enrichedOrdersUnnest(t)
      .select("order_id", "client_name", "pizzas")
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (client, pizzas)) =>
      assert((client, pizzas) == want(id), s"order $id")
    }
  }

  test("scenario 6 batch: temporal versioning picks the dim version at the order's event time") {
    import spark.implicits._
    // pizza 1 price 8 until 21:00, then 9
    val pizzas2 = Seq(
      (1, "Master Splinter", 8, "2023-09-23 19:00:00"),
      (1, "Master Splinter", 9, "2023-09-23 21:00:00")).toDF("id", "name", "price", "et")
      .select(col("id"), col("name"), col("price"), col("et").cast("timestamp").as("event_time"))
    val et = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("event_time", lit("2023-09-23 19:00:00").cast("timestamp"))
    val orders6 = t.orders.withColumn("event_time", col("order_time").cast("timestamp"))
    val got = Scenarios.q06TemporalJoin(orders6, pizzas2, et(t.assignments),
        et(t.clients), et(t.tables))
      .select("order_id", "pizzas").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    // order 1 (20:05, pizzas [1,3,2]) -> price 8; order 2 (21:04, [1,1,1,1]) -> price 9
    assert(got(1).contains("\"price\":8"))
    assert(got(2) ==
      """[{"pizza":"Master Splinter","price":9},{"pizza":"Master Splinter","price":9},{"pizza":"Master Splinter","price":9},{"pizza":"Master Splinter","price":9}]""")
  }

  test("scenario 5: logical-decoding message decode (FIXTURES.md 3b)") {
    import spark.implicits._
    val payload =
      """{"order_id":6,"client_name":"Duvid Beckham","table_name":"Leonardo","pizzas":[{"pizza":"Master Splinter","price":8}]}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(payload.getBytes("UTF-8"))
    val messages = Seq(("myprefix", b64)).toDF("prefix", "content")
      .select(struct(col("prefix"), col("content")).as("message"))
    val got = Scenarios.q05LogicalDecode(messages).collect().head
    assert(got.getInt(0) == 6)
    assert(got.getString(1) == "Duvid Beckham")
    assert(got.getString(2) == "Leonardo")
    assert(got.getString(3).contains("\"pizza\":\"Master Splinter\""))
  }

  test("scenario 4: outbox passthrough is verbatim") {
    import spark.implicits._
    val outbox = Seq((1, "Medonna", "Michelangelo", """[{"pizza":"Krang"}]"""))
      .toDF("order_id", "client_name", "table_name", "pizzas")
    val got = Scenarios.q04OutboxPassthrough(outbox)
    assert(got.columns.toSeq == outbox.columns.toSeq)
    assert(got.collect().toSeq == outbox.collect().toSeq)
  }
}
