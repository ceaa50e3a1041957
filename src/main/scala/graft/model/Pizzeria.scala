package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's base schema and deterministic seed rows
  * (reference: scripts/load_dims.sql:1-57, tabulated in FIXTURES.md §1).
  * Used as unit-test fixtures; production tables come through
  * graft.Tables / the app-spec source layer.
  */
object Pizzeria {

  case class Table(id: Int, name: String, seats: Int)
  case class Pizza(id: Int, name: String, price: Int)
  case class Client(id: Int, name: String)
  case class TableAssignment(id: Int, client_id: Int, table_id: Int,
      in_time: Timestamp, out_time: Option[Timestamp])
  /** `orders` has no PK in PG (load_dims.sql:44-50) but the Flink DDLs
    * declare one; the engine follows the Flink DDL and treats `id` as the
    * upsert key (SURVEY.md §7.4 risk 5). */
  case class Order(id: Int, table_assignment_id: Int, order_time: Timestamp,
      pizzas: Seq[Int])

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val tables = Seq(
    Table(1, "Donatello", 2), Table(2, "Michelangelo", 4),
    Table(3, "Raffaello", 4), Table(4, "Leonardo", 8))

  val pizzas = Seq(
    Pizza(1, "Master Splinter", 8), Pizza(2, "Shredder", 7),
    Pizza(3, "Krang", 5), Pizza(4, "Bebop and Rocksteady", 6))

  val clients = Seq(
    Client(1, "Medonna"), Client(2, "Duvid Beckham"),
    Client(3, "Wall Smith"), Client(4, "Josh Depp"))

  val assignments = Seq(
    TableAssignment(1, 1, 2, ts("2023-09-23 20:00:00"), Some(ts("2023-09-23 21:00:00"))),
    TableAssignment(2, 2, 4, ts("2023-09-23 21:00:00"), None),
    TableAssignment(3, 3, 2, ts("2023-09-23 21:00:00"), None),
    TableAssignment(4, 4, 1, ts("2023-09-23 22:00:00"), None))

  val orders = Seq(
    Order(1, 1, ts("2023-09-23 20:05:00"), Seq(1, 3, 2)),
    Order(2, 3, ts("2023-09-23 21:04:00"), Seq(1, 1, 1, 1)),
    Order(3, 2, ts("2023-09-23 21:05:00"), Seq(2, 3, 4, 1, 1, 4)),
    Order(4, 2, ts("2023-09-23 21:07:00"), Seq(1, 1)),
    Order(5, 2, ts("2023-09-23 20:10:00"), Seq(3)))

  /** All five seed tables as DataFrames. */
  def seed(spark: SparkSession): PizzeriaTables = {
    import spark.implicits._
    PizzeriaTables(
      tables = tables.toDF(),
      pizzas = pizzas.toDF(),
      clients = clients.toDF(),
      assignments = assignments.toDF(),
      orders = orders.toDF())
  }

  case class PizzeriaTables(tables: DataFrame, pizzas: DataFrame,
      clients: DataFrame, assignments: DataFrame, orders: DataFrame)
}
