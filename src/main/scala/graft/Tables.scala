package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The reference maps each external table through a Flink `create_table`
  * DDL (reference: flink-applications/01-basic-jdbc.json:4-22); here the
  * same role is played by a thin source abstraction over `spark.read`.
  * Parquet for the offline harness; the JDBC branch keeps the same shape
  * for a real deployment. Column pruning + filter pushdown are Catalyst's
  * job — callers `.select`/`.where` immediately and the scan only reads
  * the referenced columns (verify with `.explain`: ReadSchema/PushedFilters).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long and truncate to
    * microseconds (same floor-truncation DuckDB applies), yielding a
    * standard TimestampType column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
