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
  /** The harness has shipped `events.ts` in two physical shapes —
    * TIMESTAMP(NANOS) (readable only as nanos-long, truncated here to
    * micros exactly as DuckDB floor-truncates it) and plain
    * TIMESTAMP(MICROS) without a UTC flag (arrives as TIMESTAMP_NTZ).
    * Branch on what the file actually contains and normalize both to the
    * engine-standard TimestampType (UTC session TZ, SURVEY §1.3) so every
    * downstream operator sees one ts type regardless of harness vintage. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      // a UTC-flagged TIMESTAMP(MICROS) vintage arrives as TimestampType
      // already — the normalization target; pass through unchanged
      case org.apache.spark.sql.types.TimestampType => df
      // anything else (string, int96, a future vintage) must fail HERE,
      // at the normalization point, not as an obscure cast error in
      // whichever downstream operator first touches ts
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other in $d/events.parquet - " +
          "expected TIMESTAMP(NANOS) (nanos-long), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
