package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic local scale-up of a harness sf directory: replicates
  * every table `Factor`× with key offsets that preserve referential
  * integrity, so the bench can measure the 10× scale curve without a
  * driver-side dataset (TESTDATA.md tops out at sf0.1). No randomness
  * anywhere — same input, same bytes.
  *
  * Replica design (r = 0 is the original data, bit for bit):
  *  - Every entity key shifts by `r · (max(key)+1)`, and every foreign
  *    key shifts by ITS referenced table's base — joins land exactly as
  *    they do at sf0.1, fact/dim ratios preserved.
  *  - `region`/`nation` stay fixed (TPC-H semantics: dims don't scale),
  *    so group-by-nation result shapes are unchanged while the facts
  *    behind them grow 10×.
  *  - `documents.text`: replica r > 0 suffixes every 4th word (phase
  *    r % 4) with `q<r>`. Within a replica this is a bijection on the
  *    word stream — equal docs stay equal, near-dup structure and
  *    shingle df distributions replicate — while across replicas at
  *    most 1/4 of word-3-gram shingles survive shared (the windows
  *    missing the marked residue), putting cross-replica jaccard near
  *    0.25/(2−0.25) ≈ 0.14, under every registered near-dup threshold
  *    (0.3 jaccard / 0.8 containment). A scaled corpus must look like
  *    NEW data: 10 byte-identical copies would turn every pair operator
  *    quadratic in Factor and measure the wrong thing.
  *  - `embeddings.embedding`: replica r is the circular dim-shift by r.
  *    A shift is a rigid rotation: norms and all WITHIN-replica dot
  *    products are preserved exactly (the sf0.1 neighbor structure
  *    replicates 10×), while cross-replica similarities distribute like
  *    independent random vectors.
  *  - `events.ts` keeps its 2024 range (density ×10, window fixed);
  *    `user_id` shifts by the CUSTOMER base — the expectations suite's
  *    FK check holds at sf1.
  */
object ScaleUp {
  val Factor = 10

  /** Idempotent: generates `outDir` from `srcDir` once; a marker file
    * gates regeneration so repeated bench runs reuse the parquet. */
  def ensure(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val marker = java.nio.file.Paths.get(outDir, "_SCALE_OK")
    if (java.nio.file.Files.exists(marker)) return
    generate(spark, srcDir, outDir)
    java.nio.file.Files.createFile(marker)
  }

  private def base(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1L

  private def replicate(df: DataFrame): DataFrame =
    df.withColumn("r", explode(expr(s"sequence(0, ${Factor - 1})")))

  private def shifted(c: String, b: Long) = col(c) + col("r") * lit(b)

  def generate(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    import Tables.table
    // before ANY events.parquet touch (the key-base scan included): its
    // ts is parquet TIMESTAMP(NANOS), readable only as nanos-long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.drop("r").repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // fixed dims: straight copy
    table(spark, srcDir, "region").write.mode("overwrite")
      .parquet(s"$outDir/region.parquet")
    table(spark, srcDir, "nation").write.mode("overwrite")
      .parquet(s"$outDir/nation.parquet")

    val custB = base(table(spark, srcDir, "customer"), "c_custkey")
    val suppB = base(table(spark, srcDir, "supplier"), "s_suppkey")
    val partB = base(table(spark, srcDir, "part"), "p_partkey")
    val ordB = base(table(spark, srcDir, "orders"), "o_orderkey")
    val evB = base(table(spark, srcDir, "events"), "event_id")
    val docB = base(table(spark, srcDir, "documents"), "doc_id")
    val vecB = base(table(spark, srcDir, "embeddings"), "vec_id")

    write(replicate(table(spark, srcDir, "customer"))
      .withColumn("c_custkey", shifted("c_custkey", custB)), "customer", 8)
    write(replicate(table(spark, srcDir, "supplier"))
      .withColumn("s_suppkey", shifted("s_suppkey", suppB)), "supplier", 4)
    write(replicate(table(spark, srcDir, "part"))
      .withColumn("p_partkey", shifted("p_partkey", partB)), "part", 8)
    write(replicate(table(spark, srcDir, "orders"))
      .withColumn("o_orderkey", shifted("o_orderkey", ordB))
      .withColumn("o_custkey", shifted("o_custkey", custB)), "orders", 16)
    write(replicate(table(spark, srcDir, "lineitem"))
      .withColumn("l_orderkey", shifted("l_orderkey", ordB))
      .withColumn("l_partkey", shifted("l_partkey", partB))
      .withColumn("l_suppkey", shifted("l_suppkey", suppB)), "lineitem", 32)

    // events: raw read keeps ts as nanos-long (Tables.events converts on
    // load); written back as int64 nanos, which the same loader accepts
    write(replicate(table(spark, srcDir, "events"))
      .withColumn("event_id", shifted("event_id", evB))
      .withColumn("user_id", shifted("user_id", custB)), "events", 16)

    write(replicate(table(spark, srcDir, "documents"))
      .withColumn("text", expr(
        s"""CASE WHEN r = 0 OR text IS NULL THEN text
            ELSE array_join(transform(split(text, '\\\\s+'),
              (w, i) -> CASE WHEN i % 4 = r % 4 THEN concat(w, 'q', CAST(r AS STRING)) ELSE w END), ' ')
            END"""))
      // replica 0 must stay the source bit-for-bit, including any
      // n_chars the harness wrote that disagrees with length(text)
      .withColumn("n_chars", when(col("r") === 0, col("n_chars"))
        .otherwise(coalesce(length(col("text")), col("n_chars"))))
      .withColumn("doc_id", shifted("doc_id", docB)), "documents", 16)

    write(replicate(table(spark, srcDir, "embeddings"))
      .withColumn("embedding", expr(
        "CASE WHEN r = 0 OR embedding IS NULL THEN embedding " +
          "ELSE concat(slice(embedding, r + 1, size(embedding) - r), slice(embedding, 1, r)) END"))
      .withColumn("vec_id", shifted("vec_id", vecB)), "embeddings", 8)
  }
}
