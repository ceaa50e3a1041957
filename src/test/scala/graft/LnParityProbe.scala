package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: dumps Spark-side `ln` readings on the two argument
  * families the NLL nano-grid fold quantizes — integer counts (the
  * unigram model's ln(cnt)) and mixture-like doubles in (0,1] (the
  * bigram model's ln(λ·a/b + (1−λ)·c/N)) — so tools/ln_parity.py can
  * diff them bit-for-bit against DuckDB's `ln` and measure how often
  * the two engines disagree at the 1e-9 grid. Test scope: measurement
  * harness, not library surface. */
object LnParityProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/ln_parity")
    val n = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // integer args: every count value the unigram model can hold at any
    // harness SF (max token count at sf1 is far below 5e6)
    spark.range(1, n + 1)
      .selectExpr("id", "CAST(round(ln(id) * 1e9, 0) AS LONG) AS lnc_nano",
        "ln(id) AS ln_raw")
      .coalesce(1).write.mode("overwrite").parquet(out + "_int")
    // mixture-like args: deterministic pseudo-random doubles in (0,1],
    // built from integer hashing so DuckDB reproduces them EXACTLY
    // (xxhash64 on both sides, same modulus arithmetic)
    spark.range(0, n)
      .selectExpr("id",
        "CAST(pmod(xxhash64(id), 1000000000) + 1 AS DOUBLE) / 1e9 AS x")
      .selectExpr("id", "x",
        "CAST(round(-ln(x) * 1e9, 0) AS LONG) AS nll_nano", "ln(x) AS ln_raw")
      .coalesce(1).write.mode("overwrite").parquet(out + "_mix")
    spark.stop()
  }
}
