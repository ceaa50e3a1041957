package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: run a SUBSET of SparkEntry queries at a dir and dump
  * their outputs + trimmed oracle_sql.json in the Verify layout, so
  * check_oracle.py can replay just the named queries (used to extend an
  * existing sf1 replay with late-added operators without re-running the
  * whole registry). Test scope: instrument, not library surface. */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifySubset <sfDir> <outDir> <name> [name...]")
    val (d, out, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      SparkEntry.queries(n)(spark, d).write.mode("overwrite").parquet(s"$out/$n")
      println(s"wrote $n")
    }
    val oracle = names.map(n =>
      "\"" + n + "\":" + jsonStr(SparkEntry.oracleSql(n))).mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out, "oracle_sql.json"),
      oracle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
}
