package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: median-of-3 wall times for NAMED registry keys at a
  * dir — the focused instrument for adjudicating one key's scale ratio
  * without paying for a full bench pass (run it at sf0.1 and at the
  * scale dir, divide). Same session shape as Bench. Test scope:
  * measurement harness, not library surface. Run on a quiet box. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeProbe <sfDir> <name> [name...]")
    val (d, names) = (args.head, args.tail.toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n => // warm: codegen + file listing paid once
      SparkEntry.queries(n)(spark, d).collect()
    }
    names.foreach { n =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TIME $n%-28s median=${ts(1)}%.3f s runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
