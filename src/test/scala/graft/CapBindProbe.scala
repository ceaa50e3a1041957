package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (test scope, the AnnProbe convention): print
  * [[graft.ops.DedupOps.capBindStats]] for each dir argument — the
  * r13 "do the caps actually bind at the second decade" instrument
  * behind the dedup_keep_central ExpectedSuperlinear entry. */
object CapBindProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      val r = ops.DedupOps.capBindStats(spark, d).collect().head
      val cols = r.schema.fieldNames
      println(s"CAPBIND $d " + cols.map(c =>
        s"$c=${r.get(r.fieldIndex(c))}").mkString(" "))
    }
    spark.stop()
  }
}
