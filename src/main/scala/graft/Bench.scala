package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A small untimed warmup first (JVM/codegen/paths),
  * then queries in sorted order so per-query numbers are comparable
  * across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: touch every table + exercise codegen/shuffle paths
    try {
      Tables.lineitem(spark, sfDir).limit(10).count()
      Tables.events(spark, sfDir).limit(10).count()
      Tables.documents(spark, sfDir).limit(10).count()
      Tables.embeddings(spark, sfDir).limit(10).count()
      spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
        .count().count()
      // typed path (groupByKey/flatMapGroups object codecs) and the JSON
      // encode/parse codegen, so the first query using them isn't the one
      // that pays their one-time compilation
      import spark.implicits._
      spark.range(100).as[Long].groupByKey(_ % 7)
        .flatMapGroups((_: Long, it: Iterator[Long]) => it).count()
      spark.range(10)
        .selectExpr("from_json(to_json(struct(id)), 'id BIGINT') AS r").count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // ANN quality: recall@3 of the bucketed variants against the exact
    // brute-force top-3, so an index change that silently tanks quality is
    // visible next to its speedup.
    val recallJson = try {
      import org.apache.spark.sql.functions.col
      def topSet(name: String): Map[Long, Set[Long]] =
        SparkEntry.queries(name)(spark, sfDir).where(col("rank") <= 3).collect()
          .groupBy(_.getAs[Long]("q_id"))
          .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
      val truth = topSet("sim_brute_topk")
      val entries = Seq("sim_lsh_topk", "sim_lsh_multi_topk", "sim_ivf_topk").map { n =>
        val approx = topSet(n)
        val per = truth.toSeq.map { case (q, t) =>
          (approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size) }
        val r = if (per.nonEmpty) per.sum / per.size else 0.0
        "\"" + n + "\":" + r
      }
      entries.mkString(",\"recall_at_3\":{", ",", "}")
    } catch { case _: Throwable => "" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$recallJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
