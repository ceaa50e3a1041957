package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (test scope): warm-path cost split of the persisted
  * vs fused corpus-knn forms — the r13 index-serving regression hunt. */
object KnnProfileProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = Bench.newSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    t("warm_tables") { Tables.embeddings(spark, d).count() }
    t("centroids_via_topk") { SparkEntry.queries("sim_ivf_topk")(spark, d).count() }
    val dir = java.nio.file.Files.createTempDirectory("knnprof").toString
    t("build_index") { ops.SimOps.buildIvfIndex(spark, d, dir) }
    t("build_index_2") { ops.SimOps.buildIvfIndex(spark, d, dir) }
    t("read_lists_cnt") { spark.read.parquet(dir + "/lists").count() }
    t("indexed_query") { SparkEntry.queries("sim_knn_graph")(spark, d).count() }
    t("inmem_query") { ops.SimOps.knnGraphInMemory(spark, d).count() }
    spark.stop()
  }
}
