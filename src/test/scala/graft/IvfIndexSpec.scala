package graft

import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** The persisted-index deployment shape: build the IVF index offline,
  * load it in a separate "application", and get byte-identical answers
  * to the in-memory operator — with the on-disk layout that makes
  * queries touch only their probed partitions at 100 TB. */
class IvfIndexSpec extends SparkSpec {

  private val D = "/root/testdata/sf0.001"

  test("persisted IVF index: build -> load -> query == in-memory sim_ivf_topk") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    SimOps.buildIvfIndex(spark, D, dir)

    // layout: lists are physically partitioned by list_id, so a probe of
    // nprobe lists materializes exactly those directories
    val listDirs = new java.io.File(dir + "/lists").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(listDirs.nonEmpty, "index must be partitioned by list_id")

    val fromIndex = SimOps.ivfTopKFromIndex(spark, D, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val inMemory = SparkEntry.queries("sim_ivf_topk")(spark, D)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(fromIndex == inMemory,
      s"persisted-index answers diverged: index=$fromIndex inMemory=$inMemory")

    // the index is self-contained: vectors ride in the lists with their
    // precomputed norms, so the query never needs the corpus table
    val listCols = spark.read.parquet(dir + "/lists").columns.toSet
    assert(Set("vec_id", "embedding", "c_nrm", "list_id").subsetOf(listCols))
  }

  test("incremental append: twins of the corpus join the standing index and surface at rank 1") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString
    SimOps.buildIvfIndex(spark, D, dir)
    val before = spark.read.parquet(dir + "/lists")
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

    // append EXACT TWINS of every corpus vector under new ids: same
    // distances -> the closure rule must assign each twin to exactly its
    // original's lists, and each query's nearest neighbor becomes its
    // own twin at cosine 1.0 — proof the appended data is genuinely
    // queryable, not just present on disk
    val offset = 100000L
    val twins = Tables.embeddings(spark, D)
      .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
    SimOps.appendToIvfIndex(spark, dir, twins)

    val after = spark.read.parquet(dir + "/lists")
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after.filter(_._1 < offset) == before,
      "append must not touch standing index rows")
    assert(after.filter(_._1 >= offset).map { case (v, l) => (v - offset, l) } == before,
      "each twin must closure-assign to exactly its original's lists")

    val top1 = SimOps.ivfTopKFromIndex(spark, D, dir)
      .where(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1.nonEmpty)
    top1.foreach { case (q, n) =>
      assert(n == q + offset,
        s"query $q's rank-1 neighbor should be its appended twin, got $n")
    }

    // retry safety: a sink-side retry double-appends the same batch; the
    // query path dedups candidates (distinct) AND vectors (dropDuplicates
    // by vec_id), so replayed rows must not change any answer
    val before2 = SimOps.ivfTopKFromIndex(spark, D, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    SimOps.appendToIvfIndex(spark, dir, twins)
    val after2 = SimOps.ivfTopKFromIndex(spark, D, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(after2 == before2,
      "a replayed append must be invisible to queries (read-time dedup)")
  }
}
