package graft

import org.apache.spark.sql.functions._

/** Mechanism pins for the weighted exact-k sampler and the IVF nprobe
  * curve — the properties the oracle compare can't see: the A-ES
  * integer realization's monotonicity in w, the size bias the weighting
  * exists to buy, and the probe curve's monotone shape. */
class WeightedSampleSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("weighted priority is monotone in w (A-ES max-of-salted-hashes realization)") {
    // max over j ∈ 1..64 can only be ≥ max over j ∈ 1..1 for the same
    // doc_id — the property that makes "more tokens → stochastically
    // larger key" true deterministically, not just in distribution
    val df = spark.range(0, 200).select(col("id").as("doc_id"))
      .withColumn("p1", expr(
        "array_max(transform(sequence(1, 1), " +
          "j -> md5(concat('wbk:', CAST(doc_id AS STRING), ':', CAST(j AS STRING)))))"))
      .withColumn("p64", expr(
        "array_max(transform(sequence(1, 64), " +
          "j -> md5(concat('wbk:', CAST(doc_id AS STRING), ':', CAST(j AS STRING)))))"))
    assert(df.where(col("p64") < col("p1")).count() === 0L)
    // and strictly larger for most rows (the fan actually moves the key)
    assert(df.where(col("p64") > col("p1")).count() > 150L)
  }

  test("weighted draw is exact-k, distinct, and size-biased vs the uniform draw") {
    val sample = SparkEntry.queries("sample_weighted_bottomk")(spark, sf).collect()
    assert(sample.length === graft.ops.PipelineOps.WbkK)
    assert(sample.map(_.getLong(sample.head.fieldIndex("doc_id"))).distinct.length ===
      graft.ops.PipelineOps.WbkK)
    val ev = SparkEntry.queries("sample_weighted_eval")(spark, sf).collect().head
    val lift = ev.getLong(ev.fieldIndex("lift_micro"))
    val wMean = ev.getLong(ev.fieldIndex("weighted_mean_micro"))
    val uMean = ev.getLong(ev.fieldIndex("uniform_mean_micro"))
    assert(lift > 1000000L,
      s"weighted mean must exceed the corpus mean (lift_micro=$lift)")
    assert(wMean > uMean,
      s"weighted mean ($wMean) must exceed the uniform-sample mean ($uMean)")
  }

  test("nprobe curve: recall and candidate volume are monotone, hits bounded by possible") {
    val rows = SparkEntry.queries("sim_ivf_probe_curve")(spark, sf)
      .orderBy("nprobe").collect()
    assert(rows.length === 4)
    val recalls = rows.map(r => r.getLong(r.fieldIndex("recall_micro")))
    val cands = rows.map(r => r.getLong(r.fieldIndex("n_candidates")))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must be monotone in nprobe: ${recalls.mkString(",")}")
    assert(cands.zip(cands.tail).forall { case (a, b) => b >= a },
      s"candidate volume must be monotone in nprobe: ${cands.mkString(",")}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_hits")) <=
        r.getLong(r.fieldIndex("n_possible")))
    }
  }
}
