package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: isolated stage-level timings for the ANN family at
  * one SF dir — the instrument behind the round-6 "price of the
  * multi-probe/sqrt-IVF recall buy" numbers. Test scope on purpose: it
  * is a measurement harness, not part of the library surface. Run on a
  * QUIET box (the bench's own contention discipline applies doubly to
  * stage splits). */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        (dt, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"STAGE $tag%-14s median=$med%7.3f s  runs=${runs.map(r => f"${r._1}%.3f").mkString(",")}  rows=${runs.head._2}")
    }

    // warmup: codegen + centroid cache + file listing
    Seq("sim_brute_topk", "sim_lsh_topk", "sim_ivf_q8_topk")
      .foreach(q => SparkEntry.queries(q)(spark, d).count())

    time("lsh_pairs")(ops.SimOps.lshCandidatePairs(spark, d, ops.SimOps.DefaultLsh).count())
    time("lsh_full")(SparkEntry.queries("sim_lsh_topk")(spark, d).count())
    time("knee_pairs")(ops.SimOps.lshCandidatePairs(spark, d, ops.SimOps.KneeLsh).count())
    time("knee_full")(SparkEntry.queries("sim_lsh_noprobe_baseline_topk")(spark, d).count())
    time("ivf_cands")(ops.SimOps.ivfCandidates(spark, d).count())
    time("ivf_full")(SparkEntry.queries("sim_ivf_topk")(spark, d).count())
    time("q8_full")(SparkEntry.queries("sim_q8_topk")(spark, d).count())
    time("ivf_q8_full")(SparkEntry.queries("sim_ivf_q8_topk")(spark, d).count())
    time("brute_full")(SparkEntry.queries("sim_brute_topk")(spark, d).count())

    // probe-budget sweep: time AND recall for the default config family,
    // so the time-per-recall-point tradeoff is a measured table
    import org.apache.spark.sql.functions.col
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.where(col("rank") <= 3).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val truth = topSet(SparkEntry.queries("sim_brute_topk")(spark, d))
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = topSet(df)
      truth.toSeq.map { case (qid, t) =>
        approx.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size }
        .sum / truth.size
    }
    // PQ with the corpus-clamped codebook (pqKsub(n)): recall at this SF
    val pqR = recallOf(SparkEntry.queries("sim_pq_topk")(spark, d))
    println(f"PQ     recall@3=$pqR%.3f (k=pqKsub(n), corpus-clamped)")
    time("pq_full")(SparkEntry.queries("sim_pq_topk")(spark, d).count())
    val ivfPqR = recallOf(SparkEntry.queries("sim_ivf_pq_topk")(spark, d))
    println(f"IVFPQ  recall@3=$ivfPqR%.3f (nprobe lists x ADC x rescore)")
    time("ivf_pq_full")(SparkEntry.queries("sim_ivf_pq_topk")(spark, d).count())
    val variants = Seq(
      ops.SimOps.DefaultLsh.copy(nProbes = 1),
      ops.SimOps.DefaultLsh.copy(nProbes = 2),
      ops.SimOps.DefaultLsh.copy(nProbes = 4),
      ops.SimOps.DefaultLsh.copy(nProbes = 6),
      ops.SimOps.DefaultLsh,
      ops.SimOps.LshCfg(nTables = 4, bits = 7, nProbes = 8, interleaved = true),
      ops.SimOps.LshCfg(nTables = 4, bits = 7, nProbes = 16, interleaved = true),
      ops.SimOps.LshCfg(nTables = 4, bits = 8, nProbes = 12, interleaved = true),
      ops.SimOps.LshCfg(nTables = 2, bits = 8, nProbes = 24, interleaved = true))
    for (cfg <- variants) {
      val q = ops.SimOps.lshTopK(cfg)
      q(spark, d).count() // codegen warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); q(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        dt
      }
      val approx = topSet(q(spark, d))
      val recall = truth.toSeq.map { case (qid, t) =>
        approx.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size }
        .sum / truth.size
      val frac = ops.SimOps.lshCandidatePairs(spark, d, cfg).count().toDouble /
        (Tables.embeddings(spark, d).count().toDouble * truth.size)
      println(f"SWEEP t=${cfg.nTables} b=${cfg.bits} p=${cfg.nProbes} median=${runs.sorted.apply(1)}%6.3f s  recall@3=$recall%.3f  fraction=$frac%.3f")
    }
    spark.stop()
  }
}
