package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** Bounded-state sketch operators — the structures a 100 TB pipeline
  * uses when the EXACT frame (every content hash, every distinct n-gram)
  * is itself too large to shuffle:
  *
  *  - Bloom-filter membership dedup (Bloom, CACM'70; the Dolma pipeline
  *    ships exactly this as its cross-snapshot deduper): the standing
  *    corpus is represented by O(m) BITS instead of O(rows) hashes, and
  *    an arriving batch probes k bit positions per document instead of
  *    anti-joining the full standing id set. False positives are the
  *    measured price (a small fraction of NEW docs wrongly dropped);
  *    false negatives are impossible by construction — and both facts
  *    are oracle-checked rows here, not scaladoc claims.
  *
  *  - Count-min-sketch heavy hitters (Cormode & Muthukrishnan, J.Alg'05):
  *    corpus-level n-gram frequency in d·w CELLS of state instead of one
  *    row per distinct n-gram. The exact form ([[PipelineOps.ngramTopK]])
  *    shuffles the full distinct-shingle frame; the sketch's map-side
  *    partial aggregation ships at most d·w rows per task no matter how
  *    the vocabulary grows, and merging sketches is cell-wise addition
  *    (the same associativity that makes the streaming form stateless
  *    per key). One-sided error — estimates never undercount — is an
  *    oracle-checked invariant; the overcount distribution is the
  *    measured price.
  *
  * Both families keep every hash on the md5 grid both engines share, and
  * all arithmetic is integer (bit ops, counts) — nothing order-sensitive
  * reaches the compare.
  */
object SketchOps {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------
  // Bloom filter
  // ------------------------------------------------------------------

  /** k independent salted hash positions per item. */
  private[ops] val BloomSalts = 4

  /** Target bits per inserted item. With k=4, m/n=8 the asymptotic fill
    * is 1−e^(−1/2) ≈ 0.39 and the false-positive rate (fill)^k sits in
    * the 0.6–2.4 % band across the whole next_pow2 window — production
    * bloom geometry (Dolma defaults to a comparable budget), and at
    * harness scale still enough observed FPs for the eval row to
    * measure a nonzero rate. */
  private[ops] val BloomBitsPerItem = 8

  /** Bit-array words are 32 BITS stored in BIGINT: shift amounts stay
    * ≤ 31 so `1 << b` never touches the sign bit — DuckDB BIGINT and
    * Spark LongType agree on every value without two's-complement
    * wraparound entering the compare. */
  private val WordBits = 32

  /** m candidates are powers of two 2^8..2^26 (the 2^26 = 8 MiB ceiling
    * is the broadcast budget: the probe join ships the word table to
    * every task). Beyond n = 2^23 items the clamp holds m at 2^26 and
    * the fill — and with it the measured FP rate — degrades honestly;
    * a production deployment shards the filter by hash prefix before
    * that point (the text-index range-partition shape). */
  private val MaxPow = 26
  private val MinPow = 8

  /** Content identity: md5 of the raw text (the [[DedupOps.dedupExact]]
    * key), total over null text. */
  private def hashedDocs(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      md5(coalesce(col("text"), lit(""))).as("ch"))

  /** 1-row geometry frame (n, m): m = smallest power of two ≥
    * [[BloomBitsPerItem]]·n over distinct standing items, clamped to
    * 2^[[MaxPow]]. pow(2, p) for integer p is IEEE-exact, so both
    * engines derive the identical m from the identical n. */
  private def bloomGeom(standing: DataFrame): DataFrame =
    standing.agg(countDistinct("ch").as("n0"))
      .select(greatest(col("n0"), lit(1L)).as("n"))
      .select(col("n"), expr(
        s"""coalesce(array_min(filter(
              transform(sequence($MinPow, $MaxPow), p -> CAST(pow(2, p) AS BIGINT)),
              v -> v >= $BloomBitsPerItem * n)),
            CAST(pow(2, $MaxPow) AS BIGINT))""").as("m"))

  /** (pos) bit positions for every row of a hashed frame: k salted
    * 32-bit md5 prefixes mod m. Carries through `keep` columns. */
  private def bloomPositions(hashed: DataFrame, geom: DataFrame,
      keep: Seq[String]): DataFrame =
    hashed.crossJoin(broadcast(geom))
      .select(keep.map(col) :+ explode(expr(
        s"""transform(sequence(0, ${BloomSalts - 1}), i ->
              CAST(conv(substring(md5(concat('bloom', CAST(i AS STRING), ':', ch)), 1, 8), 16, 10) AS BIGINT) % m)"""))
        .as("pos"): _*)

  /** Sparse word table (word_idx, word): only words with ≥1 bit set
    * exist as rows — at most m/[[WordBits]] rows, broadcastable by the
    * [[MaxPow]] clamp. */
  private def bloomWords(positions: DataFrame): DataFrame =
    positions
      .select(expr(s"pos div $WordBits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))").as("bm"))
      .groupBy("word_idx").agg(expr("bit_or(bm)").as("word"))

  /** Per-document probe results against a standing-half bloom. The probe
    * population is ALL documents — standing docs re-probe their own
    * filter, which pins the no-false-negative guarantee as output rows
    * (every in_standing=1 row MUST read bloom_hit=1), and incoming docs
    * measure the filter's real answer. Probe cost per doc: k word
    * lookups against the broadcast word table — never a shuffle of the
    * standing id set. */
  private def bloomProbe(s: SparkSession, d: String): DataFrame = {
    val docs = hashedDocs(s, d)
    val standing = docs.where(col("doc_id") % 2 === 0)
    val geom = bloomGeom(standing)
    val words = bloomWords(bloomPositions(standing.select("ch").distinct(), geom, Seq("ch")))
    val probes = docs.withColumn("in_standing",
      (col("doc_id") % 2 === 0).cast("int"))
    bloomPositions(probes, geom, Seq("doc_id", "ch", "in_standing"))
      .withColumn("word_idx", expr(s"pos div $WordBits"))
      .join(broadcast(words), Seq("word_idx"), "left")
      .withColumn("hit", expr(
        s"CASE WHEN word IS NOT NULL AND (shiftright(word, CAST(pos % $WordBits AS INT)) & 1) = 1 THEN 1 ELSE 0 END"))
      .groupBy("doc_id", "ch", "in_standing")
      .agg(min("hit").as("bloom_hit"))
  }

  /** Membership answer per document: standing rows pin the guarantee
    * (bloom_hit = 1 always), incoming rows are the dedup decision a
    * Dolma-style cross-snapshot pass would act on. */
  val dedupBloom: Q = (s, d) =>
    bloomProbe(s, d)
      .select(col("doc_id"), col("in_standing"), col("bloom_hit"))
      .orderBy("doc_id")

  // ------------------------------------------------------------------
  // Sharded bloom — the capacity path past the single-filter broadcast
  // clamp, implemented rather than waved at: the hash's FIRST NIBBLE
  // routes every item to one of 16 sub-filters, each with its own
  // geometry from its own standing count. Capacity before fp
  // degradation grows 16x (and the nibble count is the dial: two
  // nibbles = 256x); more importantly the probe join is keyed
  // (shard, word_idx), so at scale the word table drops the broadcast
  // hint, lives range-partitioned by shard on disk, and each probe
  // touches only its shard's partition (the text-index prune shape) —
  // no single task ever holds the whole filter.
  // ------------------------------------------------------------------

  /** md5 is uniform, so the first nibble splits the corpus evenly. */
  private val ShardExpr = "substring(ch, 1, 1)"

  /** (shard, m): per-shard geometry from the shard's own standing
    * distinct count — the same next-pow2 rule per sub-filter. */
  private def shardedGeom(standingCh: DataFrame): DataFrame =
    standingCh.groupBy(expr(ShardExpr).as("shard"))
      .agg(countDistinct("ch").as("n0"))
      .select(col("shard"), greatest(col("n0"), lit(1L)).as("n"))
      .select(col("shard"), expr(
        s"""coalesce(array_min(filter(
              transform(sequence($MinPow, $MaxPow), p -> CAST(pow(2, p) AS BIGINT)),
              v -> v >= $BloomBitsPerItem * n)),
            CAST(pow(2, $MaxPow) AS BIGINT))""").as("m"))

  /** Bit positions within a row's own shard (the frame must already
    * carry `shard` and `m`). */
  private def shardedPositions(withGeom: DataFrame, keep: Seq[String]): DataFrame =
    withGeom.select((keep :+ "shard").map(col) :+ explode(expr(
      s"""transform(sequence(0, ${BloomSalts - 1}), i ->
            CAST(conv(substring(md5(concat('bloom', CAST(i AS STRING), ':', ch)), 1, 8), 16, 10) AS BIGINT) % m)"""))
      .as("pos"): _*)

  /** Sharded membership probe, same population split as [[dedupBloom]]
    * (standing = even doc_ids, everyone probes). A probe whose shard
    * holds NO standing item has no sub-filter to hit — bloom_hit 0 by
    * construction, handled via the left geometry join rather than
    * assumed away. Per-shard false negatives stay impossible: an item
    * and its duplicate share a hash, hence a shard, hence a geometry. */
  val dedupBloomSharded: Q = (s, d) => {
    val docs = hashedDocs(s, d)
    val standing = docs.where(col("doc_id") % 2 === 0)
    val geoms = shardedGeom(standing.select("ch").distinct())
    val words = shardedPositions(
      standing.select("ch").distinct()
        .withColumn("shard", expr(ShardExpr))
        .join(broadcast(geoms), "shard"), Seq("ch"))
      .select(col("shard"), expr(s"pos div $WordBits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))").as("bm"))
      .groupBy("shard", "word_idx").agg(expr("bit_or(bm)").as("word"))
    val probes = docs
      .withColumn("in_standing", (col("doc_id") % 2 === 0).cast("int"))
      .withColumn("shard", expr(ShardExpr))
      .join(broadcast(geoms), Seq("shard"), "left")
    val gated = probes.where(col("m").isNotNull)
    val hits = shardedPositions(gated, Seq("doc_id", "ch", "in_standing"))
      .withColumn("word_idx", expr(s"pos div $WordBits"))
      .join(broadcast(words), Seq("shard", "word_idx"), "left")
      .withColumn("hit", expr(
        s"CASE WHEN word IS NOT NULL AND (shiftright(word, CAST(pos % $WordBits AS INT)) & 1) = 1 THEN 1 ELSE 0 END"))
      .groupBy("doc_id", "in_standing")
      .agg(min("hit").as("bloom_hit"))
    probes.where(col("m").isNull)
      .select(col("doc_id"), col("in_standing"), lit(0).as("bloom_hit"))
      .unionByName(hits.select("doc_id", "in_standing", "bloom_hit"))
      .orderBy("doc_id")
  }

  /** Incremental append — the bloom form of the established
    * `_incremental` convention: the standing filter (built from the
    * doc_id%4==0 quarter) absorbs a later batch (doc_id%4==2) by
    * cell-wise OR at the STANDING geometry. A bloom cannot resize —
    * appends inherit m exactly as the z-order incremental inherits its
    * lattice (append-only structures can't re-normalize their past) —
    * and OR-associativity makes the merged table value-identical to a
    * direct build over the union at the same m, which is what the
    * oracle computes. word_standing rides along so every output row
    * also pins the superset property (word & word_standing =
    * word_standing). */
  val dedupBloomIncremental: Q = (s, d) => {
    val docs = hashedDocs(s, d)
    val standing = docs.where(col("doc_id") % 4 === 0)
    val batch = docs.where(col("doc_id") % 4 === 2)
    val geom = bloomGeom(standing)
    val sw = bloomWords(bloomPositions(standing.select("ch").distinct(), geom, Seq("ch")))
      .withColumnRenamed("word", "word_standing")
    val bw = bloomWords(bloomPositions(batch.select("ch").distinct(), geom, Seq("ch")))
      .withColumnRenamed("word", "word_batch")
    sw.join(bw, Seq("word_idx"), "full_outer")
      .select(col("word_idx"), col("word_standing"),
        expr("coalesce(word_standing, CAST(0 AS BIGINT)) | coalesce(word_batch, CAST(0 AS BIGINT))").as("word"))
      .orderBy("word_idx")
  }

  /** The measured instrument: filter geometry, exact truth, and the
    * error decomposition in one oracle-checked row. false_neg counts
    * BOTH failure directions the guarantee forbids (a standing doc its
    * own filter misses, an incoming true duplicate the filter misses)
    * and must be 0; fp_micro is the observed false-positive rate over
    * the genuinely-new incoming docs — the fraction of fresh data a
    * production run would wrongly discard, the number the
    * [[BloomBitsPerItem]] budget buys. */
  val dedupBloomEval: Q = (s, d) => {
    val probe = bloomProbe(s, d)
    val standCh = probe.where(col("in_standing") === 1)
      .select("ch").distinct().withColumn("present", lit(1))
    val t = probe.join(standCh, Seq("ch"), "left")
      .withColumn("true_dup",
        when(col("in_standing") === 0 && col("present").isNotNull, 1).otherwise(0))
    val geomRow = bloomGeom(
      hashedDocs(s, d).where(col("doc_id") % 2 === 0))
    t.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("in_standing") === 0, 1).otherwise(0)).as("n_incoming"),
      sum("true_dup").as("true_dups"),
      sum(when(col("in_standing") === 0 && col("bloom_hit") === 1, 1).otherwise(0)).as("bloom_hits_incoming"),
      sum(when(col("in_standing") === 0 && col("true_dup") === 0 && col("bloom_hit") === 1, 1).otherwise(0)).as("false_pos"),
      sum(when((col("in_standing") === 1 || col("true_dup") === 1) && col("bloom_hit") === 0, 1).otherwise(0)).as("false_neg"))
      .crossJoin(broadcast(geomRow))
      .select(col("n").as("n_standing"), col("m").as("m_bits"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_incoming"), lit(0L)).as("n_incoming"),
        coalesce(col("true_dups"), lit(0L)).as("true_dups"),
        coalesce(col("bloom_hits_incoming"), lit(0L)).as("bloom_hits_incoming"),
        coalesce(col("false_pos"), lit(0L)).as("false_pos"),
        coalesce(col("false_neg"), lit(0L)).as("false_neg"))
      .withColumn("fp_micro", expr(
        "CAST(round(CAST(false_pos * 1000000 AS DOUBLE) / greatest(n_incoming - true_dups, 1), 0) AS BIGINT)"))
  }

  // ------------------------------------------------------------------
  // Count-min sketch
  // ------------------------------------------------------------------

  /** d hash rows × w counters. d=4 gives per-item bound-miss probability
    * e^−4 ≈ 1.8 %; w sets the overcount scale ε·N = (e/w)·N. The sketch
    * is d·w = 64k cells — map-side partials ship at most that many rows
    * per task regardless of vocabulary size.
    *
    * What the geometry buys, measured on the harness corpus: the CMS
    * guarantee P[over > (e/w)·N] ≤ e^−d holds with room at every SF
    * (bound_miss 0 of 27k grams at sf0.1 — max_over 37 vs the bound's
    * 43 — and 0 of 686k at sf1, max_over 274 vs 432); that is the
    * `bound_miss` column, and with `n_under` it is the pair of
    * invariants the sketch actually promises. The top-20 RANKING gauge
    * is corpus-bound teaching material: the harness 3-gram df
    * distribution is FLAT (max true df ≈ its near-dup group size, no
    * Zipf head), so once the collision mass N/w reaches the max df the
    * overcounted singletons outrank the true head — measured overlap
    * 10/20 at sf0.01 (N/w ≈ 1.6), 0/20 at sf0.1 (N/w ≈ 16). On a real
    * web corpus the heavy head is orders of magnitude above ε·N and the
    * ranking separates (SketchSpec's planted-head corpus shows exactly
    * that: df=30 hitters over singleton noise rank 1.0); a first draft
    * at w=512 saturated even the planted head — both regimes are the
    * same mechanism, and the eval row prices it instead of assuming
    * it. */
  private[ops] val CmsD = 4
  private[ops] val CmsW = 16384
  private val CmsTopN = 20

  /** (r, c, cnt) sketch cells over the corpus shingle stream — the same
    * doc-distinct word-3-gram stream the exact
    * [[PipelineOps.ngramTopK]] counts, so est(g) approximates that
    * query's df exactly. */
  private def cmsCells(sh: DataFrame): DataFrame =
    sh.select(explode(expr(
      s"""transform(sequence(0, ${CmsD - 1}), r -> named_struct(
            'r', r,
            'c', CAST(conv(substring(md5(concat('cms', CAST(r AS STRING), ':', sh)), 1, 8), 16, 10) AS BIGINT) % $CmsW))"""))
      .as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** (sh, df_true, df_est): every distinct gram's exact df beside its
    * sketch estimate (min over the d cells it hashes to). The join side
    * is the 2048-cell sketch — broadcast, never a shuffle of the gram
    * frame. */
  private def cmsEstimates(s: SparkSession, d: String): DataFrame = {
    val sh = DedupOps.docShingles(s, d)
    val cells = cmsCells(sh)
    sh.groupBy("sh").agg(count(lit(1)).as("df_true"))
      .select(col("sh"), col("df_true"), explode(expr(
        s"""transform(sequence(0, ${CmsD - 1}), r -> named_struct(
              'r', r,
              'c', CAST(conv(substring(md5(concat('cms', CAST(r AS STRING), ':', sh)), 1, 8), 16, 10) AS BIGINT) % $CmsW))"""))
        .as("rc"))
      .join(broadcast(cells),
        col("rc.r") === col("r") && col("rc.c") === col("c"))
      .groupBy("sh", "df_true")
      .agg(min("cnt").as("df_est"))
  }

  /** Heavy hitters by CMS estimate — the sketch-sized answer to
    * [[PipelineOps.ngramTopK]]'s question. Runs as
    * TakeOrderedAndProject over the estimate frame; ties break on the
    * gram so the cut is deterministic. */
  val ngramCmsTopK: Q = (s, d) =>
    cmsEstimates(s, d)
      .select(col("sh"), col("df_est"))
      .orderBy(col("df_est").desc, col("sh"))
      .limit(CmsTopN)

  /** Incremental sketch append — [[dedupBloomIncremental]]'s convention
    * for the ADDITIVE monoid: the standing quarter's cells
    * (doc_id%4==0) absorb a later batch (doc_id%4==2) by cell-wise
    * addition, value-identical to a direct build over the union
    * (shingling is per-doc, so no chunking can change any cell).
    * cnt_standing rides along so every output row also pins
    * monotonicity — cells only ever grow. Unlike the bloom, a CMS
    * append carries real information loss nowhere: the merge is exact,
    * which is why distributed sketch roll-ups (per-partition partials,
    * per-day partials, cross-datacenter unions) are the structure's
    * whole deployment story. */
  val ngramCmsIncremental: Q = (s, d) => {
    val sh = DedupOps.docShingles(s, d)
    val cs = cmsCells(sh.where(col("doc_id") % 4 === 0))
      .withColumnRenamed("cnt", "cnt_standing")
    val cb = cmsCells(sh.where(col("doc_id") % 4 === 2))
      .withColumnRenamed("cnt", "cnt_batch")
    cs.join(cb, Seq("r", "c"), "full_outer")
      .select(col("r"), col("c"), col("cnt_standing"),
        (coalesce(col("cnt_standing"), lit(0L)) +
          coalesce(col("cnt_batch"), lit(0L))).as("cnt"))
      .orderBy("r", "c")
  }

  /** e in integer micros — the CMS bound's only transcendental, pinned
    * as a constant so both engines derive the identical integer
    * threshold floor(e·N/w) by pure BIGINT arithmetic. */
  private val EMicro = 2718282L

  /** The sketch's measured error, one oracle-checked row. The two
    * INVARIANTS the sketch promises: n_under MUST be 0 (CMS never
    * underestimates — cells only ever add) and n_bound_miss — grams
    * whose overcount exceeds the theorem's ε·N = (e/w)·N — is bounded
    * by e^−d per gram (measured 0 at every SF; Bench gates on the
    * rate). n_exact / max_over / mean_over_micro quantify the collision
    * overcount the cell budget costs on this corpus, and top20_overlap
    * is the RANKING gauge — how many of the exact heavy-hitter top-20
    * the sketch ranking reproduces (corpus-bound on the flat harness df
    * distribution, see the geometry scaladoc; both rankings tie-break
    * on the gram, so the cut is deterministic in both engines). */
  val ngramCmsEval: Q = (s, d) => {
    val est = cmsEstimates(s, d).localCheckpoint()
    val overlap = est.orderBy(col("df_est").desc, col("sh")).limit(CmsTopN)
      .select("sh")
      .join(est.orderBy(col("df_true").desc, col("sh")).limit(CmsTopN)
        .select("sh"), "sh")
      .agg(count(lit(1)).as("top20_overlap"))
    val tot = est.agg(coalesce(sum("df_true"), lit(0L)).as("n_inc"))
    est.crossJoin(broadcast(tot))
      .withColumn("bound", expr(s"($EMicro * n_inc) div ${CmsW * 1000000L}"))
      .agg(
        count(lit(1)).as("n_grams"),
        coalesce(max("n_inc"), lit(0L)).as("n_increments"),
        lit(CmsD).as("d_rows"), lit(CmsW).as("w_cols"),
        coalesce(sum(when(col("df_est") < col("df_true"), 1L).otherwise(0L)), lit(0L)).as("n_under"),
        coalesce(sum(when(col("df_est") - col("df_true") > col("bound"), 1L).otherwise(0L)), lit(0L)).as("n_bound_miss"),
        coalesce(sum(when(col("df_est") === col("df_true"), 1L).otherwise(0L)), lit(0L)).as("n_exact"),
        coalesce(max(col("df_est") - col("df_true")), lit(0L)).as("max_over"),
        coalesce(sum(col("df_est") - col("df_true")), lit(0L)).as("sum_over"))
      .withColumn("mean_over_micro", expr(
        "CAST(round(CAST(sum_over * 1000000 AS DOUBLE) / greatest(n_grams, 1), 0) AS BIGINT)"))
      .drop("sum_over")
      .crossJoin(broadcast(overlap))
  }

  // ------------------------------------------------------------------
  // Registration
  // ------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "dedup_bloom" -> dedupBloom,
    "dedup_bloom_sharded" -> dedupBloomSharded,
    "dedup_bloom_incremental" -> dedupBloomIncremental,
    "dedup_bloom_eval" -> dedupBloomEval,
    "text_ngram_cms_topk" -> ngramCmsTopK,
    "text_ngram_cms_incremental" -> ngramCmsIncremental,
    "text_ngram_cms_eval" -> ngramCmsEval,
  )

  // ------------------------------------------------------------------
  // Persisted sketch indexes — the 4th index family (after IVF, PQ and
  // the text inverted index), with the family's standing contract:
  // offline build, incremental append whose cost is the batch's own
  // size, read-time merge that makes at-least-once replays invisible,
  // and a query path that never rescans the corpus the index stands
  // for. The sketch twist is that BOTH structures are monoids, so the
  // append log IS the index: bloom words merge by bit_or (idempotent —
  // even a partially-written append retried in full is absorbed), CMS
  // cells merge by sum (NOT idempotent — replay safety instead comes
  // from the (batch_id, r, c) key: Structured Streaming redelivers a
  // batch under the SAME batch_id, and the one-row-per-key dedup drops
  // the double count before the sum).
  // ------------------------------------------------------------------

  /** Build the standing bloom filter for corpus `d`: `dir/geom` (one
    * row: n, m — the filter's frozen shape) and `dir/words` (sparse
    * word table). Appends inherit this geometry forever (a bloom cannot
    * resize; the [[dedupBloomIncremental]] scaladoc carries the
    * consequence), so the build is where capacity is decided — in
    * production n comes from the planned corpus size, here from the
    * build corpus. */
  def buildBloomIndex(s: SparkSession, d: String, dir: String): Unit = {
    val hashed = hashedDocs(s, d).select("ch").distinct()
    val geom = bloomGeom(hashed)
    geom.coalesce(1).write.mode("overwrite").parquet(dir + "/geom")
    bloomWords(bloomPositions(hashed, s.read.parquet(dir + "/geom"), Seq("ch")))
      .write.mode("overwrite").parquet(dir + "/words")
  }

  /** Append a `(doc_id, text)` batch: hash, position at the STANDING
    * geometry, append the batch's own sparse word table as new files —
    * cost ∝ batch size, standing rows never rewritten. Idempotent under
    * any replay interleaving by OR-monoid absorption at read time.
    * Bootstrap: an append into a dir with no geometry freezes the
    * FIRST BATCH's count as capacity (the streaming twin's cold start;
    * a production deployment builds with planned capacity instead —
    * the fp_micro gauge is what degrades if the corpus outgrows it). */
  def appendToBloomIndex(s: SparkSession, dir: String, docs: DataFrame): Unit = {
    val geomPath = new org.apache.hadoop.fs.Path(dir + "/geom")
    val fs = geomPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hashed = docs
      .select(md5(coalesce(col("text"), lit(""))).as("ch")).distinct()
    if (!fs.exists(geomPath))
      bloomGeom(hashed).coalesce(1).write.mode("overwrite").parquet(dir + "/geom")
    enrollHashes(s, dir, hashed)
  }

  /** Geometry frame over an already-distinct hash frame — exposed for
    * the ingest twins' cold-start bootstrap. */
  def bloomGeomOf(distinctCh: DataFrame): DataFrame = bloomGeom(distinctCh)

  /** Append a distinct-`ch` frame's sparse word table at the STANDING
    * geometry (the enrollment half of probe-then-insert; OR-idempotent
    * like every bloom append). */
  def enrollHashes(s: SparkSession, dir: String, distinctCh: DataFrame): Unit =
    bloomWords(bloomPositions(distinctCh, s.read.parquet(dir + "/geom"), Seq("ch")))
      .write.mode("append").parquet(dir + "/words")

  /** Probe an arbitrary `(doc_id, ch)` frame against the persisted
    * filter: the append log compacts to one word per word_idx by bit_or
    * (the read-time merge), then each row reads its k word cells from
    * the broadcast table. Output (doc_id, bloom_hit). */
  def bloomHitsOf(s: SparkSession, hashed: DataFrame, dir: String): DataFrame = {
    val geom = s.read.parquet(dir + "/geom")
    val words = s.read.parquet(dir + "/words")
      .groupBy("word_idx").agg(expr("bit_or(word)").as("word"))
    bloomPositions(hashed, geom, Seq("doc_id", "ch"))
      .withColumn("word_idx", expr(s"pos div $WordBits"))
      .join(broadcast(words), Seq("word_idx"), "left")
      .withColumn("hit", expr(
        s"CASE WHEN word IS NOT NULL AND (shiftright(word, CAST(pos % $WordBits AS INT)) & 1) = 1 THEN 1 ELSE 0 END"))
      .groupBy("doc_id")
      .agg(min("hit").as("bloom_hit"))
  }

  /** Membership probe of every document of corpus `d`. */
  def bloomHitsFromIndex(s: SparkSession, d: String, dir: String): DataFrame =
    bloomHitsOf(s, hashedDocs(s, d), dir).orderBy("doc_id")

  /** Build the standing CMS for corpus `d`: `dir/cells` rows of
    * (batch_id, r, c, cnt); the build writes under batch_id −1 (the
    * streaming appends use their nonnegative micro-batch ids). */
  def buildCmsIndex(s: SparkSession, d: String, dir: String): Unit =
    cmsCells(DedupOps.docShingles(s, d))
      .select(lit(-1L).as("batch_id"), col("r"), col("c"), col("cnt"))
      .write.mode("overwrite").parquet(dir + "/cells")

  /** Append a `(doc_id, text)` batch's cells under its batch id. Counts
    * are additive, so chunked ingest sums to the whole-corpus sketch
    * exactly (shingling is per-doc); a redelivered batch re-appends the
    * IDENTICAL (batch_id, r, c, cnt) rows, which the read-time
    * per-key dedup collapses — the additive merge never sees the
    * double count. */
  def appendToCmsIndex(s: SparkSession, dir: String, docs: DataFrame,
      batchId: Long): Unit = {
    graft.expressions.TextShingles.register(s)
    val sh = docs.select(col("doc_id"),
      explode(expr("text_shingles(text, 3)")).as("sh"))
    cmsCells(sh)
      .select(lit(batchId).as("batch_id"), col("r"), col("c"), col("cnt"))
      .write.mode("append").parquet(dir + "/cells")
  }

  /** The standing sketch: replay-deduped, then cell-wise summed. */
  private def cmsMergedCells(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir + "/cells")
      .dropDuplicates("batch_id", "r", "c")
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))

  /** Heavy hitters of corpus `d` scored against the PERSISTED sketch —
    * byte-equal to [[ngramCmsTopK]] when the index holds exactly `d`
    * (SketchIndexSpec pins it): the only corpus work is deriving the
    * distinct grams to score; the sketch side is the merged d·w cells,
    * broadcast as ever. */
  def cmsTopKFromIndex(s: SparkSession, d: String, dir: String): DataFrame = {
    val sh = DedupOps.docShingles(s, d)
    val cells = cmsMergedCells(s, dir)
    sh.select("sh").distinct()
      .select(col("sh"), explode(expr(
        s"""transform(sequence(0, ${CmsD - 1}), r -> named_struct(
              'r', r,
              'c', CAST(conv(substring(md5(concat('cms', CAST(r AS STRING), ':', sh)), 1, 8), 16, 10) AS BIGINT) % $CmsW))"""))
        .as("rc"))
      .join(broadcast(cells),
        col("rc.r") === col("r") && col("rc.c") === col("c"))
      .groupBy("sh")
      .agg(min("cnt").as("df_est"))
      .orderBy(col("df_est").desc, col("sh"))
      .limit(CmsTopN)
  }

  // ------------------------------------------------------------------
  // DuckDB oracles
  // ------------------------------------------------------------------

  /** Numeric value of the first 8 hex nibbles (32 bits) of an md5-string
    * column — the DuckDB spelling of Spark's
    * `CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)`. */
  private[ops] def hex32(h: String): String =
    (1 to 8).map(i => s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)")
      .reduceLeft((acc, nib) => s"($acc * 16 + $nib)")

  /** Shared bloom CTE prefix: content hashes, standing geometry, and the
    * standing word table under a `where` predicate selecting the
    * standing half. */
  private def bloomSql(standingWhere: String): String =
    raw"""ch AS (SELECT doc_id, md5(coalesce(text, '')) AS ch FROM documents),
       geom AS (SELECT n, coalesce(
             list_min(list_filter(
               list_transform(range($MinPow, ${MaxPow + 1}), p -> CAST(pow(2, p) AS BIGINT)),
               v -> v >= $BloomBitsPerItem * n)),
             CAST(pow(2, $MaxPow) AS BIGINT)) AS m
           FROM (SELECT greatest(count(DISTINCT ch), 1) AS n FROM ch WHERE $standingWhere)),
       spos AS (SELECT ${hex32("md5('bloom' || CAST(i AS VARCHAR) || ':' || s.ch)")} % g.m AS pos
           FROM (SELECT DISTINCT ch FROM ch WHERE $standingWhere) s
           CROSS JOIN range(0, $BloomSalts) t(i) CROSS JOIN geom g),
       words AS (SELECT pos // $WordBits AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INT)) AS word
           FROM spos GROUP BY pos // $WordBits)"""

  /** Probe CTE: per-doc bloom_hit over all documents. */
  private val BloomProbeSql =
    raw"""ppos AS (SELECT c.doc_id, c.ch,
             CASE WHEN c.doc_id % 2 = 0 THEN 1 ELSE 0 END AS in_standing,
             ${hex32("md5('bloom' || CAST(i AS VARCHAR) || ':' || c.ch)")} % g.m AS pos
           FROM ch c CROSS JOIN range(0, $BloomSalts) t(i) CROSS JOIN geom g),
       hits AS (SELECT p.doc_id, p.ch, p.in_standing,
             CASE WHEN w.word IS NOT NULL
                   AND ((w.word >> CAST(p.pos % $WordBits AS INT)) & 1) = 1
                  THEN 1 ELSE 0 END AS hit
           FROM ppos p LEFT JOIN words w ON w.word_idx = p.pos // $WordBits),
       probe AS (SELECT doc_id, ch, in_standing, min(hit) AS bloom_hit
           FROM hits GROUP BY doc_id, ch, in_standing)"""

  val oracles: Map[String, String] = Map(
    "dedup_bloom" ->
      raw"""WITH ${bloomSql("doc_id % 2 = 0")},
           $BloomProbeSql
           SELECT doc_id, CAST(in_standing AS INT) AS in_standing,
             CAST(bloom_hit AS INT) AS bloom_hit
           FROM probe ORDER BY doc_id""",
    "dedup_bloom_sharded" ->
      raw"""WITH ch AS (SELECT doc_id, md5(coalesce(text, '')) AS ch FROM documents),
           sgeo AS (SELECT shard, coalesce(
                 list_min(list_filter(
                   list_transform(range($MinPow, ${MaxPow + 1}), p -> CAST(pow(2, p) AS BIGINT)),
                   v -> v >= $BloomBitsPerItem * n)),
                 CAST(pow(2, $MaxPow) AS BIGINT)) AS m
               FROM (SELECT substr(ch, 1, 1) AS shard,
                       greatest(count(DISTINCT ch), 1) AS n
                     FROM ch WHERE doc_id % 2 = 0 GROUP BY substr(ch, 1, 1))),
           sspos AS (SELECT s.shard, ${hex32("md5('bloom' || CAST(i AS VARCHAR) || ':' || s.ch)")} % g.m AS pos
               FROM (SELECT DISTINCT substr(ch, 1, 1) AS shard, ch FROM ch WHERE doc_id % 2 = 0) s
               JOIN sgeo g USING (shard) CROSS JOIN range(0, $BloomSalts) t(i)),
           swords AS (SELECT shard, pos // $WordBits AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INT)) AS word
               FROM sspos GROUP BY shard, pos // $WordBits),
           sppos AS (SELECT c.doc_id,
                 CASE WHEN c.doc_id % 2 = 0 THEN 1 ELSE 0 END AS in_standing,
                 substr(c.ch, 1, 1) AS shard, g.m,
                 CASE WHEN g.m IS NULL THEN NULL
                      ELSE ${hex32("md5('bloom' || CAST(i AS VARCHAR) || ':' || c.ch)")} % g.m END AS pos
               FROM ch c LEFT JOIN sgeo g ON g.shard = substr(c.ch, 1, 1)
               CROSS JOIN range(0, $BloomSalts) t(i)),
           shits AS (SELECT p.doc_id, p.in_standing,
                 CASE WHEN p.m IS NULL THEN 0
                      WHEN w.word IS NOT NULL
                       AND ((w.word >> CAST(p.pos % $WordBits AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END AS hit
               FROM sppos p LEFT JOIN swords w
                 ON w.shard = p.shard AND w.word_idx = p.pos // $WordBits)
           SELECT doc_id, CAST(in_standing AS INT) AS in_standing,
             CAST(min(hit) AS INT) AS bloom_hit
           FROM shits GROUP BY doc_id, in_standing ORDER BY doc_id""",
    "dedup_bloom_incremental" ->
      raw"""WITH ${bloomSql("doc_id % 4 = 0")},
           bpos AS (SELECT ${hex32("md5('bloom' || CAST(i AS VARCHAR) || ':' || s.ch)")} % g.m AS pos
               FROM (SELECT DISTINCT ch FROM ch WHERE doc_id % 4 = 2) s
               CROSS JOIN range(0, $BloomSalts) t(i) CROSS JOIN geom g),
           bwords AS (SELECT pos // $WordBits AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INT)) AS word_batch
               FROM bpos GROUP BY pos // $WordBits)
           SELECT coalesce(w.word_idx, b.word_idx) AS word_idx,
             w.word AS word_standing,
             (coalesce(w.word, CAST(0 AS BIGINT)) | coalesce(b.word_batch, CAST(0 AS BIGINT))) AS word
           FROM words w FULL OUTER JOIN bwords b ON w.word_idx = b.word_idx
           ORDER BY word_idx""",
    "dedup_bloom_eval" ->
      raw"""WITH ${bloomSql("doc_id % 2 = 0")},
           $BloomProbeSql,
           truth AS (SELECT p.doc_id, p.in_standing, p.bloom_hit,
               CASE WHEN p.in_standing = 0 AND p.ch IN
                 (SELECT DISTINCT ch FROM ch WHERE doc_id % 2 = 0)
               THEN 1 ELSE 0 END AS true_dup
             FROM probe p),
           agg AS (SELECT count(*) AS n_docs,
               coalesce(SUM(CASE WHEN in_standing = 0 THEN 1 ELSE 0 END), 0) AS n_incoming,
               coalesce(SUM(true_dup), 0) AS true_dups,
               coalesce(SUM(CASE WHEN in_standing = 0 AND bloom_hit = 1 THEN 1 ELSE 0 END), 0) AS bloom_hits_incoming,
               coalesce(SUM(CASE WHEN in_standing = 0 AND true_dup = 0 AND bloom_hit = 1 THEN 1 ELSE 0 END), 0) AS false_pos,
               coalesce(SUM(CASE WHEN (in_standing = 1 OR true_dup = 1) AND bloom_hit = 0 THEN 1 ELSE 0 END), 0) AS false_neg
             FROM truth)
           SELECT g.n AS n_standing, g.m AS m_bits,
             CAST(a.n_docs AS BIGINT) AS n_docs,
             CAST(a.n_incoming AS BIGINT) AS n_incoming,
             CAST(a.true_dups AS BIGINT) AS true_dups,
             CAST(a.bloom_hits_incoming AS BIGINT) AS bloom_hits_incoming,
             CAST(a.false_pos AS BIGINT) AS false_pos,
             CAST(a.false_neg AS BIGINT) AS false_neg,
             CAST(round(CAST(a.false_pos * 1000000 AS DOUBLE) /
               greatest(a.n_incoming - a.true_dups, 1), 0) AS BIGINT) AS fp_micro
           FROM agg a CROSS JOIN geom g""",
    "text_ngram_cms_topk" ->
      raw"""WITH ${DedupOps.ShinglesSql},
           $CmsCellsSql,
           $CmsEstSql
           SELECT sh, df_est FROM est
           ORDER BY df_est DESC, sh LIMIT $CmsTopN""",
    "text_ngram_cms_incremental" ->
      raw"""WITH ${DedupOps.ShinglesSql},
           csrc AS (SELECT t.r, md5('cms' || CAST(t.r AS VARCHAR) || ':' || sh.sh) AS h
               FROM sh CROSS JOIN range(0, $CmsD) t(r) WHERE sh.doc_id % 4 = 0),
           cs AS (SELECT r, ${hex32("h")} % $CmsW AS c,
                 CAST(count(*) AS BIGINT) AS cnt_standing
               FROM csrc GROUP BY r, ${hex32("h")} % $CmsW),
           bsrc AS (SELECT t.r, md5('cms' || CAST(t.r AS VARCHAR) || ':' || sh.sh) AS h
               FROM sh CROSS JOIN range(0, $CmsD) t(r) WHERE sh.doc_id % 4 = 2),
           cb AS (SELECT r, ${hex32("h")} % $CmsW AS c,
                 CAST(count(*) AS BIGINT) AS cnt_batch
               FROM bsrc GROUP BY r, ${hex32("h")} % $CmsW)
           SELECT CAST(r AS INT) AS r, CAST(c AS BIGINT) AS c, cnt_standing,
             (coalesce(cnt_standing, 0) + coalesce(cnt_batch, 0)) AS cnt
           FROM cs FULL OUTER JOIN cb USING (r, c)
           ORDER BY r, c""",
    "text_ngram_cms_eval" ->
      raw"""WITH ${DedupOps.ShinglesSql},
           $CmsCellsSql,
           $CmsEstSql,
           topc AS (SELECT sh FROM (SELECT sh, row_number() OVER (ORDER BY df_est DESC, sh) AS rn FROM est) WHERE rn <= $CmsTopN),
           topt AS (SELECT sh FROM (SELECT sh, row_number() OVER (ORDER BY df_true DESC, sh) AS rn FROM est) WHERE rn <= $CmsTopN),
           ov AS (SELECT CAST(count(*) AS BIGINT) AS top20_overlap FROM topc JOIN topt USING (sh)),
           tot AS (SELECT coalesce(SUM(df_true), 0) AS n_inc FROM est)
           SELECT CAST(count(*) AS BIGINT) AS n_grams,
             CAST(coalesce(MAX(t.n_inc), 0) AS BIGINT) AS n_increments,
             CAST($CmsD AS INT) AS d_rows, CAST($CmsW AS INT) AS w_cols,
             CAST(coalesce(SUM(CASE WHEN df_est < df_true THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_under,
             CAST(coalesce(SUM(CASE WHEN df_est - df_true > ($EMicro * t.n_inc) // ${CmsW * 1000000L} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bound_miss,
             CAST(coalesce(SUM(CASE WHEN df_est = df_true THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_exact,
             CAST(coalesce(MAX(df_est - df_true), 0) AS BIGINT) AS max_over,
             CAST(round(CAST(coalesce(SUM(df_est - df_true), 0) * 1000000 AS DOUBLE) /
               greatest(count(*), 1), 0) AS BIGINT) AS mean_over_micro,
             (SELECT top20_overlap FROM ov) AS top20_overlap
           FROM est CROSS JOIN tot t""",
  )

  private lazy val CmsCellsSql =
    raw"""shc AS (SELECT r, ${hex32("h")} % $CmsW AS c FROM (
           SELECT t.r, md5('cms' || CAST(t.r AS VARCHAR) || ':' || sh.sh) AS h
           FROM sh CROSS JOIN range(0, $CmsD) t(r))),
       cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS cnt
           FROM shc GROUP BY r, c)"""

  private lazy val CmsEstSql =
    raw"""grams AS (SELECT sh, CAST(count(*) AS BIGINT) AS df_true FROM sh GROUP BY sh),
       gc AS (SELECT sh, df_true, r, ${hex32("h")} % $CmsW AS c FROM (
           SELECT g.sh, g.df_true, t.r,
             md5('cms' || CAST(t.r AS VARCHAR) || ':' || g.sh) AS h
           FROM grams g CROSS JOIN range(0, $CmsD) t(r))),
       est AS (SELECT gc.sh, gc.df_true, min(ce.cnt) AS df_est
           FROM gc JOIN cells ce ON ce.r = gc.r AND ce.c = gc.c
           GROUP BY gc.sh, gc.df_true)"""
}
