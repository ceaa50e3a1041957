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
  // Bloom semi-join reduction — the sketch pointed at JOIN pruning
  // ------------------------------------------------------------------

  /** Distinct dim-side join keys under the build predicate, on the md5
    * grid ([[hashedDocs]]'s `ch` convention, so the whole bloom stack
    * reuses verbatim). */
  private[graft] def urgentOrderKeys(s: SparkSession, d: String): DataFrame =
    graft.Tables.orders(s, d)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(md5(col("o_orderkey").cast("string")).as("ch")).distinct()

  /** Per-distinct-fact-key bloom verdict against the dim-key filter,
    * with the fact multiplicity and exact membership riding along.
    * Probe cost ∝ DISTINCT fact keys (k broadcast word lookups each),
    * never fact rows — the accounting rejoins by integer sums. */
  private def bloomJoinProbe(s: SparkSession, d: String): DataFrame = {
    val dimKeys = urgentOrderKeys(s, d)
    val geom = bloomGeom(dimKeys)
    val words = bloomWords(bloomPositions(dimKeys, geom, Seq("ch")))
    val factKeys = graft.Tables.lineitem(s, d)
      .groupBy(md5(col("l_orderkey").cast("string")).as("ch"))
      .agg(count(lit(1)).as("nrows"))
    bloomPositions(factKeys, geom, Seq("ch", "nrows"))
      .withColumn("word_idx", expr(s"pos div $WordBits"))
      .join(broadcast(words), Seq("word_idx"), "left")
      .withColumn("hit", expr(
        s"CASE WHEN word IS NOT NULL AND (shiftright(word, CAST(pos % $WordBits AS INT)) & 1) = 1 THEN 1 ELSE 0 END"))
      .groupBy("ch", "nrows")
      .agg(min("hit").as("bloom_hit"))
      .join(dimKeys.withColumn("is_match", lit(1)), Seq("ch"), "left")
      .withColumn("is_match", coalesce(col("is_match"), lit(0)))
  }

  /** Semi-join reduction via the bloom filter — THE canonical 100 TB
    * join pattern: a selective dim predicate ('1-URGENT', ~20 %) is
    * compiled into ≤ 8 MiB of broadcast bits, the fact side is pruned
    * BEFORE its shuffle, and only then does the real equi-join run.
    * False positives cost one wasted shuffle row each (the join removes
    * them); false negatives are impossible, so the result is
    * value-identical to the direct join — which is exactly what the
    * oracle checks: the plain SQL join, no bloom anywhere. The pruning
    * economics are the _eval row's job, not this one's.
    *
    * Here the pass-key set rides a broadcast semi-join back onto the
    * fact (bounded by dim matches + measured-fp stragglers ≈ the dim
    * key count, the same budget class as the word table); past THAT
    * clamp a deployment probes per fact row map-side instead — the
    * word table stays ≤ 2^[[MaxPow]] bits regardless. */
  val joinBloomPrefilter: Q = (s, d) => {
    val passKeys = bloomJoinProbe(s, d).where(col("bloom_hit") === 1)
      .select("ch")
    prefilteredJoin(s, d, passKeys)
  }

  /** The prune-then-join tail shared by the in-memory operator and the
    * maintained-index path (one spelling, the TextIndex discipline):
    * pass keys semi-join the fact map-side, then the real equi-join
    * runs over the survivors only. */
  private[graft] def prefilteredJoin(s: SparkSession, d: String,
      passKeys: DataFrame): DataFrame = {
    val fact = graft.Tables.lineitem(s, d)
      .withColumn("ch", md5(col("l_orderkey").cast("string")))
      .join(broadcast(passKeys), Seq("ch")) // the map-side prune
      .drop("ch")
    val dim = graft.Tables.orders(s, d)
      .where(col("o_orderpriority") === "1-URGENT")
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("o_custkey"), col("o_totalprice"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Freeze the join-filter geometry for `dir` from the build corpus's
    * dim-key count (production: the PLANNED dim size — a bloom cannot
    * resize, the [[buildBloomIndex]] contract). Words arrive only
    * through appends, so a fresh build is an empty filter a dim
    * ingest then populates. */
  def buildJoinBloomGeom(s: SparkSession, d: String, dir: String): Unit =
    bloomGeom(urgentOrderKeys(s, d)).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/geom")

  /** [[joinBloomPrefilter]] served from the MAINTAINED filter: the
    * append log compacts by bit_or, distinct fact keys probe the
    * broadcast words, and the shared [[prefilteredJoin]] tail runs.
    * Bloom false negatives are impossible at ANY append state, so the
    * result equals the plain join over whatever dim slice has been
    * enrolled — the ingest twin's equality pin. */
  def joinPrefilterFromIndex(s: SparkSession, d: String, dir: String): DataFrame = {
    val geom = s.read.parquet(dir + "/geom")
    val words = s.read.parquet(dir + "/words")
      .groupBy("word_idx").agg(expr("bit_or(word)").as("word"))
    val factKeys = graft.Tables.lineitem(s, d)
      .select(md5(col("l_orderkey").cast("string")).as("ch")).distinct()
    val pass = bloomPositions(factKeys, geom, Seq("ch"))
      .withColumn("word_idx", expr(s"pos div $WordBits"))
      .join(broadcast(words), Seq("word_idx"), "left")
      .withColumn("hit", expr(
        s"CASE WHEN word IS NOT NULL AND (shiftright(word, CAST(pos % $WordBits AS INT)) & 1) = 1 THEN 1 ELSE 0 END"))
      .groupBy("ch").agg(min("hit").as("bloom_hit"))
      .where(col("bloom_hit") === 1).select("ch")
    prefilteredJoin(s, d, pass)
  }

  /** The pruning economics as one oracle-checked row: how many fact
    * rows the filter admits vs how many truly match, the observed
    * false-pass rate over non-matching rows, and the pruned fraction —
    * the number that says whether building the filter paid for itself
    * (here ~4 of 5 fact rows never reach the shuffle). Cross-engine
    * exact: the DuckDB oracle rebuilds the identical word table from
    * the identical dim keys and probes the identical fact keys. */
  val joinBloomPruneEval: Q = (s, d) => {
    val probe = bloomJoinProbe(s, d)
    val geomRow = bloomGeom(urgentOrderKeys(s, d))
    probe.agg(
      sum("nrows").as("fact_rows"),
      sum(expr("nrows * bloom_hit")).as("pass_rows"),
      sum(expr("nrows * is_match")).as("match_rows"),
      sum(expr("nrows * (bloom_hit - is_match)")).as("false_pass"))
      .crossJoin(broadcast(geomRow))
      .select(col("n").as("n_dim_keys"), col("m").as("m_bits"),
        coalesce(col("fact_rows"), lit(0L)).as("fact_rows"),
        coalesce(col("pass_rows"), lit(0L)).as("pass_rows"),
        coalesce(col("match_rows"), lit(0L)).as("match_rows"),
        coalesce(col("false_pass"), lit(0L)).as("false_pass"))
      .withColumn("fp_micro", expr(
        "CASE WHEN fact_rows - match_rows = 0 THEN CAST(0 AS BIGINT) ELSE (false_pass * 1000000) div (fact_rows - match_rows) END"))
      .withColumn("pruned_micro", expr(
        "CASE WHEN fact_rows = 0 THEN CAST(0 AS BIGINT) ELSE ((fact_rows - pass_rows) * 1000000) div fact_rows END"))
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

  /** Cells from a (sh, <weight>) DISTINCT-gram frame: each gram hashes
    * once per row r (4 md5s per DISTINCT gram) and contributes its
    * occurrence count to its cell — cnt = Σ df per cell is arithmetic-
    * identical to counting occurrences (integer sum, order-free), while
    * the md5 work drops from 4× the corpus shingle VOLUME to 4× the
    * distinct-gram count (r13, guide §1.2 per-task work: ~30× less
    * hashing at sf0.1). */
  private def cellsFromGramDf(gramDf: DataFrame, w: String): DataFrame =
    gramDf.select(col(w).as("w"), explode(expr(
      s"""transform(sequence(0, ${CmsD - 1}), r -> named_struct(
            'r', r,
            'c', CAST(conv(substring(md5(concat('cms', CAST(r AS STRING), ':', sh)), 1, 8), 16, 10) AS BIGINT) % $CmsW))"""))
      .as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(sum("w").as("cnt"))

  /** (r, c, cnt) sketch cells over the corpus shingle stream — the same
    * doc-distinct word-3-gram stream the exact
    * [[PipelineOps.ngramTopK]] counts, so est(g) approximates that
    * query's df exactly. The per-gram aggregate runs first (map-side
    * partials on the gram key) so the hash work is per DISTINCT gram —
    * see [[cellsFromGramDf]]. */
  private def cmsCells(sh: DataFrame): DataFrame =
    cellsFromGramDf(sh.groupBy("sh").agg(count(lit(1)).as("df")), "df")

  /** (sh, df_true, df_est): every distinct gram's exact df beside its
    * sketch estimate (min over the d cells it hashes to). The join side
    * is the d·w = 4·16384 = 65536-cell sketch — still broadcast-sized
    * (≤ 64k longs), never a shuffle of the gram frame. */
  private def cmsEstimates(s: SparkSession, d: String): DataFrame = {
    // ONE shingle pass + per-gram aggregate feeds both the sketch build
    // and the truth side (r13 — the two branches each re-ran the
    // corpus-wide Generate before)
    val gramDf = DedupOps.docShingles(s, d)
      .groupBy("sh").agg(count(lit(1)).as("df_true")).localCheckpoint()
    val cells = cellsFromGramDf(gramDf, "df_true")
    gramDf
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
  // HyperLogLog — the register-file cardinality sketch (Flajolet,
  // Fusy, Gandouet & Meunier, AofA'07). KMV ([[PipelineOps.kmvSketch]])
  // already answers "how many distinct" with k sorted hash minima; HLL
  // answers the same question with m = 2^p REGISTERS whose merge law is
  // per-register MAX — an idempotent, commutative monoid. That merge law
  // is what KMV lacks and what a 100 TB deployment actually exploits:
  // per-partition register files combine map-side (each task ships at
  // most m rows no matter how many items it saw), per-GROUP cardinality
  // is one groupBy away ([[eventsHllByType]] — distinct users per event
  // type in a single pass, no per-group distinct shuffle), roll-ups
  // across days/datacenters are register maxes, and at-least-once
  // replay is absorbed outright (max is idempotent — the bloom OR
  // story, not the CMS batch-id story).
  //
  // Both engines' BUILT-IN HLLs (Spark approx_count_distinct, DuckDB
  // approx_count_distinct) disagree by construction — different hash,
  // different bias tables — so like every sketch here the registers are
  // pinned from scratch on the shared md5 grid: 32-bit hash, low p bits
  // route to a bucket, rho = leading-zero rank of the remaining
  // [[HllWBits]] bits via length(bin(w)) — pure integer in both
  // engines. The estimate's harmonic mean is computed EXACTLY: each
  // register contributes the integer 2^(RhoMax − rho), so sum_int is a
  // BIGINT and the raw estimate is ONE IEEE division of two exactly-
  // representable doubles. The only transcendental (linear counting's
  // ln) goes through the 1e-6 micro grid (the corpus_drift/unigram
  // discipline).
  // ------------------------------------------------------------------

  /** p = 12 → m = 4096 registers; standard error 1.04/√m ≈ 1.6 %. */
  private[ops] val HllP = 12
  private[ops] val HllM = 4096
  /** 32-bit hash minus p bucket bits. */
  private val HllWBits = 20
  /** rho of w = 0 (all remaining bits zero): WBits + 1. */
  private val HllRhoMax = HllWBits + 1
  /** 2^RhoMax — the exact-integer scale of the harmonic sum: an EMPTY
    * register (rho 0) contributes 2^RhoMax, a register at rho r
    * contributes 2^(RhoMax − r), and sum_int = Σ fits in BIGINT
    * (≤ m·2^21 = 2^33). */
  private val HllPow = 1L << HllRhoMax
  /** alpha_m = 0.7213/(1 + 1.079/m) for m ≥ 128, on the micro grid —
    * the bias constant is the estimate's only non-integer input besides
    * the one final division. */
  private val HllAlphaMicro = 721110L

  /** (grp..., bucket, rho) register file over a `tok` frame. The
    * groupBy's map-side partial MAX bounds every task's shuffle output
    * at m rows per group — the property that makes corpus-scale
    * cardinality a fixed-size exchange. */
  private def hllRegisters(tokens: DataFrame, grp: Seq[String]): DataFrame =
    tokens
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .select(grp.map(col) ++ Seq(
        (col("h") % HllM).as("bucket"), expr(s"h div $HllM").as("w")): _*)
      .withColumn("rho", when(col("w") === 0, lit(HllRhoMax))
        .otherwise(lit(HllRhoMax) - length(bin(col("w")))).cast("int"))
      .groupBy((grp :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))

  /** Per-group estimate from a register file: n_present (nonzero
    * registers), the exact harmonic sum_int, and the estimate with the
    * textbook small-range branch — linear counting m·ln(m/V) when the
    * raw estimate is under 2.5·m and zero registers remain (V = m −
    * n_present). At harness scale LC is the active branch; the raw
    * branch engages past ~10 k distinct (sf1's event stream). */
  private def hllEstimate(regs: DataFrame, grp: Seq[String]): DataFrame = {
    val agged = (if (grp.isEmpty) regs.groupBy() else regs.groupBy(grp.map(col): _*))
      .agg(count(lit(1)).as("n_present"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - rho)")),
          lit(0L)).as("sum_present"))
    agged
      .withColumn("sum_int",
        expr(s"sum_present + ($HllM - n_present) * CAST($HllPow AS BIGINT)"))
      .withColumn("v_zero", expr(s"$HllM - n_present"))
      // every literal is an integer with an explicit CAST AS DOUBLE —
      // a bare 2.5/1000000.0 parses as DECIMAL in Spark but DOUBLE in
      // DuckDB (the sf1-replay divergence class caught on DSIR)
      .withColumn("e_raw", expr(
        s"(CAST($HllAlphaMicro AS DOUBLE) * $HllM * $HllM * $HllPow) / (CAST(1000000 AS DOUBLE) * CAST(sum_int AS DOUBLE))"))
      .withColumn("hll_estimate_r", expr(
        s"""CASE WHEN e_raw <= CAST(${5 * HllM / 2} AS DOUBLE) AND v_zero > 0
              THEN round($HllM * CAST(round(ln(CAST($HllM AS DOUBLE) / v_zero) * 1000000, 0) AS BIGINT) / CAST(1000000 AS DOUBLE), 6)
              ELSE round(e_raw, 6) END"""))
      .drop("sum_present", "e_raw", "v_zero")
  }

  /** rel_err beside the estimate — the KMV audit convention (NULL on an
    * empty domain, never a 0/0 throw under ANSI mode). */
  private def withRelErr(df: DataFrame): DataFrame =
    df.withColumn("rel_err_r",
      when(col("exact_distinct") === 0, lit(null).cast("double"))
        .otherwise(round(
          abs(col("hll_estimate_r") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double"), 6)))

  /** One-row sketch audit over a single-column `tok` frame: exact count
    * beside the estimate (the audit path), n_present + sum_int pinning
    * the full register state as integers. */
  private def hllRow(tokens: DataFrame): DataFrame =
    withRelErr(
      tokens.agg(countDistinct("tok").as("exact_distinct"))
        .crossJoin(broadcast(hllEstimate(hllRegisters(tokens, Nil), Nil)))
        .select(col("exact_distinct"), col("n_present"), col("sum_int"),
          col("hll_estimate_r")))

  /** Event-stream token frame: distinct USERS, on the same string/md5
    * grid as [[PipelineOps.eventsUniqueUsersKmv]] so the two sketches
    * audit the identical domain. */
  private def userTokens(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d).where(col("user_id").isNotNull)
      .select(col("user_id"), col("user_id").cast("string").as("tok"))

  /** Approximate distinct users over the event stream — HLL beside the
    * registered KMV, same answer domain, mergeable registers. */
  val eventsUniqueUsersHll: Q = (s, d) =>
    hllRow(userTokens(s, d).select("tok"))

  /** Approximate vocabulary size — HLL over the same unigram stream as
    * [[PipelineOps.vocabKmv]]. */
  val vocabHll: Q = (s, d) => {
    graft.expressions.TextShingles.register(s)
    hllRow(documents(s, d)
      .select(explode(expr("text_shingles(text, 1)")).as("tok")))
  }

  /** Distinct users PER EVENT TYPE in one pass — the query the register
    * monoid exists for: a single groupBy(type, bucket) MAX builds every
    * group's register file simultaneously (each task ships ≤ m rows per
    * group seen), where the exact form pays a full (type, user)
    * distinct shuffle. The exact count rides along per group as the
    * audit column. */
  val eventsHllByType: Q = (s, d) => {
    val toks = graft.Tables.events(s, d).where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("string").as("tok"))
    val est = hllEstimate(hllRegisters(toks, Seq("event_type")), Seq("event_type"))
    withRelErr(
      toks.groupBy("event_type").agg(countDistinct("tok").as("exact_distinct"))
        .join(est, Seq("event_type"))
        .select(col("event_type"), col("exact_distinct"), col("n_present"),
          col("sum_int"), col("hll_estimate_r")))
      .orderBy("event_type")
  }

  /** Incremental register merge — the `_incremental` convention for the
    * MAX monoid: the standing register file (user_id%4==0) absorbs a
    * later batch (user_id%4==2) by per-bucket greatest, value-identical
    * to a direct build over the union (max is associative, commutative
    * AND idempotent — of the three sketch merge laws this is the only
    * one where even overlapping batches cannot perturb the answer).
    * rho_standing rides along pinning monotonicity: registers only ever
    * grow. */
  val eventsHllIncremental: Q = (s, d) => {
    val toks = userTokens(s, d)
    val standing = hllRegisters(
      toks.where(col("user_id") % 4 === 0).select("tok"), Nil)
      .withColumnRenamed("rho", "rho_standing")
    val batch = hllRegisters(
      toks.where(col("user_id") % 4 === 2).select("tok"), Nil)
      .withColumnRenamed("rho", "rho_batch")
    standing.join(batch, Seq("bucket"), "full_outer")
      .select(col("bucket"), col("rho_standing"),
        greatest(coalesce(col("rho_standing"), lit(0)),
          coalesce(col("rho_batch"), lit(0))).cast("int").as("rho"))
      .orderBy("bucket")
  }

  /** Heaps-law vocabulary-growth curve — distinct tokens in the first
    * N documents at doubling N — via CUMULATIVE HLL register merges:
    * the instrument that says whether a corpus's vocabulary is still
    * growing (keep crawling) or saturating (more data buys tokens the
    * model already has). One pass builds a register file PER DOUBLING
    * SEGMENT (segment = floor(log2(doc_id+1)), so segments 0..c union
    * to the first 2^(c+1)−1 docs); checkpoint registers are per-bucket
    * MAXes over segments ≤ c — the register monoid again, so the whole
    * curve costs ONE fixed-size exchange (≤ segments·m rows) plus a
    * broadcast ≤-join against the ~40-row checkpoint list, where the
    * exact curve pays a full distinct shuffle PER CHECKPOINT. The
    * exact count rides along as the audit column (min-first-seen-
    * segment per token, then a domain-sized cumulative window — the
    * corpus_quantiles discipline: the window sees segment ids, never
    * token rows). Doc ids are the harness's ingest order; on a real
    * corpus any monotone ingest stamp serves. */
  /** (seg, tok) unigram frame over a (doc_id, text) frame — segment =
    * floor(log2(doc_id+1)), shared by the batch curve and the growth
    * index so segment geometry cannot drift. Caller must have
    * registered TextShingles on the session. */
  private def growthToks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(expr("text_shingles(text, 1)")).as("tok"))
      .withColumn("seg", (length(bin(col("doc_id") + 1)) - 1).cast("int"))
      .select("seg", "tok")

  /** (seg, n_docs) partial doc counts over a (doc_id, ...) frame. */
  private def segDocCounts(docs: DataFrame): DataFrame =
    docs.select((length(bin(col("doc_id") + 1)) - 1).cast("int").as("seg"))
      .groupBy("seg").agg(count(lit(1)).as("n_docs"))

  /** The growth curve from a (seg, bucket, rho) register file + a
    * (seg, n_docs) count frame: cumulative per-bucket maxes over
    * seg ≤ chk through the broadcast checkpoint list, then the shared
    * estimate tail → (chk, n_docs, n_present, sum_int,
    * hll_estimate_r). */
  private def growthCurveOf(regs: DataFrame, segDocs: DataFrame): DataFrame = {
    val chk = broadcast(regs.select(col("seg").as("chk")).distinct())
    val cum = regs.join(chk, col("seg") <= col("chk"))
      .groupBy("chk", "bucket").agg(max("rho").as("rho"))
    val est = hllEstimate(cum, Seq("chk"))
    val nDocs = segDocs.join(chk, col("seg") <= col("chk"))
      .groupBy("chk").agg(sum("n_docs").as("n_docs"))
    nDocs.join(est, Seq("chk"))
      .select(col("chk"), col("n_docs"), col("n_present"), col("sum_int"),
        col("hll_estimate_r"))
      .orderBy("chk")
  }

  val vocabGrowth: Q = (s, d) => {
    graft.expressions.TextShingles.register(s)
    val toks = growthToks(documents(s, d)).localCheckpoint()
    val regs = hllRegisters(toks, Seq("seg")).localCheckpoint()
    val curve = growthCurveOf(regs, segDocCounts(documents(s, d)))
    // exact audit: first-seen segment per token (vocabulary-sized
    // groupBy — the audit's price, not the operator's), then the
    // cumulative count over the ≤40-row segment domain
    val firstSeen = toks.groupBy("tok").agg(min("seg").as("fs"))
      .groupBy("fs").agg(count(lit(1)).as("new_toks"))
    val exact = firstSeen
      .join(broadcast(regs.select(col("seg").as("chk")).distinct()),
        col("fs") <= col("chk"))
      .groupBy("chk").agg(sum("new_toks").as("exact_vocab"))
    withRelErr(
      curve.join(exact, Seq("chk"))
        .select(col("chk"), col("n_docs"),
          col("exact_vocab").as("exact_distinct"), col("n_present"),
          col("sum_int"), col("hll_estimate_r")))
      .withColumnRenamed("exact_distinct", "exact_vocab")
      .orderBy("chk")
  }

  // ------------------------------------------------------------------
  // Log-histogram quantile sketch — bounded-state quantiles, the
  // additive-monoid answer to [[PipelineOps.corpusQuantiles]]' exact
  // histogram. The exact op's state is the length DOMAIN (fine for doc
  // lengths, unbounded for a general long-tailed measure: byte sizes,
  // latencies, token counts reach 10^9 distinct values); this sketch
  // caps state at < 1000 buckets REGARDLESS of domain: values < 32 get
  // exact unit buckets, larger values land in 16 sub-buckets per
  // power-of-two octave (bucket width 1/16 of its floor, so any
  // quantile estimate is within ~6.25 % of the true value — measured,
  // not assumed, by the eval row). Everything is integer bit
  // arithmetic on the shared bin()/shift grid: bucket ids are
  // invertible (lo/width recompute from the id alone), ranks are
  // micro-grid integers, and the merge is cell-wise ADD — per-task
  // map-side partials ship ≤ 1000 rows, roll-ups across
  // days/partitions are exact sums (the CMS deployment story for
  // order statistics).
  // ------------------------------------------------------------------

  /** Type-1 quantile targets on the micro grid. */
  private[ops] val QsQMicros = Seq(500000L, 900000L, 990000L)

  /** bucket_id from a nonnegative BIGINT `n_chars`: the value itself
    * under 32, else msb·16 + the next-4-bits sub-bucket. Monotone in
    * the value (ids ≥ 96 for the octave range), so CDF order == value
    * order. */
  private val QsBucket =
    """CASE WHEN n_chars < 32 THEN n_chars
       ELSE length(bin(n_chars)) * 16
            + CAST(shiftright(n_chars, CAST(length(bin(n_chars)) - 5 AS INT)) % 16 AS BIGINT) END"""

  /** Inverse: the bucket's inclusive floor and width. */
  private val QsLo =
    """CASE WHEN bucket_id < 32 THEN bucket_id
       ELSE shiftleft(16 + bucket_id % 16, CAST(bucket_id div 16 - 5 AS INT)) END"""
  private val QsWidth =
    """CASE WHEN bucket_id < 32 THEN CAST(1 AS BIGINT)
       ELSE shiftleft(CAST(1 AS BIGINT), CAST(bucket_id div 16 - 5 AS INT)) END"""

  /** (bucket_id, cnt) cells over a corpus — one map-side-partial
    * groupBy, ≤ ~1000 rows shipped per task at any corpus size. */
  private def qsCells(docs: DataFrame): DataFrame =
    docs.where(col("n_chars").isNotNull)
      .select(expr(QsBucket).as("bucket_id"))
      .groupBy("bucket_id").agg(count(lit(1)).as("cnt"))

  /** Quantiles from the sketch: running CDF over the ≤ 1000-row cell
    * frame (the unpartitioned window is bounded by the SKETCH size,
    * where the exact op's is bounded by the domain), target rank
    * ceil(q·n) in pure integers, linear interpolation inside the hit
    * bucket (exact-unit buckets interpolate to the exact value). */
  /** The estimate tail over any (bucket_id, cnt) cell frame: CDF,
    * per-quantile hit bucket, integer interpolation — shared by the
    * batch op and the persisted-index read so the sketch semantics
    * cannot drift between them. */
  private def qsQuantilesOf(cells: DataFrame): DataFrame = {
    val tot = cells.agg(coalesce(sum("cnt"), lit(0L)).as("n_docs"))
    cells
      .withColumn("cum", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .select(col("bucket_id"), col("cnt"), col("cum"), col("n_docs"),
        explode(expr(s"array(${QsQMicros.mkString("L,")}L)")).as("q_micro"))
      .withColumn("target", expr("(q_micro * n_docs + 999999) div 1000000"))
      .where(col("cum") >= col("target"))
      .groupBy("q_micro")
      .agg(min(struct(col("bucket_id"), col("cnt"), col("cum"),
        col("n_docs"), col("target"))).as("k"))
      .select(col("q_micro"), col("k.bucket_id").as("bucket_id"),
        col("k.cnt").as("cnt"), col("k.cum").as("cum"),
        col("k.n_docs").as("n_docs"), col("k.target").as("target"))
      .withColumn("len_est", expr(
        s"($QsLo) + ((target - (cum - cnt) - 1) * ($QsWidth)) div cnt"))
  }

  private def qsEstimates(s: SparkSession, d: String): DataFrame =
    qsQuantilesOf(qsCells(documents(s, d)))

  val quantileSketch: Q = (s, d) =>
    qsEstimates(s, d)
      .select(
        expr("CAST(q_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)").as("q"),
        col("len_est"), col("n_docs"))
      .orderBy("q")

  /** The measured instrument: sketch vs exact per quantile, one row.
    * The exact side re-derives the type-1 quantile over the full
    * histogram with the SAME micro-grid targets, so the only delta is
    * bucket-width interpolation error — gated in Bench at 7 %
    * (theoretical ceiling 1/16 ≈ 6.25 % plus interpolation slack). */
  val quantileSketchEval: Q = (s, d) => {
    val est = qsEstimates(s, d).select("q_micro", "len_est")
    val hist = documents(s, d).where(col("n_chars").isNotNull)
      .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val cdf = hist
      .withColumn("cum", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.orderBy("n_chars")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(hist.agg(coalesce(sum("cnt"), lit(0L)).as("n_docs"))))
    val exact = cdf.select(col("n_chars"), col("cum"), col("n_docs"),
        explode(expr(s"array(${QsQMicros.mkString("L,")}L)")).as("q_micro"))
      .withColumn("target", expr("(q_micro * n_docs + 999999) div 1000000"))
      .where(col("cum") >= col("target"))
      .groupBy("q_micro")
      .agg(min("n_chars").as("len_exact"), min("n_docs").as("n_docs"))
    val nb = qsCells(documents(s, d)).agg(count(lit(1)).as("n_buckets"))
    val j = exact.join(est, "q_micro")
      .withColumn("err_micro", expr(
        """CASE WHEN len_exact = 0 THEN CAST(0 AS BIGINT)
           ELSE CAST(round(CAST(abs(len_est - len_exact) * 1000000 AS DOUBLE)
                  / CAST(len_exact AS DOUBLE), 0) AS BIGINT) END"""))
    j.groupBy().agg(
        min("n_docs").as("n_docs"),
        max(when(col("q_micro") === 500000L, col("len_exact"))).as("p50_exact"),
        max(when(col("q_micro") === 500000L, col("len_est"))).as("p50_est"),
        max(when(col("q_micro") === 500000L, col("err_micro"))).as("p50_err_micro"),
        max(when(col("q_micro") === 900000L, col("len_exact"))).as("p90_exact"),
        max(when(col("q_micro") === 900000L, col("len_est"))).as("p90_est"),
        max(when(col("q_micro") === 900000L, col("err_micro"))).as("p90_err_micro"),
        max(when(col("q_micro") === 990000L, col("len_exact"))).as("p99_exact"),
        max(when(col("q_micro") === 990000L, col("len_est"))).as("p99_est"),
        max(when(col("q_micro") === 990000L, col("err_micro"))).as("p99_err_micro"))
      .crossJoin(broadcast(nb))
  }

  /** Incremental cell merge — the additive `_incremental` convention
    * (the CMS shape for order statistics): standing cells (doc%4==0)
    * absorb a batch (doc%4==2) by cell-wise ADD, value-identical to a
    * union build; cnt_standing rides along pinning monotonicity. */
  val quantileSketchIncremental: Q = (s, d) => {
    val docs = documents(s, d)
    val cs = qsCells(docs.where(col("doc_id") % 4 === 0))
      .withColumnRenamed("cnt", "cnt_standing")
    val cb = qsCells(docs.where(col("doc_id") % 4 === 2))
      .withColumnRenamed("cnt", "cnt_batch")
    cs.join(cb, Seq("bucket_id"), "full_outer")
      .select(col("bucket_id"), col("cnt_standing"),
        (coalesce(col("cnt_standing"), lit(0L)) +
          coalesce(col("cnt_batch"), lit(0L))).as("cnt"))
      .orderBy("bucket_id")
  }

  // ------------------------------------------------------------------
  // Registration
  // ------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "dedup_bloom" -> dedupBloom,
    "dedup_bloom_sharded" -> dedupBloomSharded,
    "dedup_bloom_incremental" -> dedupBloomIncremental,
    "dedup_bloom_eval" -> dedupBloomEval,
    "join_bloom_prefilter" -> joinBloomPrefilter,
    "join_bloom_prune_eval" -> joinBloomPruneEval,
    "text_ngram_cms_topk" -> ngramCmsTopK,
    "text_ngram_cms_incremental" -> ngramCmsIncremental,
    "text_ngram_cms_eval" -> ngramCmsEval,
    "events_unique_users_hll" -> eventsUniqueUsersHll,
    "vocab_hll" -> vocabHll,
    "events_hll_by_type" -> eventsHllByType,
    "events_hll_incremental" -> eventsHllIncremental,
    "vocab_growth" -> vocabGrowth,
    "corpus_quantile_sketch" -> quantileSketch,
    "corpus_quantile_sketch_eval" -> quantileSketchEval,
    "corpus_quantile_sketch_incremental" -> quantileSketchIncremental,
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

  /** Build the standing HLL register file over a single-column `tok`
    * frame: `dir/regs` rows of (bucket, rho). No geometry file — m is a
    * compile-time constant (unlike the bloom, an HLL's size does not
    * depend on the corpus; registers saturate gracefully instead). */
  def buildHllIndex(s: SparkSession, dir: String, tokens: DataFrame): Unit =
    hllRegisters(tokens, Nil).write.mode("overwrite").parquet(dir + "/regs")

  /** Append a batch's register file — cost ∝ the batch's own hash work,
    * standing rows never rewritten. MAX is idempotent, so like the
    * bloom's OR (and unlike the CMS sum) ANY replay interleaving —
    * full redelivery, a partial first write retried in full, even
    * overlapping batches — is absorbed by the read-time merge with no
    * batch-id machinery. */
  def appendToHllIndex(s: SparkSession, dir: String, tokens: DataFrame): Unit =
    hllRegisters(tokens, Nil).write.mode("append").parquet(dir + "/regs")

  /** The standing cardinality estimate: per-bucket MAX over the append
    * log (the read-time merge), then the same estimate tail the batch
    * op runs — never a rescan of the corpus the index stands for. */
  def hllEstimateFromIndex(s: SparkSession, dir: String): DataFrame =
    hllEstimate(
      s.read.parquet(dir + "/regs").groupBy("bucket").agg(max("rho").as("rho")),
      Nil)

  /** Build the standing vocab-growth index over a (doc_id, text) frame:
    * `dir/regs` (seg, bucket, rho) register partials — the MAX monoid —
    * plus `dir/segdocs` (batch_id, seg, n_docs) count partials — the
    * additive monoid under the batch-id replay key. Build writes under
    * batch −1 (the CMS/Qs index convention). */
  def buildGrowthIndex(s: SparkSession, dir: String, docs: DataFrame): Unit = {
    graft.expressions.TextShingles.register(s)
    hllRegisters(growthToks(docs), Seq("seg"))
      .write.mode("overwrite").parquet(dir + "/regs")
    segDocCounts(docs).select(lit(-1L).as("batch_id"), col("seg"), col("n_docs"))
      .write.mode("overwrite").parquet(dir + "/segdocs")
  }

  /** Append a (doc_id, text) batch — cost ∝ the batch's own shingle
    * work, standing rows never rewritten. Register rows are absorbed by
    * the read-time MAX under ANY replay interleaving (the HLL story);
    * doc counts are additive, so their replay safety rides the batch id
    * (a redelivered batch re-appends IDENTICAL (batch_id, seg, n_docs)
    * rows that the read-time dedup collapses before the sum — the Qs
    * index story). One index, two monoids, each with its own
    * exactly-once mechanism. */
  def appendToGrowthIndex(s: SparkSession, dir: String, docs: DataFrame,
      batchId: Long): Unit = {
    graft.expressions.TextShingles.register(s)
    hllRegisters(growthToks(docs), Seq("seg"))
      .write.mode("append").parquet(dir + "/regs")
    segDocCounts(docs).select(lit(batchId).as("batch_id"), col("seg"), col("n_docs"))
      .write.mode("append").parquet(dir + "/segdocs")
  }

  /** The standing growth curve from the index — per-(seg, bucket) MAX
    * over the register log, batch-id-deduped count sums, then the same
    * cumulative tail as the batch op; never a corpus rescan (so no
    * exact/rel_err audit columns — the index answers WITHOUT the
    * corpus, which is its contract). */
  def growthFromIndex(s: SparkSession, dir: String): DataFrame =
    growthCurveOf(
      s.read.parquet(dir + "/regs")
        .groupBy("seg", "bucket").agg(max("rho").as("rho")),
      s.read.parquet(dir + "/segdocs")
        .dropDuplicates("batch_id", "seg")
        .groupBy("seg").agg(sum("n_docs").as("n_docs")))

  /** Build the standing quantile-sketch cell log for corpus `d`:
    * `dir/cells` rows (batch_id, bucket_id, cnt), build under −1 (the
    * CMS index convention — the additive monoid's replay safety rides
    * the batch id). */
  def buildQsIndex(s: SparkSession, d: String, dir: String): Unit =
    qsCells(documents(s, d))
      .select(lit(-1L).as("batch_id"), col("bucket_id"), col("cnt"))
      .write.mode("overwrite").parquet(dir + "/cells")

  /** Append a `(doc_id, n_chars)` batch's cells under its batch id —
    * cost ∝ the batch, standing rows never rewritten; a redelivered
    * batch re-appends IDENTICAL (batch_id, bucket_id, cnt) rows that
    * the read-time per-key dedup collapses before the sum. */
  def appendToQsIndex(s: SparkSession, dir: String, docs: DataFrame,
      batchId: Long): Unit =
    qsCells(docs)
      .select(lit(batchId).as("batch_id"), col("bucket_id"), col("cnt"))
      .write.mode("append").parquet(dir + "/cells")

  /** Quantiles from the persisted cells — replay-deduped, cell-summed,
    * then the same CDF + interpolation tail as the batch op; never a
    * corpus rescan. Output (q_micro, len_est, n_docs). */
  def qsFromIndex(s: SparkSession, dir: String): DataFrame =
    qsQuantilesOf(
      s.read.parquet(dir + "/cells")
        .dropDuplicates("batch_id", "bucket_id")
        .groupBy("bucket_id").agg(sum("cnt").as("cnt")))
      .select(col("q_micro"), col("len_est"), col("n_docs"))
      .orderBy("q_micro")

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
    // The prefilter's oracle is the PLAIN join on purpose: bloom false
    // negatives are impossible and false positives die in the real
    // join, so result identity against the bloom-free SQL IS the
    // correctness claim. The _eval oracle rebuilds the word table.
    "join_bloom_prefilter" ->
      raw"""SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_totalprice
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderpriority = '1-URGENT'
           ORDER BY l.l_orderkey, l.l_linenumber""",
    "join_bloom_prune_eval" ->
      raw"""WITH dk AS (SELECT DISTINCT md5(CAST(o_orderkey AS VARCHAR)) AS ch
               FROM orders WHERE o_orderpriority = '1-URGENT'),
           geom AS (SELECT n, coalesce(
                 list_min(list_filter(
                   list_transform(range($MinPow, ${MaxPow + 1}), p -> CAST(pow(2, p) AS BIGINT)),
                   v -> v >= $BloomBitsPerItem * n)),
                 CAST(pow(2, $MaxPow) AS BIGINT)) AS m
               FROM (SELECT greatest(count(*), 1) AS n FROM dk)),
           spos AS (SELECT ${hex32("md5('bloom' || CAST(i AS VARCHAR) || ':' || s.ch)")} % g.m AS pos
               FROM dk s CROSS JOIN range(0, $BloomSalts) t(i) CROSS JOIN geom g),
           words AS (SELECT pos // $WordBits AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INT)) AS word
               FROM spos GROUP BY pos // $WordBits),
           fk AS (SELECT md5(CAST(l_orderkey AS VARCHAR)) AS ch,
                 CAST(count(*) AS BIGINT) AS nrows
               FROM lineitem GROUP BY 1),
           ppos AS (SELECT f.ch, f.nrows,
                 ${hex32("md5('bloom' || CAST(i AS VARCHAR) || ':' || f.ch)")} % g.m AS pos
               FROM fk f CROSS JOIN range(0, $BloomSalts) t(i) CROSS JOIN geom g),
           hits AS (SELECT p.ch, p.nrows,
                 CASE WHEN w.word IS NOT NULL
                       AND ((w.word >> CAST(p.pos % $WordBits AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END AS hit
               FROM ppos p LEFT JOIN words w ON w.word_idx = p.pos // $WordBits),
           probe AS (SELECT ch, nrows, min(hit) AS bloom_hit
               FROM hits GROUP BY ch, nrows),
           acct AS (SELECT p.nrows, p.bloom_hit,
                 CASE WHEN d2.ch IS NULL THEN 0 ELSE 1 END AS is_match
               FROM probe p LEFT JOIN dk d2 ON d2.ch = p.ch),
           agg AS (SELECT coalesce(SUM(nrows), 0) AS fact_rows,
                 coalesce(SUM(nrows * bloom_hit), 0) AS pass_rows,
                 coalesce(SUM(nrows * is_match), 0) AS match_rows,
                 coalesce(SUM(nrows * (bloom_hit - is_match)), 0) AS false_pass
               FROM acct)
           SELECT g.n AS n_dim_keys, g.m AS m_bits,
             CAST(a.fact_rows AS BIGINT) AS fact_rows,
             CAST(a.pass_rows AS BIGINT) AS pass_rows,
             CAST(a.match_rows AS BIGINT) AS match_rows,
             CAST(a.false_pass AS BIGINT) AS false_pass,
             CASE WHEN a.fact_rows - a.match_rows = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST((a.false_pass * 1000000) // (a.fact_rows - a.match_rows) AS BIGINT) END AS fp_micro,
             CASE WHEN a.fact_rows = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(((a.fact_rows - a.pass_rows) * 1000000) // a.fact_rows AS BIGINT) END AS pruned_micro
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
    "events_unique_users_hll" -> hllOracleSql(
      "SELECT CAST(user_id AS VARCHAR) AS tok FROM events WHERE user_id IS NOT NULL"),
    "vocab_hll" -> hllOracleSql(
      s"SELECT unnest(string_split(${DedupOps.NormSql}, ' ')) AS tok FROM documents"),
    "events_hll_by_type" ->
      raw"""WITH t AS (SELECT event_type, CAST(user_id AS VARCHAR) AS tok
               FROM events WHERE user_id IS NOT NULL),
           hh AS (SELECT event_type, ${hex32("md5(tok)")} AS h FROM t),
           reg AS (SELECT event_type, h % $HllM AS bucket, ${hllRhoSql("h")} AS rho
               FROM hh GROUP BY event_type, h % $HllM),
           agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_present,
                 CAST(coalesce(SUM(CAST(1 AS BIGINT) << CAST($HllRhoMax - rho AS INT)), 0) AS BIGINT) AS sum_present
               FROM reg GROUP BY event_type),
           st AS (SELECT event_type, n_present,
                 CAST(sum_present + ($HllM - n_present) * CAST($HllPow AS BIGINT) AS BIGINT) AS sum_int,
                 ($HllM - n_present) AS v_zero
               FROM agg),
           est AS (SELECT event_type, n_present, sum_int, ${hllEstSql()} AS hll_estimate_r
               FROM (SELECT *, ${hllRawSql()} AS e_raw FROM st)),
           ex AS (SELECT event_type, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
               FROM t GROUP BY event_type)
           SELECT ex.event_type, ex.exact_distinct, est.n_present, est.sum_int,
             est.hll_estimate_r,
             CASE WHEN ex.exact_distinct = 0 THEN NULL
                  ELSE round(abs(est.hll_estimate_r - CAST(ex.exact_distinct AS DOUBLE))
                         / CAST(ex.exact_distinct AS DOUBLE), 6) END AS rel_err_r
           FROM ex JOIN est USING (event_type) ORDER BY event_type""",
    "vocab_growth" ->
      raw"""WITH t AS MATERIALIZED (SELECT CAST(length(bin(doc_id + 1)) - 1 AS INT) AS seg,
                 unnest(string_split(${DedupOps.NormSql}, ' ')) AS tok
               FROM documents),
           hh AS (SELECT seg, ${hex32("md5(tok)")} AS h FROM t),
           reg AS MATERIALIZED (SELECT seg, h % $HllM AS bucket, ${hllRhoSql("h")} AS rho
               FROM hh GROUP BY seg, h % $HllM),
           chk AS MATERIALIZED (SELECT DISTINCT seg AS chk FROM reg),
           cum AS (SELECT c.chk, r.bucket, CAST(MAX(r.rho) AS INT) AS rho
               FROM reg r JOIN chk c ON r.seg <= c.chk GROUP BY c.chk, r.bucket),
           agg AS (SELECT chk, CAST(COUNT(*) AS BIGINT) AS n_present,
                 CAST(coalesce(SUM(CAST(1 AS BIGINT) << CAST($HllRhoMax - rho AS INT)), 0) AS BIGINT) AS sum_present
               FROM cum GROUP BY chk),
           st AS (SELECT chk, n_present,
                 CAST(sum_present + ($HllM - n_present) * CAST($HllPow AS BIGINT) AS BIGINT) AS sum_int,
                 ($HllM - n_present) AS v_zero
               FROM agg),
           est AS (SELECT chk, n_present, sum_int, ${hllEstSql()} AS hll_estimate_r
               FROM (SELECT *, ${hllRawSql()} AS e_raw FROM st)),
           fs AS (SELECT tok, MIN(seg) AS fs FROM t GROUP BY tok),
           nt AS (SELECT fs, CAST(COUNT(*) AS BIGINT) AS new_toks FROM fs GROUP BY fs),
           ex AS (SELECT c.chk, CAST(SUM(nt.new_toks) AS BIGINT) AS exact_vocab
               FROM nt JOIN chk c ON nt.fs <= c.chk GROUP BY c.chk),
           nd AS (SELECT c.chk, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM (SELECT CAST(length(bin(doc_id + 1)) - 1 AS INT) AS seg
                     FROM documents) d
               JOIN chk c ON d.seg <= c.chk GROUP BY c.chk)
           SELECT nd.chk, nd.n_docs, ex.exact_vocab, est.n_present, est.sum_int,
             est.hll_estimate_r,
             CASE WHEN ex.exact_vocab = 0 THEN NULL
                  ELSE round(abs(est.hll_estimate_r - CAST(ex.exact_vocab AS DOUBLE))
                         / CAST(ex.exact_vocab AS DOUBLE), 6) END AS rel_err_r
           FROM nd JOIN ex ON ex.chk = nd.chk JOIN est ON est.chk = nd.chk
           ORDER BY nd.chk""",
    "events_hll_incremental" ->
      raw"""WITH t AS (SELECT user_id, CAST(user_id AS VARCHAR) AS tok
               FROM events WHERE user_id IS NOT NULL),
           sreg AS (SELECT h % $HllM AS bucket, ${hllRhoSql("h")} AS rho_standing
               FROM (SELECT ${hex32("md5(tok)")} AS h FROM t WHERE user_id % 4 = 0)
               GROUP BY h % $HllM),
           breg AS (SELECT h % $HllM AS bucket, ${hllRhoSql("h")} AS rho_batch
               FROM (SELECT ${hex32("md5(tok)")} AS h FROM t WHERE user_id % 4 = 2)
               GROUP BY h % $HllM)
           SELECT coalesce(s.bucket, b.bucket) AS bucket, s.rho_standing,
             CAST(greatest(coalesce(s.rho_standing, 0), coalesce(b.rho_batch, 0)) AS INT) AS rho
           FROM sreg s FULL OUTER JOIN breg b ON s.bucket = b.bucket
           ORDER BY bucket""",
    "corpus_quantile_sketch" ->
      raw"""WITH $QsCellsSql,
           $QsEstSql
           SELECT CAST(q_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS q,
             len_est, n_docs
           FROM qest ORDER BY q""",
    "corpus_quantile_sketch_eval" ->
      raw"""WITH $QsCellsSql,
           $QsEstSql,
           h AS (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM documents WHERE n_chars IS NOT NULL GROUP BY n_chars),
           hc AS (SELECT n_chars,
                 SUM(cnt) OVER (ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM h),
           ht AS (SELECT CAST(coalesce(SUM(cnt), 0) AS BIGINT) AS n_docs FROM h),
           ex AS (SELECT q.q_micro, MIN(hc.n_chars) AS len_exact,
                 MIN(ht.n_docs) AS n_docs
               FROM hc, ht, (SELECT unnest([${QsQMicros.mkString(", ")}]) AS q_micro) q
               WHERE hc.cum >= (q.q_micro * ht.n_docs + 999999) // 1000000
               GROUP BY q.q_micro),
           nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets FROM qcells),
           j AS (SELECT e.q_micro, e.len_exact, e.n_docs, s.len_est,
                 CASE WHEN e.len_exact = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(round(CAST(abs(s.len_est - e.len_exact) * 1000000 AS DOUBLE)
                             / CAST(e.len_exact AS DOUBLE), 0) AS BIGINT) END AS err_micro
               FROM ex e JOIN qest s USING (q_micro))
           SELECT CAST(MIN(n_docs) AS BIGINT) AS n_docs,
             CAST(MAX(CASE WHEN q_micro = 500000 THEN len_exact END) AS BIGINT) AS p50_exact,
             CAST(MAX(CASE WHEN q_micro = 500000 THEN len_est END) AS BIGINT) AS p50_est,
             CAST(MAX(CASE WHEN q_micro = 500000 THEN err_micro END) AS BIGINT) AS p50_err_micro,
             CAST(MAX(CASE WHEN q_micro = 900000 THEN len_exact END) AS BIGINT) AS p90_exact,
             CAST(MAX(CASE WHEN q_micro = 900000 THEN len_est END) AS BIGINT) AS p90_est,
             CAST(MAX(CASE WHEN q_micro = 900000 THEN err_micro END) AS BIGINT) AS p90_err_micro,
             CAST(MAX(CASE WHEN q_micro = 990000 THEN len_exact END) AS BIGINT) AS p99_exact,
             CAST(MAX(CASE WHEN q_micro = 990000 THEN len_est END) AS BIGINT) AS p99_est,
             CAST(MAX(CASE WHEN q_micro = 990000 THEN err_micro END) AS BIGINT) AS p99_err_micro,
             (SELECT n_buckets FROM nb) AS n_buckets
           FROM j""",
    "corpus_quantile_sketch_incremental" ->
      raw"""WITH cs AS (SELECT ${QsBucketSql("n_chars")} AS bucket_id,
                 CAST(COUNT(*) AS BIGINT) AS cnt_standing
               FROM documents WHERE n_chars IS NOT NULL AND doc_id % 4 = 0
               GROUP BY 1),
           cb AS (SELECT ${QsBucketSql("n_chars")} AS bucket_id,
                 CAST(COUNT(*) AS BIGINT) AS cnt_batch
               FROM documents WHERE n_chars IS NOT NULL AND doc_id % 4 = 2
               GROUP BY 1)
           SELECT bucket_id, cnt_standing,
             (coalesce(cnt_standing, 0) + coalesce(cnt_batch, 0)) AS cnt
           FROM cs FULL OUTER JOIN cb USING (bucket_id)
           ORDER BY bucket_id""",
  )

  /** DuckDB spelling of [[QsBucket]] over a named column. */
  private def QsBucketSql(c: String): String =
    s"""CASE WHEN $c < 32 THEN $c
        ELSE length(bin($c)) * 16 + (($c >> (length(bin($c)) - 5)) % 16) END"""

  private lazy val QsCellsSql =
    raw"""qcells AS (SELECT ${QsBucketSql("n_chars")} AS bucket_id,
            CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1)"""

  /** CDF + per-quantile hit bucket + interpolation, ending in
    * `qest(q_micro, len_est, n_docs)` — the DuckDB half of
    * [[qsEstimates]]. */
  private lazy val QsEstSql =
    raw"""qcdf AS (SELECT bucket_id, cnt,
            CAST(SUM(cnt) OVER (ORDER BY bucket_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM qcells),
       qtot AS (SELECT CAST(coalesce(SUM(cnt), 0) AS BIGINT) AS n_docs FROM qcells),
       qhit AS (SELECT q.q_micro, MIN(c.bucket_id) AS bucket_id
          FROM qcdf c, qtot t, (SELECT unnest([${QsQMicros.mkString(", ")}]) AS q_micro) q
          WHERE c.cum >= (q.q_micro * t.n_docs + 999999) // 1000000
          GROUP BY q.q_micro),
       qest AS (SELECT h.q_micro,
            (CASE WHEN c.bucket_id < 32 THEN c.bucket_id
                  ELSE CAST(16 + c.bucket_id % 16 AS BIGINT) << CAST(c.bucket_id // 16 - 5 AS INT) END)
            + (((q_micro * t.n_docs + 999999) // 1000000 - (c.cum - c.cnt) - 1)
               * (CASE WHEN c.bucket_id < 32 THEN CAST(1 AS BIGINT)
                       ELSE CAST(1 AS BIGINT) << CAST(c.bucket_id // 16 - 5 AS INT) END)) // c.cnt
              AS len_est,
            t.n_docs
          FROM qhit h JOIN qcdf c ON c.bucket_id = h.bucket_id CROSS JOIN qtot t)"""

  /** MAX-register expression over a 32-bit hash column (aggregate
    * position; DuckDB dialect) — the rho the Spark side derives via
    * length(bin(w)). */
  private def hllRhoSql(h: String): String =
    s"""CAST(MAX(CASE WHEN $h // $HllM = 0 THEN $HllRhoMax
          ELSE $HllRhoMax - length(bin($h // $HllM)) END) AS INT)"""

  /** The raw harmonic-mean estimate over (sum_int) — every literal an
    * integer with an explicit DOUBLE cast (the decimal-literal parity
    * trap). */
  private def hllRawSql(): String =
    s"""(CAST($HllAlphaMicro AS DOUBLE) * $HllM * $HllM * $HllPow)
        / (CAST(1000000 AS DOUBLE) * CAST(sum_int AS DOUBLE))"""

  /** Estimate with the linear-counting small-range branch over
    * (e_raw, v_zero) — ln through the 1e-6 micro grid. */
  private def hllEstSql(): String =
    s"""CASE WHEN e_raw <= CAST(${5 * HllM / 2} AS DOUBLE) AND v_zero > 0
          THEN round($HllM * CAST(round(ln(CAST($HllM AS DOUBLE) / v_zero) * 1000000, 0) AS BIGINT) / CAST(1000000 AS DOUBLE), 6)
          ELSE round(e_raw, 6) END"""

  /** The HLL oracle tail over any single-column `tok` CTE body — one
    * shared SQL skeleton per sketch (the kmvOracleSql discipline), so
    * sketch semantics cannot drift between registered instances. */
  private def hllOracleSql(tokenSelect: String): String =
    raw"""WITH t AS ($tokenSelect),
         hh AS (SELECT ${hex32("md5(tok)")} AS h FROM t),
         reg AS (SELECT h % $HllM AS bucket, ${hllRhoSql("h")} AS rho
             FROM hh GROUP BY h % $HllM),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_present,
               CAST(coalesce(SUM(CAST(1 AS BIGINT) << CAST($HllRhoMax - rho AS INT)), 0) AS BIGINT) AS sum_present
             FROM reg),
         st AS (SELECT n_present,
               CAST(sum_present + ($HllM - n_present) * CAST($HllPow AS BIGINT) AS BIGINT) AS sum_int,
               ($HllM - n_present) AS v_zero
             FROM agg),
         est AS (SELECT n_present, sum_int, ${hllEstSql()} AS hll_estimate_r
             FROM (SELECT *, ${hllRawSql()} AS e_raw FROM st)),
         ex AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct FROM t)
         SELECT ex.exact_distinct, est.n_present, est.sum_int, est.hll_estimate_r,
           CASE WHEN ex.exact_distinct = 0 THEN NULL
                ELSE round(abs(est.hll_estimate_r - CAST(ex.exact_distinct AS DOUBLE))
                       / CAST(ex.exact_distinct AS DOUBLE), 6) END AS rel_err_r
         FROM ex, est"""

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
