package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Functions._

/** Lexical + hybrid retrieval over the documents corpus — the query-side
  * counterpart of the dedup/sim families: BM25 top-k (Robertson & Zaragoza
  * 2009, the Lucene/Elasticsearch default), TF-IDF keyword extraction
  * (sklearn's smooth-idf convention), the measured-quality audit for the
  * scale cap, and reciprocal-rank-fusion of the lexical and dense legs
  * (Cormack et al. SIGIR'09) — the standard RAG retrieval stack.
  *
  * Not a reference operator (the reference's surface is the pizzeria CDC
  * pipeline); this family belongs to the training-data/RAG pipeline
  * extension the engine targets, next to dedup_* and sim_*.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - ONE corpus scan feeds everything: tokens aggregate map-side to the
  *    narrow `(doc_id, tok, tf)` frame; doc lengths and the df model are
  *    second aggregates OVER that frame, never a second pass over text.
  *  - The posting-list probe is df-CAPPED: terms with df > max(20, N/20)
  *    leave the model before any join (a stop list derived from the data,
  *    the posture production BM25 reaches via stop words / WAND skipping).
  *    This kills the Zipf skew a raw `JOIN ON tok` would put on the
  *    "the"/"of" partitions — the exact failure mode text_unigram_nll was
  *    re-planned to avoid — and bounds per-key join fan-in at the cap.
  *    What the cap costs in answer quality is not asserted but MEASURED:
  *    `text_bm25_eval` re-ranks against the uncapped truth every round.
  *  - The query-term model (`qmodel`) is query-batch-sized and BROADCAST,
  *    so the corpus-wide token frame is never shuffled for the probe; the
  *    only corpus-wide exchanges are the aggregates themselves.
  *  - Top-k goes through [[SimOps.partitionTopK]] (partition-local
  *    selection under the final total order) before the per-query rank
  *    window, so the window sees ≤ partitions·k rows per query no matter
  *    how many candidates the cap admits.
  *
  * Determinism: per-(q,d) scores fold `w` over the token-SORTED list (the
  * text_unigram_nll discipline — double addition is order-sensitive), are
  * rounded to 6 decimals, and ranked under (score_r DESC, doc_id ASC) —
  * near-ties collapse to exact ties resolved by id in BOTH engines. The
  * oracle SQL casts to DOUBLE before any non-binary-exact literal (2.2,
  * 1.2) because DuckDB keeps BIGINT·DECIMAL arithmetic exact-decimal,
  * which diverges from the JVM's double low bits.
  */
object RetrievalOps {

  type Q = (SparkSession, String) => DataFrame

  /** Query batch: the first [[NQueries]] doc_ids, the sim-family
    * convention (deterministic, filter pushes to the scan). */
  private val NQueries = 8
  /** Output depth (sim-family K). */
  private val K = 5
  /** Fusion input depth: each leg contributes its top-[[NFuse]]. */
  private val NFuse = 10

  /** `(doc_id, tok, tf)` — the narrow term frame every retrieval op
    * derives from. The indexed term is the dedup family's word-TRIGRAM
    * shingle ([[graft.functions.Functions.shingles]]), not the unigram:
    * on templated/boilerplate corpora the unigram vocabulary saturates
    * (this harness corpus: 31 distinct words, each in ~78% of documents
    * — measured via the df probe below), so unigram BM25 has no
    * discriminative signal and ANY df prune empties the model; the
    * 3-gram phrase unit is where lexical discrimination lives (trigram
    * df maxes at 25 on the sf0.1 corpus vs 3 923 for unigrams), and it
    * is the same unit the dedup family fingerprints — one shingle
    * definition across both families. Documents shorter than 3 words
    * contribute their whole normalized text as one term (the shingles()
    * convention). Map-side partial aggregation collapses repeated terms
    * before the exchange (the unigram_nll lesson).
    *
    * Shingling runs through the tf-carrying mode of the one-pass
    * [[graft.expressions.TextShingles]] expression (`text_shingles_all`)
    * — the declarative `shingles()` spelling evaluates the lambda
    * interpreter per window (~11 s per derivation at 5k docs vs ~1 s;
    * RetrievalSpec pins the two forms row-identical). */
  private[graft] def docToks(s: SparkSession, d: String): DataFrame =
    shingleFrame(s, documents(s, d))

  /** The df cap: `max(20, n_docs div 20)` — relative so it engages at
    * every SF (at 500 verify docs it prunes df > 25, i.e. the stop
    * words), with an absolute floor so tiny corpora aren't degenerately
    * pruned. Integer arithmetic (cross-engine exact). */
  private def capExpr: Column = greatest(lit(20L), expr("n_docs div 20"))

  /** The scoring core shared by the in-memory operator and the
    * persisted-index query path (one spelling, so the two can never
    * drift — TextIndexSpec pins their equality byte-for-byte).
    *
    * @param dtProbe the `(doc_id, tok, tf)` posting frame to score —
    *                the full corpus frame for the in-memory op; the
    *                query-term-restricted slice for the index path (the
    *                restriction is by tok, so per-term df counts are
    *                unchanged)
    * @param dl      `(doc_id, dl)` — doc lengths over the FULL corpus
    * @param stats   1-row `(n_docs, sum_dl)` — corpus-wide, broadcast
    * @param qt      `(q_id, tok)` query terms
    */
  private def bm25ScoreCore(dtProbe: DataFrame, dl: DataFrame,
      stats: DataFrame, qt: DataFrame, capped: Boolean): DataFrame = {
    val model = dtProbe.groupBy("tok").agg(count(lit(1)).as("df"))
    // per-query-term df rows: query-batch-sized, broadcast into the model
    // (the model is vocabulary-sized — it is never broadcast itself)
    val qmodel0 = model.join(broadcast(qt), Seq("tok"))
      .crossJoin(broadcast(stats))
    val qmodel = if (capped) qmodel0.where(col("df") <= capExpr) else qmodel0
    // BM25 term weight (k1 = 1.2, b = 0.75, spelled inline as 2.2 = k1+1,
    // 0.25 = 1−b so both engines share one spelling) — operation-for-
    // operation the oracle's expression, same IEEE op order:
    //   idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val w = idf * (col("tf").cast("double") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / (col("sum_dl") / col("n_docs"))))
    dtProbe.join(broadcast(qmodel), Seq("tok"))
      .where(col("doc_id") =!= col("q_id"))
      .join(dl, Seq("doc_id"))
      .withColumn("w", w)
      .groupBy("q_id", "doc_id")
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("tok"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")), 6).as("score_r"))
  }

  /** Scored BM25 candidates `(q_id, doc_id, score_r)`.
    * @param capped false = the audit's uncapped truth (stop-word postings
    *               and all — priced at verify scale only, by text_bm25_eval)
    */
  private def bm25Scored(s: SparkSession, d: String, capped: Boolean): DataFrame =
    // one-checkpoint discipline (r13): dt feeds the lengths, stats,
    // query-term and posting branches — without materialization the
    // tokenize Generate re-runs per exchange key (doc_id, tok, probe)
    bm25ScoredFrom(docToks(s, d).localCheckpoint(), capped)

  /** [[bm25Scored]] over a PREPARED (already materialized) posting
    * frame — so a caller scoring both the capped and uncapped forms
    * (text_bm25_eval) tokenizes the corpus once, not once per form. */
  private def bm25ScoredFrom(dt: DataFrame, capped: Boolean): DataFrame = {
    val dl = dt.groupBy("doc_id").agg(sum("tf").as("dl"))
    // 1-row corpus stats; n_docs counts TOKENIZED docs (empty-normalized
    // documents have no tokens in either engine, so the populations agree)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("double").as("sum_dl"))
    val qt = dt.where(col("doc_id") < NQueries)
      .select(col("doc_id").as("q_id"), col("tok"))
    bm25ScoreCore(dt, dl, stats, qt, capped)
  }

  /** Top-`k` of a scored frame under (score_r DESC, doc_id ASC):
    * partition-local selection, then the rank window over the bounded
    * survivor set. */
  private def bm25TopOf(scored: DataFrame, k: Int): DataFrame = {
    val pruned = SimOps.partitionTopK(
      scored.select(col("q_id"),
        col("doc_id").as("vec_id"), col("score_r").as("sim")), k)
    val win = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    pruned.withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("sim").as("score_r"))
  }

  private def bm25Top(s: SparkSession, d: String, k: Int, capped: Boolean): DataFrame =
    bm25TopOf(bm25Scored(s, d, capped), k)

  /** BM25 top-5 per query doc over the df-capped posting model. */
  val bm25TopK: Q = (s, d) =>
    bm25Top(s, d, K, capped = true).orderBy("q_id", "rank")

  /** The cap's measured price: recall of the capped top-K against the
    * uncapped truth, per query (the lsh_eval / substring_eval philosophy
    * — a scale cap ships WITH its quality instrument). Truth-side cost
    * (stop-word postings, Zipf fan-in) is the audit's price, paid at
    * verify scale; the registered production op is the capped one. */
  val bm25Eval: Q = (s, d) => {
    // BOTH forms reference one LAZY dt (r13): the truth⋈detector plan
    // holds two identical tokenize subtrees and AQE exchange-reuse
    // already dedupes them at runtime — measured 2.2 s lazy vs 3.0 s
    // with two eager per-form checkpoints and 2.6 s with one shared
    // eager checkpoint (the materialization write costs more than the
    // reuse it buys in this single-action plan). bm25Scored keeps its
    // checkpoint for the single-form consumers, where the probe showed
    // the opposite (hybrid_rrf 3.35 -> 2.46).
    val dt = docToks(s, d)
    val truth = bm25TopOf(bm25ScoredFrom(dt, capped = false), K)
      .select(col("q_id"), col("neighbor_id"))
    val det = bm25TopOf(bm25ScoredFrom(dt, capped = true), K)
      .select(col("q_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(det, Seq("q_id", "neighbor_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hit"))
      .withColumn("recall_r",
        round(col("n_hit").cast("double") / col("n_truth"), 6))
      .orderBy("q_id")
  }

  /** Mining depth for [[hardNegatives]] — deeper than the serving K so
    * dropping the near-dup positives still leaves a usable negative
    * set per query. */
  private val HnK = 10

  /** Hard-negative mining for contrastive retrieval training — the
    * standard dense-retriever data-prep step (DPR, Karpukhin et al.
    * EMNLP'20: "BM25 hard negatives"): for each query doc, the top
    * BM25 candidates are exactly the lexically-confusable documents a
    * bi-encoder must learn to push away. The trap this operator
    * exists to close is FALSE negatives: a near-duplicate of the query
    * ranks at the top of BM25 and, labeled as a negative, teaches the
    * model to separate a pair that should coincide. So each candidate
    * carries its verdict from the capped jaccard pair graph (the SAME
    * generator the dedup shelf elects keepers from) and `neg_rank`
    * numbers only the cleared candidates (0 = excluded positive) —
    * a trainer takes `neg_rank BETWEEN 1 AND n` per query and never
    * sees a poisoned pair.
    *
    * Scale shape: candidates ride the existing capped BM25 machinery
    * (broadcast query model, partition-local top-k); the near-dup
    * flags come from the Σdf²-bounded capped generator restricted to
    * the query batch BEFORE the join (query-batch-sized, broadcast);
    * the running renumber is a per-query window over ≤ [[HnK]] rows. */
  val hardNegatives: Q = (s, d) => {
    val cand = bm25Top(s, d, HnK, capped = true)
    val p = DedupOps.ngramJaccardCapped(s, d).select("doc_a", "doc_b")
    val symQ = p.select(col("doc_a").as("q_id"), col("doc_b").as("neighbor_id"))
      .unionByName(p.select(col("doc_b").as("q_id"), col("doc_a").as("neighbor_id")))
      .where(col("q_id") < NQueries)
      .withColumn("nd", lit(1))
    val w = Window.partitionBy("q_id").orderBy("rank")
    cand.join(broadcast(symQ), Seq("q_id", "neighbor_id"), "left")
      .withColumn("is_near_dup", coalesce(col("nd"), lit(0))).drop("nd")
      .withColumn("neg_rank",
        when(col("is_near_dup") === 1, lit(0)).otherwise(
          sum(lit(1) - col("is_near_dup")).over(w)).cast("int"))
      .select("q_id", "rank", "neighbor_id", "score_r", "is_near_dup", "neg_rank")
      .orderBy("q_id", "rank")
  }

  /** Per-document top-5 keywords by smooth TF-IDF (sublinear tf,
    * sklearn's `(1+ln tf)·(ln((1+N)/(1+df))+1)`). Unlike BM25 every doc
    * is a "query", so the model can't ride a broadcast query batch;
    * instead the HOT tokens (df > cap) are pruned from the token frame by
    * a broadcast anti-join BEFORE the model join — the hot list is
    * bounded by Σdf/cap ≤ 20·avg-doc-vocab rows (constant in N, always
    * broadcastable) — and the surviving join has fan-in ≤ cap per key.
    * Stop words never make top keywords (their idf is minimal), so the
    * prune is quality-neutral by construction here, not just measured. */
  val tfidfTopTerms: Q = (s, d) => {
    // one-checkpoint discipline (r13, see bm25Scored)
    val dt = docToks(s, d).localCheckpoint()
    val dl = dt.groupBy("doc_id").agg(count(lit(1)).as("n_terms"))
    val stats = dl.agg(count(lit(1)).as("n_docs"))
    val model = dt.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
    val hot = model.where(col("df") > capExpr).select("tok")
    val kept = model.where(col("df") <= capExpr)
    val win = Window.partitionBy("doc_id").orderBy(col("score_r").desc, col("tok"))
    dt.join(broadcast(hot), Seq("tok"), "left_anti")
      .join(kept, Seq("tok"))
      .withColumn("score_r", round(
        (lit(1.0) + log(col("tf").cast("double"))) *
          (log((col("n_docs").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= K)
      .select(col("doc_id"), col("rank"), col("tok"), col("score_r"))
      .orderBy("doc_id", "rank")
  }

  /** Hybrid retrieval: reciprocal-rank fusion (k=60, Cormack et al.) of
    * the BM25 leg and the dense leg ([[SimOps.bruteTop]] — exact cosine,
    * so the fused ranks inherit sim_brute's established rank parity).
    * Corpus convention: `embeddings.vec_id` IS the doc_id of the embedded
    * document (the tables are generated id-aligned), so both legs rank
    * the same candidate space. RRF arithmetic is two exact double
    * divisions summed in a fixed order — no transcendentals, so the only
    * rounding is the final display round. */
  /** RRF fusion tail shared by the in-memory and fully-indexed hybrid
    * paths: `b`/`c` are `(q_id, doc_id, rank_b/rank_c)` leg rankings. */
  private def fuseRrf(b: DataFrame, c: DataFrame, k: Int = K): DataFrame = {
    val win = Window.partitionBy("q_id").orderBy(col("rrf_r").desc, col("doc_id"))
    b.join(c, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_r", round(
        coalesce(lit(1.0) / (lit(60) + col("rank_b")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rank_c")), lit(0.0)), 6))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id").as("neighbor_id"),
        col("rrf_r"))
      .orderBy("q_id", "rank")
  }

  val hybridRrf: Q = (s, d) =>
    fuseRrf(
      bm25Top(s, d, NFuse, capped = true)
        .select(col("q_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("rank_b")),
      SimOps.bruteTop(s, d, NFuse)
        .select(col("q_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("rank_c")))

  /** MMR diversification (Carbonell & Goldstein SIGIR'98) over the
    * hybrid pool: greedy selection of [[K]] results maximizing
    * λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s) with λ = 0.7 — the
    * post-processing a RAG stack runs so five near-identical passages
    * don't fill the context window.
    *
    * Determinism discipline: every greedy decision compares ROUND-6
    * similarities (near-ties collapse to exact ties resolved by id in
    * both engines — the rank-key convention), and the K−1 selection
    * rounds are UNROLLED (the BPE/CC-rounds discipline: a greedy
    * sequential algorithm becomes K−1 bounded dataframe rounds, never a
    * driver loop over collected rows). Cost: the pool is [[NFuse]] rows
    * per query, the pair matrix ≤ NFuse² per query — everything after
    * pool construction is query-batch-sized, independent of corpus
    * size. The first pick is pure relevance (the MMR base case), so its
    * reported score is rel_r; later rows report their penalized score. */
  val hybridMmr: Q = (s, d) => {
    // pool/rel/ps are query-batch-sized (≤ NFuse·|Q| and NFuse²·|Q|
    // rows). localCheckpoint is ESSENTIAL, not an optimization: each
    // greedy round's frame references the previous round's ~3 times, so
    // without truncating the lineage the corpus-scanning base chains
    // would be re-derived O(3^K) times (measured: the sf1 replay ran
    // past 10 minutes; checkpointed it is seconds) — the BPE trainer's
    // wf.localCheckpoint() lesson at a higher power.
    val pool = fuseRrf(
      bm25Top(s, d, NFuse, capped = true)
        .select(col("q_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("rank_b")),
      SimOps.bruteTop(s, d, NFuse)
        .select(col("q_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("rank_c")),
      NFuse)
      .select(col("q_id"), col("neighbor_id").as("doc_id"))
      .localCheckpoint()
    val cp = SimOps.corpusWithNorm(s, d)
    val qp = SimOps.qset(s, d)
    val rel = pool
      .join(cp, col("doc_id") === col("vec_id"))
      .join(broadcast(qp), Seq("q_id"))
      .select(col("q_id"), col("doc_id"),
        round(expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm")), 6)
          .as("rel_r"))
      .localCheckpoint()
    val a = pool.select(col("q_id"), col("doc_id").as("a_id"))
      .join(cp.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("c_nrm").as("a_nrm")), Seq("a_id"))
    val b = pool.select(col("q_id"), col("doc_id").as("b_id"))
      .join(cp.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("c_nrm").as("b_nrm")), Seq("b_id"))
    val ps = a.join(b, Seq("q_id")).where(col("a_id") =!= col("b_id"))
      .select(col("q_id"), col("a_id"), col("b_id"),
        round(expr("float_dot(a_emb, b_emb)") / (col("a_nrm") * col("b_nrm")), 6)
          .as("sim_r"))
      .localCheckpoint()
    val w1 = Window.partitionBy("q_id").orderBy(col("rel_r").desc, col("doc_id"))
    var selected = rel.withColumn("rn", row_number().over(w1))
      .where(col("rn") === 1)
      .select(col("q_id"), col("doc_id"), lit(1).as("rank"),
        col("rel_r").as("mmr_r"))
    for (i <- 2 to K) {
      val cand = rel
        .join(selected.select("q_id", "doc_id"), Seq("q_id", "doc_id"), "left_anti")
        .join(ps.withColumnRenamed("a_id", "doc_id"), Seq("q_id", "doc_id"))
        .join(selected.select(col("q_id"), col("doc_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy("q_id", "doc_id", "rel_r").agg(max("sim_r").as("ms"))
        .withColumn("mmr",
          round(lit(0.7) * col("rel_r") - lit(0.3) * col("ms"), 6))
      val wi = Window.partitionBy("q_id").orderBy(col("mmr").desc, col("doc_id"))
      // checkpoint each round's selection (r13): round i references
      // round i−1's frame three times (anti-join, b_id join, union), so
      // the un-truncated lineage fans out 3^(K−1) logical subtrees —
      // measured as a 690 KB explain() and seconds of pure
      // planning/codegen per action even with rel/ps checkpointed. The
      // per-round frame is ≤ |Q|·i rows; cutting it keeps the plan
      // linear in K for the cost of K−1 tiny jobs.
      selected = selected.unionByName(
        cand.withColumn("rn", row_number().over(wi)).where(col("rn") === 1)
          .select(col("q_id"), col("doc_id"), lit(i).as("rank"),
            col("mmr").as("mmr_r")))
        .localCheckpoint()
    }
    selected
      .select(col("q_id"), col("rank"), col("doc_id").as("neighbor_id"),
        col("mmr_r"))
      .orderBy("q_id", "rank")
  }

  /** The fully-indexed online serving path: hybrid RRF answered entirely
    * from STANDING indexes — lexical leg from the persisted inverted
    * index ([[bm25TopKFromIndex]], its top-[[K]] serving depth), dense
    * leg from the persisted IVF lists + PQ codes + float store
    * ([[SimOps.ivfPqTopKFromIndex]], its top-3 serving depth). No corpus
    * scan, no training, no brute-force pass at query time — the shape a
    * RAG deployment actually runs. Legs fuse at their native serving
    * depths (RRF is well-defined over unequal list lengths); the dense
    * leg is the ANN approximation rather than sim_brute, so fused ranks
    * can differ from [[hybridRrf]] exactly where the ANN index differs —
    * that trade is the one every serving stack makes, and the ANN side's
    * recall floor is already gated in Bench. */
  def hybridRrfFromIndex(s: SparkSession, d: String,
      textDir: String, ivfDir: String, pqDir: String): DataFrame =
    fuseRrf(
      bm25TopKFromIndex(s, d, textDir)
        .select(col("q_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("rank_b")),
      SimOps.ivfPqTopKFromIndex(s, d, ivfDir, pqDir)
        .select(col("q_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("rank_c")))

  // -------------------------------------------------------------------
  // Persisted inverted index — the offline/online split of a lexical
  // deployment, mirroring the IVF/PQ persisted-index story: build once,
  // append incrementally, answer queries without re-deriving the posting
  // lists from the corpus.
  // -------------------------------------------------------------------

  /** Shingle an arbitrary `(doc_id, text)` frame into `(doc_id, tok, tf)`
    * — the build and append paths must tokenize IDENTICALLY or appended
    * documents would score against a different term universe. */
  private def shingleFrame(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.expressions.TextShingles.register(s)
    docs.select(col("doc_id"),
      explode(expr("text_shingles_all(text, 3)")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
  }

  /** Persist the inverted index. Layout: `dir/postings` (tok, doc_id,
    * tf), range-partitioned by tok and sorted within partitions so
    * parquet row-group min/max statistics prune a query's read to its
    * own terms' posting runs (range, not hash, partitioning — a hash
    * shuffle on the term key would put every boilerplate term in one
    * writer task; range bounds sample-balance the skew); and
    * `dir/doclens` (doc_id, dl). Corpus stats (n_docs, sum_dl) are NOT
    * stored: they are one count+sum over the narrow doclens table,
    * re-derived additively at read time, so an append can never leave a
    * stale snapshot behind. */
  def buildTextIndex(s: SparkSession, d: String, dir: String): Unit = {
    val dt = docToks(s, d)
    dt.repartitionByRange(col("tok"))
      .sortWithinPartitions("tok", "doc_id")
      .write.mode("overwrite").parquet(dir + "/postings")
    dt.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(dir + "/doclens")
  }

  /** Incremental ingest: shingle a NEW `(doc_id, text)` batch with the
    * build's exact tokenizer and append its postings + lengths. Ingest
    * cost ∝ batch tokens — standing rows are never rewritten (small
    * appended files compact on the deployment's own cadence). Retry
    * safety, two layers: (1) the batch is anti-joined against the
    * standing doclens doc_ids, so re-ingesting an EXISTING doc_id —
    * byte-identical replay or conflicting new text — appends nothing
    * (the "new docs only" contract is enforced here, not just
    * documented; without it a changed-text replay would union old+new
    * postings and leave two conflicting doclens rows for
    * dropDuplicates to pick arbitrarily); (2) the query path still
    * dedups postings by (doc_id, tok) and doclens by doc_id, covering
    * a retry that interleaves with its own first attempt's partial
    * write. The anti-join's right side is the narrow doclens id column
    * — one slim scan per batch. TextIndexSpec pins the replay AND the
    * conflicting-update case. */
  def appendToTextIndex(s: SparkSession, dir: String, docs: DataFrame): Unit = {
    // Bootstrap: the streaming twin's first micro-batch appends into an
    // empty directory — no doclens yet means no standing ids to collide.
    val dlPath = new org.apache.hadoop.fs.Path(dir + "/doclens")
    val fs = dlPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fresh =
      if (fs.exists(dlPath))
        docs.join(s.read.parquet(dir + "/doclens").select("doc_id"),
          Seq("doc_id"), "left_anti")
      else docs
    val dt = shingleFrame(s, fresh)
    dt.write.mode("append").parquet(dir + "/postings")
    dt.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("append").parquet(dir + "/doclens")
  }

  /** The user-facing free-text search API: BM25 top-`k` documents for
    * arbitrary query STRINGS against a persisted index — what an
    * application actually calls (the registry ops take corpus
    * directories because the oracle harness replays them; this is the
    * same scoring core behind a `Seq[String]` front door). Queries are
    * shingled with the build's exact tokenizer; q_id is the position in
    * `queryTexts`. Per-query cost: the query terms' posting slice plus
    * the narrow doclens table. */
  def bm25Search(s: SparkSession, indexDir: String,
      queryTexts: Seq[String], k: Int = K): DataFrame = {
    import s.implicits._
    val postings = s.read.parquet(indexDir + "/postings")
      .dropDuplicates("doc_id", "tok")
    val doclens = s.read.parquet(indexDir + "/doclens").dropDuplicates("doc_id")
    val stats = doclens.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("double").as("sum_dl"))
    val qdocs = queryTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // query ids live in their own space; negate past -1 so no corpus
    // doc_id can collide with them (the core's self-exclusion predicate
    // then never fires, which is correct — a free-text query IS no doc)
    val qt = shingleFrame(s, qdocs)
      .select((-col("doc_id") - 1).as("q_id"), col("tok"))
    val dtProbe = postings.join(
      broadcast(qt.select("tok").distinct()), Seq("tok"), "left_semi")
    bm25TopOf(bm25ScoreCore(dtProbe, doclens, stats, qt, capped = true), k)
      .select((-col("q_id") - 1).cast("int").as("query_idx"), col("rank"),
        col("neighbor_id").as("doc_id"), col("score_r"))
      .orderBy("query_idx", "rank")
  }

  /** Query a PERSISTED index: identical semantics (and bytes —
    * TextIndexSpec pins it) to [[bm25TopK]] over the same corpus, but
    * the per-query work reads only the query terms' posting slice (the
    * broadcast semi join is the predicate parquet prunes row groups
    * with) plus the narrow doclens table — the corpus text is touched
    * only to shingle the 8 query documents. df/n_docs/sum_dl all derive
    * from the DEDUPED standing tables, so replayed appends change
    * nothing. */
  def bm25TopKFromIndex(s: SparkSession, d: String, dir: String): DataFrame = {
    val postings = s.read.parquet(dir + "/postings")
      .dropDuplicates("doc_id", "tok")
    val doclens = s.read.parquet(dir + "/doclens").dropDuplicates("doc_id")
    val stats = doclens.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("double").as("sum_dl"))
    val qt = docToks(s, d).where(col("doc_id") < NQueries)
      .select(col("doc_id").as("q_id"), col("tok"))
    val dtProbe = postings.join(
      broadcast(qt.select("tok").distinct()), Seq("tok"), "left_semi")
    bm25TopOf(bm25ScoreCore(dtProbe, doclens, stats, qt, capped = true), K)
      .orderBy("q_id", "rank")
  }

  // -------------------------------------------------------------------
  // Chunk-level retrieval — what a RAG stack actually serves: queries
  // retrieve passages, not whole documents. Chunks are PipelineOps's
  // doc_chunk windows (50 words, stride 40 — ONE chunk definition
  // across chunk_dedup and retrieval, same constants), re-keyed into a
  // single composite id so the whole BM25 machinery applies unchanged.
  // -------------------------------------------------------------------

  /** Chunk id packing: cid = (doc_id + 1)·2³² + chunk_id. The +1
    * offset keeps every cid above the query-id range. The base is wide
    * enough that NO representable document can collide into the next
    * doc's range: a JVM string caps at ~2³¹ chars, so ≤ ~2³⁰ words and
    * ≤ ~2²⁵ chunks at stride 40 — four billion chunks of headroom vs
    * the old 1024, where a ~41k-word document would have silently
    * aliased its chunks into its neighbor's ids with both engines
    * computing the same wrong answer (un-catchable by the oracle
    * compare). Interpolated into BOTH engines' SQL, so parity is
    * structural. doc_id itself stays well under 2³¹ at any SF. */
  private val ChunkIdBase = 1L << 32

  /** `(doc_id = cid, text, src_doc, chunk_id)` — the chunk corpus. */
  private def chunkFrame(s: SparkSession, d: String): DataFrame = {
    val (cw, cs) = (PipelineOps.ChunkWords, PipelineOps.ChunkStride)
    documents(s, d)
      .withColumn("w", split(normalizeText(col("text")), " "))
      .withColumn("len", size(col("w")))
      .withColumn("n_chunks",
        when(col("len") <= cw, lit(1))
          .otherwise(expr(s"(len - $cw + ${cs - 1}) div $cs + 1")))
      .select(col("doc_id").as("src_doc"), col("w"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
      .select(
        ((col("src_doc") + 1) * ChunkIdBase + col("chunk_id")).as("doc_id"),
        expr(s"array_join(slice(w, chunk_id * $cs + 1, $cw), ' ')").as("text"),
        col("src_doc"), col("chunk_id"))
  }

  /** BM25 top-5 PASSAGES per query document: the query side is the
    * document's trigram terms, the corpus side is the chunk frame, and
    * the query document's OWN chunks are excluded (they would trivially
    * occupy every rank — RAG excludes the query's source). Same core,
    * same cap (derived from the CHUNK population — the corpus being
    * scored), same fold; output decomposes the composite id back into
    * (chunk_doc_id, chunk_id). Scale: r9 isolated quiet-box ratio at
    * the 10× corpus is 3.32 s → 8.07 s = **2.43×** (the r8 raw 8.7×
    * was scale-tail context inflation; the near-bar reprobe band now
    * adjudicates this in-artifact). */
  val chunkBm25TopK: Q = (s, d) => {
    val dt = shingleFrame(s, chunkFrame(s, d).select(col("doc_id"), col("text")))
    val dl = dt.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("double").as("sum_dl"))
    val qt = docToks(s, d).where(col("doc_id") < NQueries)
      .select(col("doc_id").as("q_id"), col("tok"))
    val scored = bm25ScoreCore(dt, dl, stats, qt, capped = true)
      .where(expr(s"doc_id div $ChunkIdBase - 1") =!= col("q_id"))
    bm25TopOf(scored, K)
      .select(col("q_id"), col("rank"),
        expr(s"neighbor_id div $ChunkIdBase - 1").as("chunk_doc_id"),
        expr(s"cast(neighbor_id % $ChunkIdBase as int)").as("chunk_id"),
        col("score_r"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "text_bm25_topk" -> bm25TopK,
    "text_bm25_eval" -> bm25Eval,
    "text_hard_negatives" -> hardNegatives,
    "text_tfidf_topterms" -> tfidfTopTerms,
    "sim_hybrid_rrf" -> hybridRrf,
    "chunk_bm25_topk" -> chunkBm25TopK,
    "sim_hybrid_mmr" -> hybridMmr,
  )

  // -------------------------------------------------------------------
  // DuckDB oracles. CTE-for-CTE mirrors of the plans above. DOUBLE casts
  // are load-bearing wherever a non-binary-exact literal (2.2, 1.2)
  // would otherwise run in DuckDB's exact DECIMAL arithmetic.
  // -------------------------------------------------------------------

  private val Norm = DedupOps.NormSql

  /** The tf-carrying trigram frame — [[DedupOps.ShinglesSql]] without the
    * DISTINCT (retrieval needs term frequency; dedup only membership).
    * Same slicing convention: docs of < 3 words emit their whole
    * normalized text once. `src` is any relation exposing (doc_id,
    * text); `p` prefixes the CTE names so two chains (corpus + query
    * side) can coexist in one statement. Ends in `${p}dt(doc_id, tok,
    * tf)`. */
  private def gramCtesNamed(src: String, p: String): String =
    s"""${p}norm AS (SELECT doc_id, $Norm AS t FROM $src),
        ${p}words AS (SELECT doc_id, string_split(t, ' ') AS w FROM ${p}norm),
        ${p}idx AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i FROM ${p}words),
        ${p}g AS (SELECT doc_id,
                CASE WHEN len(w) >= 3 THEN array_to_string(w[i:i+2], ' ')
                     ELSE array_to_string(w, ' ') END AS tok
              FROM ${p}idx),
        ${p}dt AS MATERIALIZED (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
               FROM ${p}g WHERE tok <> '' GROUP BY doc_id, tok)"""

  private val GramCtes = gramCtesNamed("documents", "")

  /** Shared BM25 CTE chain ending in `sc(q_id, doc_id, score_r)`. */
  private def bm25Ctes(capped: Boolean): String = {
    val capFilter =
      if (capped) "AND m.df <= greatest(20, st.n_docs // 20)" else ""
    s"""$GramCtes,
        dl AS MATERIALIZED (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
        st AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dl),
        m AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
        qm AS (SELECT q.doc_id AS q_id, q.tok, m.df
               FROM dt q JOIN m USING (tok), st
               WHERE q.doc_id < $NQueries $capFilter),
        c AS (SELECT qm.q_id, dt.doc_id, qm.tok,
                ln((CAST(st.n_docs - qm.df AS DOUBLE) + 0.5)
                   / (CAST(qm.df AS DOUBLE) + 0.5) + 1.0)
                * (CAST(dt.tf AS DOUBLE) * 2.2)
                / (dt.tf + 1.2 * (0.25 + 0.75 * dt2.dl / (st.sum_dl / st.n_docs))) AS w
              FROM qm JOIN dt USING (tok)
                   JOIN dl dt2 ON dt.doc_id = dt2.doc_id, st
              WHERE dt.doc_id <> qm.q_id),
        sc AS (SELECT q_id, doc_id, round(list_sum(list(w ORDER BY tok)), 6) AS score_r
               FROM c GROUP BY q_id, doc_id)"""
  }

  val oracles: Map[String, String] = Map(
    "text_bm25_topk" ->
      s"""WITH ${bm25Ctes(capped = true)},
          r AS (SELECT q_id, doc_id, score_r,
                  row_number() OVER (PARTITION BY q_id ORDER BY score_r DESC, doc_id) AS rank
                FROM sc)
          SELECT q_id, CAST(rank AS INT) AS rank, doc_id AS neighbor_id, score_r
          FROM r WHERE rank <= $K ORDER BY q_id, rank""",
    "text_hard_negatives" ->
      s"""WITH ${bm25Ctes(capped = true)},
          r AS (SELECT q_id, doc_id, score_r,
                  row_number() OVER (PARTITION BY q_id ORDER BY score_r DESC, doc_id) AS rank
                FROM sc),
          cand AS (SELECT q_id, CAST(rank AS INT) AS rank, doc_id AS neighbor_id, score_r
                   FROM r WHERE rank <= $HnK),
          nd AS (SELECT doc_a, doc_b FROM (${DedupOps.JaccardPairsSelect})),
          sym AS (SELECT doc_a AS q_id, doc_b AS neighbor_id FROM nd
                  UNION ALL SELECT doc_b, doc_a FROM nd),
          fl AS (SELECT c.q_id, c.rank, c.neighbor_id, c.score_r,
                   CASE WHEN s.q_id IS NULL THEN 0 ELSE 1 END AS is_near_dup
                 FROM cand c LEFT JOIN sym s
                   ON s.q_id = c.q_id AND s.neighbor_id = c.neighbor_id)
          SELECT q_id, rank, neighbor_id, score_r,
            CAST(is_near_dup AS INT) AS is_near_dup,
            CAST(CASE WHEN is_near_dup = 1 THEN 0
                 ELSE SUM(1 - is_near_dup) OVER (PARTITION BY q_id ORDER BY rank) END AS INT) AS neg_rank
          FROM fl ORDER BY q_id, rank""",
    "text_bm25_eval" ->
      s"""WITH ${bm25Ctes(capped = false)},
          rf AS (SELECT q_id, doc_id,
                   row_number() OVER (PARTITION BY q_id ORDER BY score_r DESC, doc_id) AS rank
                 FROM sc),
          tr AS (SELECT q_id, doc_id FROM rf WHERE rank <= $K),
          mc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
          qmc AS (SELECT q.doc_id AS q_id, q.tok, mc.df
                  FROM dt q JOIN mc USING (tok), st
                  WHERE q.doc_id < $NQueries AND mc.df <= greatest(20, st.n_docs // 20)),
          cc AS (SELECT qmc.q_id, dt.doc_id, qmc.tok,
                   ln((CAST(st.n_docs - qmc.df AS DOUBLE) + 0.5)
                      / (CAST(qmc.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(dt.tf AS DOUBLE) * 2.2)
                   / (dt.tf + 1.2 * (0.25 + 0.75 * dt2.dl / (st.sum_dl / st.n_docs))) AS w
                 FROM qmc JOIN dt USING (tok)
                      JOIN dl dt2 ON dt.doc_id = dt2.doc_id, st
                 WHERE dt.doc_id <> qmc.q_id),
          scc AS (SELECT q_id, doc_id, round(list_sum(list(w ORDER BY tok)), 6) AS score_r
                  FROM cc GROUP BY q_id, doc_id),
          rc AS (SELECT q_id, doc_id,
                   row_number() OVER (PARTITION BY q_id ORDER BY score_r DESC, doc_id) AS rank
                 FROM scc),
          de AS (SELECT q_id, doc_id, 1 AS hit FROM rc WHERE rank <= $K)
          SELECT tr.q_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
            CAST(COUNT(de.hit) AS BIGINT) AS n_hit,
            round(CAST(COUNT(de.hit) AS DOUBLE) / COUNT(*), 6) AS recall_r
          FROM tr LEFT JOIN de ON tr.q_id = de.q_id AND tr.doc_id = de.doc_id
          GROUP BY tr.q_id ORDER BY tr.q_id""",
    "text_tfidf_topterms" ->
      s"""WITH $GramCtes,
          st AS MATERIALIZED (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
          m AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
          k AS (SELECT m.tok, m.df FROM m, st WHERE m.df <= greatest(20, st.n_docs // 20)),
          w AS (SELECT dt.doc_id, dt.tok,
                  round((1.0 + ln(CAST(dt.tf AS DOUBLE)))
                    * (ln((CAST(st.n_docs AS DOUBLE) + 1.0)
                         / (CAST(k.df AS DOUBLE) + 1.0)) + 1.0), 6) AS score_r
                FROM dt JOIN k USING (tok), st),
          r AS (SELECT doc_id, tok, score_r,
                  row_number() OVER (PARTITION BY doc_id ORDER BY score_r DESC, tok) AS rank
                FROM w)
          SELECT doc_id, CAST(rank AS INT) AS rank, tok, score_r
          FROM r WHERE rank <= $K ORDER BY doc_id, rank""",
    // mirrors chunkBm25TopK: the chunk chain feeds the corpus gram CTEs
    // (unprefixed, so dt/dl/st/m keep their bm25 spellings), the query
    // side is a second, q-prefixed gram chain over documents, and the
    // exclusion is by PARENT doc, not candidate id
    "chunk_bm25_topk" -> {
      val (cw, cs) = (PipelineOps.ChunkWords, PipelineOps.ChunkStride)
      s"""WITH cwords AS (SELECT doc_id AS src_doc, string_split($Norm, ' ') AS w FROM documents),
          cn AS (SELECT src_doc, w,
                   CASE WHEN len(w) <= $cw THEN 1
                        ELSE (len(w) - $cw + ${cs - 1}) // $cs + 1 END AS n_chunks
                 FROM cwords),
          cc AS (SELECT src_doc, w, unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM cn),
          chunks AS (SELECT (src_doc + 1) * $ChunkIdBase + chunk_id AS doc_id,
                       array_to_string(w[chunk_id * $cs + 1 : chunk_id * $cs + $cw], ' ') AS text
                     FROM cc),
          ${gramCtesNamed("chunks", "")},
          dl AS MATERIALIZED (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
          st AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dl),
          m AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
          ${gramCtesNamed("documents", "q")},
          qm AS (SELECT q.doc_id AS q_id, q.tok, m.df
                 FROM qdt q JOIN m USING (tok), st
                 WHERE q.doc_id < $NQueries AND m.df <= greatest(20, st.n_docs // 20)),
          c AS (SELECT qm.q_id, dt.doc_id, qm.tok,
                  ln((CAST(st.n_docs - qm.df AS DOUBLE) + 0.5)
                     / (CAST(qm.df AS DOUBLE) + 0.5) + 1.0)
                  * (CAST(dt.tf AS DOUBLE) * 2.2)
                  / (dt.tf + 1.2 * (0.25 + 0.75 * dt2.dl / (st.sum_dl / st.n_docs))) AS w
                FROM qm JOIN dt USING (tok)
                     JOIN dl dt2 ON dt.doc_id = dt2.doc_id, st
                WHERE dt.doc_id // $ChunkIdBase - 1 <> qm.q_id),
          sc AS (SELECT q_id, doc_id, round(list_sum(list(w ORDER BY tok)), 6) AS score_r
                 FROM c GROUP BY q_id, doc_id),
          r AS (SELECT q_id, doc_id, score_r,
                  row_number() OVER (PARTITION BY q_id ORDER BY score_r DESC, doc_id) AS rank
                FROM sc)
          SELECT q_id, CAST(rank AS INT) AS rank,
            CAST(doc_id // $ChunkIdBase - 1 AS BIGINT) AS chunk_doc_id,
            CAST(doc_id % $ChunkIdBase AS INT) AS chunk_id, score_r
          FROM r WHERE rank <= $K ORDER BY q_id, rank"""
    },
    "sim_hybrid_rrf" ->
      s"""WITH $hybridFusedCtes
          SELECT q_id, CAST(rank AS INT) AS rank, doc_id AS neighbor_id, rrf_r
          FROM fr WHERE rank <= $K ORDER BY q_id, rank""",
    "sim_hybrid_mmr" -> mmrOracleSql,
  )

  /** The fused-ranking CTE chain shared by the hybrid and MMR oracles —
    * ends in `fr(q_id, doc_id, rrf_r, rank)`. */
  private def hybridFusedCtes: String =
    s"""${bm25Ctes(capped = true)},
        rb AS (SELECT q_id, doc_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY score_r DESC, doc_id) AS rank_b
               FROM sc),
        b AS (SELECT q_id, doc_id, CAST(rank_b AS INT) AS rank_b FROM rb WHERE rank_b <= $NFuse),
        q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NQueries),
        cscored AS (SELECT q.q_id, e.vec_id AS doc_id,
                      ${SimOps.cos("q.q_emb", "e.embedding")} AS sim
                    FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
        cranked AS (SELECT q_id, doc_id,
                      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rank_c
                    FROM cscored),
        cw AS (SELECT q_id, doc_id, CAST(rank_c AS INT) AS rank_c FROM cranked WHERE rank_c <= $NFuse),
        f AS (SELECT COALESCE(b.q_id, cw.q_id) AS q_id,
                COALESCE(b.doc_id, cw.doc_id) AS doc_id,
                round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.rank_b), 0.0)
                    + COALESCE(CAST(1.0 AS DOUBLE) / (60 + cw.rank_c), 0.0), 6) AS rrf_r
              FROM b FULL JOIN cw ON b.q_id = cw.q_id AND b.doc_id = cw.doc_id),
        fr AS MATERIALIZED (SELECT q_id, doc_id, rrf_r,
                 row_number() OVER (PARTITION BY q_id ORDER BY rrf_r DESC, doc_id) AS rank
               FROM f)"""

  /** Mirror of [[hybridMmr]]: pool/rel/pair CTEs, then K−1 unrolled
    * greedy rounds (sel1 … sel$K), each an argmax over round-6 scores. */
  private def mmrOracleSql: String = {
    val sb = new StringBuilder(
      s"""WITH $hybridFusedCtes,
          pool AS (SELECT q_id, doc_id FROM fr WHERE rank <= $NFuse),
          rel AS MATERIALIZED (SELECT p.q_id, p.doc_id,
                   round(${SimOps.cos("qe.embedding", "ce.embedding")}, 6) AS rel_r
                 FROM pool p
                 JOIN embeddings qe ON qe.vec_id = p.q_id
                 JOIN embeddings ce ON ce.vec_id = p.doc_id),
          ps AS MATERIALIZED (SELECT pa.q_id, pa.doc_id AS a_id, pb.doc_id AS b_id,
                   round(${SimOps.cos("ea.embedding", "eb.embedding")}, 6) AS sim_r
                 FROM pool pa JOIN pool pb
                   ON pa.q_id = pb.q_id AND pa.doc_id <> pb.doc_id
                 JOIN embeddings ea ON ea.vec_id = pa.doc_id
                 JOIN embeddings eb ON eb.vec_id = pb.doc_id),
          sel1 AS (SELECT q_id, doc_id, 1 AS rank, rel_r AS mmr_r FROM
                     (SELECT q_id, doc_id, rel_r,
                        row_number() OVER (PARTITION BY q_id ORDER BY rel_r DESC, doc_id) AS rn
                      FROM rel) t WHERE rn = 1)""")
    for (i <- 2 to K) {
      val prev = s"sel${i - 1}"
      sb.append(s""",
          c$i AS (SELECT r.q_id, r.doc_id, r.rel_r, MAX(p.sim_r) AS ms
                  FROM rel r
                  JOIN ps p ON p.q_id = r.q_id AND p.a_id = r.doc_id
                  JOIN $prev s ON s.q_id = p.q_id AND s.doc_id = p.b_id
                  WHERE NOT EXISTS (SELECT 1 FROM $prev x
                                    WHERE x.q_id = r.q_id AND x.doc_id = r.doc_id)
                  GROUP BY r.q_id, r.doc_id, r.rel_r),
          p$i AS (SELECT q_id, doc_id, $i AS rank, mmr AS mmr_r FROM
                    (SELECT q_id, doc_id, mmr,
                       row_number() OVER (PARTITION BY q_id ORDER BY mmr DESC, doc_id) AS rn
                     FROM (SELECT q_id, doc_id,
                             round(0.7 * rel_r - 0.3 * ms, 6) AS mmr FROM c$i) t0) t
                  WHERE rn = 1),
          sel$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$i)""")
    }
    sb.append(s"""
        SELECT q_id, CAST(rank AS INT) AS rank, doc_id AS neighbor_id, mmr_r
        FROM sel$K ORDER BY q_id, rank""")
    sb.toString
  }
}
