package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * - `sim_brute_topk`: exact cosine top-k — the correctness baseline. The
  *   (small) query set is broadcast, so the corpus streams through one
  *   scan with no shuffle of the big side; the only shuffle is the final
  *   per-query top-k (k·|Q| rows).
  * - `sim_lsh_topk`: the scale path — sign-bit LSH buckets bound the
  *   candidate set before scoring, turning O(|Q|·N) into O(|Q|·N/2^bits)
  *   per bucket; same top-k afterwards.
  *
  * Dot products accumulate strictly left-to-right in double, so scores
  * (and therefore ranks) are bit-identical across engines.
  */
object SimOps {

  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val NQueries = 8

  private def qset(s: SparkSession, d: String): DataFrame = {
    graft.expressions.VectorExpressions.register(s)
    embeddings(s, d).where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        sqrt(expr("float_dot(embedding, embedding)")).as("q_nrm"))
  }

  private def corpusWithNorm(s: SparkSession, d: String): DataFrame = {
    graft.expressions.VectorExpressions.register(s)
    embeddings(s, d).select(col("vec_id"), col("embedding"),
      sqrt(expr("float_dot(embedding, embedding)")).as("c_nrm"))
  }

  /** Partition-local exact top-k per query under the final total order
    * (sim DESC, vec_id ASC), applied BEFORE the per-query rank window.
    *
    * Without this, the window shuffles every scored row to |Q| partitions
    * — invisible at 8 queries, a straggler factory for a real query
    * batch. With it, each input partition forwards at most |Q|·k rows
    * (a bounded in-memory selection, no sort of the partition), so the
    * final window sees ≤ |partitions|·k rows per query no matter how big
    * the corpus is. Lossless: a row outside its partition's top-k can
    * never be in the global top-k under the same total order.
    * Memory bound per partition: |Q|·k entries — fine while the query
    * set is broadcast-sized (the same assumption the join already makes). */
  private def partitionTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // rank order: better = higher sim, ties to the smaller vec_id
    val rankOrd: Ordering[(Double, Long)] =
      Ordering.by { case (sim, id) => (-sim, id) }
    scored.select(col("q_id"), col("vec_id"), col("sim"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val best = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.TreeSet[(Double, Long)]]
        it.foreach { case (q, v, s) =>
          val set = best.getOrElseUpdate(q,
            scala.collection.mutable.TreeSet.empty[(Double, Long)](rankOrd))
          set.add((s, v))
          if (set.size > k) set.remove(set.last)
        }
        best.iterator.flatMap { case (q, set) =>
          set.iterator.map { case (s, v) => (q, v, s) }
        }
      }
      .toDF("q_id", "vec_id", "sim")
  }

  /** Shared tail: partial top-k, then the per-query rank over the bounded
    * survivor set. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    partitionTopK(scored, k)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  /** Brute-force exact cosine top-k per query vector. Norms precomputed
    * per side; dot via the codegen'd float_dot expression. */
  val bruteTopK: Q = (s, d) =>
    rankTopK(
      corpusWithNorm(s, d).join(broadcast(qset(s, d)), col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm"))),
      K)

  /** Sign-bit bucket of an embedding: 4 axis-aligned hyperplanes
    * (dims 1, 17, 33, 49) → 16 buckets. A real deployment derives many
    * more planes; 4 keeps the oracle readable while exercising the
    * bucket-join shape. */
  private def bucketExpr(emb: String): org.apache.spark.sql.Column =
    concat(Seq(1, 17, 33, 49).map(i =>
      when(element_at(col(emb), i) >= 0, "1").otherwise("0")): _*)

  /** Single-table LSH ANN, kept as the pedagogical baseline: one 4-bit
    * sign bucket bounds candidates to ~1/16 of the corpus, which on the
    * harness's near-random embeddings yields recall@3 ≈ 0 — the measured
    * failure mode that motivates the multi-table default
    * ([[lshMultiTopK]]). The registered `sim_lsh_topk` is the 8-table
    * form; this stays queryable as `sim_lsh_1table_topk`. */
  val lsh1TableTopK: Q = (s, d) => {
    val corpus = corpusWithNorm(s, d).withColumn("bucket", bucketExpr("embedding"))
    val q = qset(s, d).withColumn("q_bucket", bucketExpr("q_emb"))
    rankTopK(
      corpus.join(broadcast(q),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm"))),
      3)
  }

  /** Default table count for `sim_lsh_topk` — past the knee of the
    * measured recall curve (see [[tableBucketExpr]]) so the operator a
    * user reaches for first clears the 0.6 recall floor Bench asserts. */
  private[ops] val DefaultTables = 8

  /** Sign bits of table `t` out of `nTables`: 4 hyperplanes drawn from
    * the t-th stride of the 64 dims (dim = 64/nTables·t + 1 +
    * 16/nTables·j), disjoint across tables. Tables see DIFFERENT
    * projections, so a true neighbor split from its query by one table's
    * planes usually collides in another — the standard multi-table recall
    * repair for sign-LSH (a single 4-bit table scores recall ≈ 0 on
    * near-random embeddings; the Bench recall_at_3 field tracks both).
    *
    * Table-count trade-off, measured at sf0.1 (candidates as a fraction
    * of corpus×queries → recall@3): 4×4-bit 22%→0.54, 8×4-bit 40%→0.67,
    * 8×3-bit or 16×4-bit 65%→0.875. The harness embeddings are
    * near-RANDOM, the adversarial case where recall is provably bound by
    * the candidate fraction — more tables just converge on brute force.
    * 4 tables is the knee of candidates-per-recall; the REGISTERED
    * default is 8 because an ANN default below a 0.6 recall floor is not
    * usable, and on real (clustered) embedding corpora the same 8 tables
    * cost a far smaller candidate fraction than they do here. */
  private def tableBucketExpr(emb: String, t: Int, nTables: Int): org.apache.spark.sql.Column = {
    val stride = 64 / nTables
    concat((0 until 4).map(j =>
      when(element_at(col(emb), stride * t + 1 + (stride / 4) * j) >= 0, "1")
        .otherwise("0")): _*)
  }

  private def tableBuckets(emb: String, nTables: Int): org.apache.spark.sql.Column =
    array((0 until nTables).map(t => tableBucketExpr(emb, t, nTables)): _*)

  /** Multi-table sign-LSH ANN: a candidate is any corpus vector sharing a
    * bucket with the query in ANY of the `nTables` tables. Candidate
    * pairs are deduped BEFORE scoring (a pair colliding in 3 tables is
    * scored once), then joined back to the vectors — the pair set carries
    * only (q_id, vec_id), never duplicated embeddings, so the extra
    * recall costs one distinct + one corpus-keyed join, still bounded by
    * bucket sizes rather than |Q|·N. */
  def lshMultiTopK(nTables: Int): Q = (s, d) => {
    rankTopK(lshCandidatePairs(s, d, nTables)
        .join(corpusWithNorm(s, d), "vec_id").join(broadcast(qset(s, d)), "q_id")
        .withColumn("sim",
          expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm"))),
      3)
  }

  /** The deduped (q_id, vec_id) candidate set of the multi-table index —
    * exposed so Bench can report the candidate fraction next to recall. */
  private[graft] def lshCandidatePairs(s: SparkSession, d: String,
      nTables: Int): DataFrame = {
    val c = corpusWithNorm(s, d).select(col("vec_id"),
      posexplode(tableBuckets("embedding", nTables)).as(Seq("t", "bucket")))
    val qb = qset(s, d).select(col("q_id"),
      posexplode(tableBuckets("q_emb", nTables)).as(Seq("qt", "q_bucket")))
    c.join(broadcast(qb),
        col("t") === col("qt") && col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
  }

  private val NCentroids = 16
  private val NProbe = 2

  /** IVF-style ANN: one-shot coarse quantization. Centroids are a fixed
    * deterministic sample (vec_id < 16 — a real deployment runs k-means;
    * the partitioning/search shape is identical). Every corpus vector is
    * assigned to its nearest centroid (the inverted list); a query scores
    * only the lists of its nprobe=2 nearest centroids. At 100 TB the
    * corpus scan is a bucketed/partitioned-by-centroid table, so a query
    * touches nprobe partitions instead of the full corpus. */
  val ivfTopK: Q = (s, d) =>
    rankTopK(
      ivfCandidates(s, d)
        .withColumn("sim",
          expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm"))),
      3)

  /** The scored-candidate frame of the IVF index (query × probed-list
    * members) — exposed so Bench can report the candidate fraction. */
  private[graft] def ivfCandidates(s: SparkSession, d: String): DataFrame = {
    graft.expressions.VectorExpressions.register(s)
    val cents = embeddings(s, d).where(col("vec_id") < NCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    def withCentDist(df: DataFrame, embCol: String): DataFrame =
      df.join(broadcast(cents), lit(true))
        .withColumn("c_dist",
          expr(s"float_dot($embCol, $embCol) + float_dot(c_emb, c_emb) - 2 * float_dot($embCol, c_emb)"))
    // Corpus assignment is rank-1-of-NCentroids: min_by aggregates the
    // nearest centroid with map-side partial aggregation (the ×NCentroids
    // candidate blowup collapses before the exchange), where a window
    // row_number would shuffle and sort every candidate row.
    val corpus = withCentDist(corpusWithNorm(s, d), "embedding")
      .groupBy("vec_id")
      .agg(min_by(
        struct(col("embedding"), col("c_nrm"), col("c_id")),
        struct(col("c_dist"), col("c_id"))).as("m"))
      .select(col("vec_id"), col("m.embedding").as("embedding"),
        col("m.c_nrm").as("c_nrm"), col("m.c_id").as("list_id"))
    // Queries probe nprobe lists — rank-n needs the window, but only over
    // |Q|·NCentroids rows (the broadcast-small side).
    val wq = Window.partitionBy("q_id").orderBy(col("c_dist").asc, col("c_id").asc)
    val q = withCentDist(qset(s, d), "q_emb")
      .withColumn("c_rank", row_number().over(wq))
      .where(col("c_rank") <= NProbe)
      .withColumn("probe_list", col("c_id"))
      .drop("c_id", "c_emb", "c_dist", "c_rank")
    corpus.join(broadcast(q),
      col("list_id") === col("probe_list") && col("vec_id") =!= col("q_id"))
  }

  val queries: Map[String, Q] = Map(
    "sim_brute_topk" -> bruteTopK,
    "sim_lsh_topk" -> lshMultiTopK(DefaultTables), // the usable default
    "sim_lsh_1table_topk" -> lsh1TableTopK,
    "sim_lsh_multi_topk" -> lshMultiTopK(4), // the candidates-per-recall knee
    "sim_ivf_topk" -> ivfTopK,
  )

  private def dot(a: String, b: String) =
    s"list_sum(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def cos(a: String, b: String) =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  private val BucketSql = (e: String) =>
    s"""(CASE WHEN $e[1] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN $e[17] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN $e[33] >= 0 THEN '1' ELSE '0' END ||
         CASE WHEN $e[49] >= 0 THEN '1' ELSE '0' END)"""

  private def tableBucketSql(e: String, t: Int, nTables: Int): String = {
    val stride = 64 / nTables
    (0 until 4).map(j =>
      s"CASE WHEN $e[${stride * t + 1 + (stride / 4) * j}] >= 0 THEN '1' ELSE '0' END")
      .mkString("(", " || ", ")")
  }

  private def multiTableSql(nTables: Int): String = (0 until nTables).map(t =>
    s"SELECT vec_id, $t AS t, ${tableBucketSql("embedding", t, nTables)} AS bucket FROM embeddings")
    .mkString(" UNION ALL ")

  private def multiTableOracle(nTables: Int): String =
    s"""WITH ct AS (${multiTableSql(nTables)}),
        qt AS (SELECT vec_id AS q_id, t, bucket FROM ct WHERE vec_id < $NQueries),
        pairs AS (SELECT DISTINCT q.q_id, c.vec_id
                  FROM ct c JOIN qt q ON c.t = q.t AND c.bucket = q.bucket
                  WHERE c.vec_id <> q.q_id),
        scored AS (SELECT p.q_id, p.vec_id,
                     ${cos("qe.embedding", "ce.embedding")} AS sim
                   FROM pairs p
                   JOIN embeddings ce ON ce.vec_id = p.vec_id
                   JOIN embeddings qe ON qe.vec_id = p.q_id),
        ranked AS (SELECT q_id, vec_id,
                     row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
                   FROM scored)
        SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id
        FROM ranked WHERE rank <= 3 ORDER BY q_id, rank"""

  val oracles: Map[String, String] = Map(
    "sim_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NQueries),
          scored AS (SELECT q.q_id, e.vec_id,
                       ${cos("q.q_emb", "e.embedding")} AS sim
                     FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
          ranked AS (SELECT q_id, vec_id,
                       row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id
          FROM ranked WHERE rank <= $K ORDER BY q_id, rank""",
    "sim_lsh_topk" -> multiTableOracle(DefaultTables),
    "sim_lsh_1table_topk" ->
      s"""WITH c AS (SELECT vec_id, embedding, ${BucketSql("embedding")} AS bucket FROM embeddings),
          q AS (SELECT vec_id AS q_id, embedding AS q_emb, ${BucketSql("embedding")} AS q_bucket
                FROM embeddings WHERE vec_id < $NQueries),
          scored AS (SELECT q.q_id, c.vec_id,
                       ${cos("q.q_emb", "c.embedding")} AS sim
                     FROM c JOIN q ON c.bucket = q.q_bucket AND c.vec_id <> q.q_id),
          ranked AS (SELECT q_id, vec_id,
                       row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id
          FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""",
    "sim_lsh_multi_topk" -> multiTableOracle(4),
    "sim_ivf_topk" ->
      s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < $NCentroids),
          corpus_d AS (SELECT e.vec_id, e.embedding, c.c_id,
                         ${dot("e.embedding", "e.embedding")} + ${dot("c.c_emb", "c.c_emb")}
                           - 2 * ${dot("e.embedding", "c.c_emb")} AS c_dist
                       FROM embeddings e CROSS JOIN cents c),
          corpus AS (SELECT vec_id, embedding, c_id AS list_id FROM
                       (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_dist, c_id) rn
                        FROM corpus_d) t WHERE rn = 1),
          q_d AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.c_id,
                    ${dot("e.embedding", "e.embedding")} + ${dot("c.c_emb", "c.c_emb")}
                      - 2 * ${dot("e.embedding", "c.c_emb")} AS c_dist
                  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < $NQueries),
          q AS (SELECT q_id, q_emb, c_id AS probe_list FROM
                  (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY c_dist, c_id) rn
                   FROM q_d) t WHERE rn <= $NProbe),
          scored AS (SELECT q.q_id, c.vec_id,
                       ${cos("q.q_emb", "c.embedding")} AS sim
                     FROM corpus c JOIN q ON c.list_id = q.probe_list AND c.vec_id <> q.q_id),
          ranked AS (SELECT q_id, vec_id,
                       row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id
          FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""",
  )
}
