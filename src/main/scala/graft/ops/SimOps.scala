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

  /** Brute-force exact cosine top-k per query vector. Norms precomputed
    * per side; dot via the codegen'd float_dot expression. */
  val bruteTopK: Q = (s, d) => {
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    corpusWithNorm(s, d).join(broadcast(qset(s, d)), col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  /** Sign-bit bucket of an embedding: 4 axis-aligned hyperplanes
    * (dims 1, 17, 33, 49) → 16 buckets. A real deployment derives many
    * more planes; 4 keeps the oracle readable while exercising the
    * bucket-join shape. */
  private def bucketExpr(emb: String): org.apache.spark.sql.Column =
    concat(Seq(1, 17, 33, 49).map(i =>
      when(element_at(col(emb), i) >= 0, "1").otherwise("0")): _*)

  /** LSH-bucketed ANN: candidates share the query's bucket; exact cosine
    * top-3 within the bucket. */
  val lshTopK: Q = (s, d) => {
    val corpus = corpusWithNorm(s, d).withColumn("bucket", bucketExpr("embedding"))
    val q = qset(s, d).withColumn("q_bucket", bucketExpr("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    corpus.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
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
  val ivfTopK: Q = (s, d) => {
    graft.expressions.VectorExpressions.register(s)
    val cents = embeddings(s, d).where(col("vec_id") < NCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    def nearestCentroids(df: DataFrame, idCol: String, embCol: String,
        n: Int, outCol: String): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(col("c_dist").asc, col("c_id").asc)
      df.join(broadcast(cents), lit(true))
        .withColumn("c_dist",
          expr(s"float_dot($embCol, $embCol) + float_dot(c_emb, c_emb) - 2 * float_dot($embCol, c_emb)"))
        .withColumn("c_rank", row_number().over(w))
        .where(col("c_rank") <= n)
        .withColumn(outCol, col("c_id"))
        .drop("c_id", "c_emb", "c_dist", "c_rank")
    }
    val corpus = nearestCentroids(
      corpusWithNorm(s, d), "vec_id", "embedding", 1, "list_id")
    val q = nearestCentroids(qset(s, d), "q_id", "q_emb", NProbe, "probe_list")
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    corpus.join(broadcast(q),
        col("list_id") === col("probe_list") && col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        expr("float_dot(q_emb, embedding)") / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "sim_brute_topk" -> bruteTopK,
    "sim_lsh_topk" -> lshTopK,
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
    "sim_lsh_topk" ->
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
