package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components (DedupOps.connectedComponents):
  * correctness against a driver-side union-find, O(log n) round complexity
  * on a long path (where min-label propagation needs O(n) passes), and the
  * giant-component skew properties VERDICT r2 asked to pin.
  */
class CcSpec extends SparkSpec {

  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("doc_a", "doc_b")

  private def labelsOf(ps: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val (df, rounds) = graft.ops.DedupOps.connectedComponents(pairsDf(ps))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  /** Reference union-find on the driver. */
  private def unionFind(ps: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    ps.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("cc matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val ps = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val (got, _) = labelsOf(ps)
    assert(got == unionFind(ps))
  }

  test("cc on a 128-node path converges in O(log n) rounds, not O(n)") {
    val ps = (0L until 127L).map(i => (i, i + 1))
    val (got, rounds) = labelsOf(ps)
    assert(got.size == 128 && got.values.forall(_ == 0L), got.toSeq.sorted.take(5))
    // min-label propagation would need ~127 passes to reach the far end;
    // star rounds square the pointer depth each alternation
    assert(rounds <= 12, s"expected O(log n) rounds, got $rounds")
  }

  test("giant star component: fast convergence, no hub key in small-star, partial min in the plan") {
    val n = 10000L
    val ps = (1L until n).map(i => (0L, i)) // one 10^4-node star rooted at 0
    val (labels, rounds) = graft.ops.DedupOps.connectedComponents(pairsDf(ps))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 0L))
    assert(rounds <= 3, s"a star is already converged; got $rounds rounds")

    // skew pin 1: the canonical edge list keys small-star by the LARGER
    // endpoint, so the hub (root 0) is never a grouping key — every
    // small-star group on this component has exactly one row.
    val canonical = pairsDf(ps).select(col("doc_b").as("u"), col("doc_a").as("v"))
    val maxGroup = canonical.groupBy("u").count().agg(max("count")).head().getLong(0)
    assert(maxGroup == 1L, s"hub leaked into the small-star key space: $maxGroup")

    // skew pin 2: large-star's per-node min is a PARTIAL aggregate — the
    // hub's 10^4 symmetric edges combine map-side, so the u-keyed
    // exchange carries at most one row per key per input partition, never
    // the hub's full adjacency as one group.
    val sym = canonical.unionByName(canonical.select(col("v").as("u"), col("u").as("v")))
    val minAgg = sym.groupBy("u").agg(min("v").as("mv"))
    minAgg.collect()
    val plan = minAgg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), plan)
  }
}
