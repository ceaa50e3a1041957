package graft

import org.apache.spark.sql.functions._

/** Pins for the z-order layout family: the unrolled interleave SQL must
  * equal an independent bit-twiddling reference on the full 8-bit
  * lattice, the layout must actually deliver multi-dimensional pruning
  * (the eval row's files_z <= files_time, strictly on some box), and the
  * assignment must be partitioning-invariant. */
class ZorderSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Reference Morton code: textbook bit loop, no shared code with the
    * SQL generator. */
  private def mortonRef(tb: Long, ub: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 8) {
      z |= ((tb >> i) & 1L) << (2 * i + 1)
      z |= ((ub >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("unrolled interleave SQL == independent bit-twiddling reference over the whole lattice") {
    import spark.implicits._
    val grid = (for (tb <- 0L until 256L by 7L; ub <- 0L until 256L by 5L)
      yield (tb, ub)) ++ Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L))
    val got = grid.toDF("tb", "ub")
      .withColumn("z", expr(graft.ops.PipelineOps.zExprSql("tb", "ub", "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (tb, ub) =>
      assert(got((tb, ub)) == mortonRef(tb, ub),
        s"z($tb, $ub) = ${got((tb, ub))} != ref ${mortonRef(tb, ub)}")
    }
  }

  test("the pruning audit reads a real benefit: files_z <= files_time, strictly somewhere") {
    val rows = ops.PipelineOps.queries("events_zorder_prune_eval")(spark, d)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, fz, ft) =>
      assert(n > 0, "every audit box must hit rows on the harness corpus")
      assert(fz <= ft, s"z-order touched MORE files than the time sort: $rows")
    }
    assert(rows.exists { case (_, fz, ft) => fz < ft },
      s"no box showed a strict improvement — the layout buys nothing: $rows")
  }

  test("layout is partitioning-invariant (content-derived, no order dependence)") {
    val a = ops.PipelineOps.queries("events_zorder_layout")(spark, d).collect().toSeq
    val b = ops.PipelineOps.queries("events_zorder_layout")(spark, d)
      .repartition(7).orderBy("file_id").collect().toSeq
    assert(a == b)
  }
}
