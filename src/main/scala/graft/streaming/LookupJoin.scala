package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/** Processing-time lookup join — Flink's
  * `JOIN dim FOR SYSTEM_TIME AS OF stream.proctime`
  * (reference: 03-flink-cdc-jdbc.json:18, semantics walkthrough
  * README.md:224-301).
  *
  * Spark's stream-static join re-executes the static side's plan every
  * micro-batch, so an UNCACHED dimension is re-read per trigger — i.e.
  * each event joins the dimension "as of (roughly) now", which is exactly
  * Flink's processing-time lookup semantics, including the documented
  * race: an event processed before the dimension row it depends on lands
  * in the store simply doesn't match (inner) or matches null (left) —
  * and a later CDC update re-emits through the upsert sink
  * (README.md:268-301). We preserve that as a semantic, not a bug.
  */
object LookupJoin {

  /** `stream` may be streaming or batch; `dim` must be a batch DataFrame
    * and must NOT be cached if per-batch re-read semantics are wanted. */
  def processingTime(stream: DataFrame, dim: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    stream.join(dim, cond, joinType)
}
