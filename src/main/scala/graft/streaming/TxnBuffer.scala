package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.expressions.RowCodec

/** Transaction-buffered emit — the reference's "rich transaction
  * metadata" consistency option (README.md:486-489): beyond the per-event
  * `txId`, Debezium's transaction topic carries an event COUNT per
  * transaction, "that we can use to emit changes only when all the events
  * in a transaction have been read". Downstream then never observes a
  * half-transaction, the consistency the reference otherwise recreates
  * with temporal joins.
  *
  * Spark-first shape (mirrors [[AsOfJoin]]): data events and boundary
  * events are tagged and unioned, grouped by transaction id — ONE shuffle
  * — and a `flatMapGroupsWithState` holds per-txn state: buffered row
  * payloads (UnsafeRow bytes, schema-generic) + the expected count once
  * the boundary arrived. A transaction emits atomically (all rows in one
  * micro-batch output) when buffered == expected; state is removed on
  * emit, so steady-state memory is only the in-flight transactions.
  * An optional processing-time timeout force-flushes transactions whose
  * boundary never arrives (connector restart loses the txn topic tail),
  * marked `complete = false` so the consumer can quarantine them.
  *
  * Works in batch too (each group sees its complete input): complete
  * transactions emit, incomplete ones stay buffered (empty output) —
  * which is exactly the DuckDB-checkable form (`txn_buffered_emit`).
  */
object TxnBuffer {

  /** One tagged input: a data event (payload = encoded row) or a
    * boundary event (expected = the txn's event count, payload null). */
  case class TxnEvent(txId: Long, isBoundary: Boolean, expected: Int,
      payload: Array[Byte])

  /** `seq` preserves arrival order within the transaction. */
  case class TxnOut(txId: Long, seq: Int, payload: Array[Byte], complete: Boolean)

  case class TxnState(buffered: List[Array[Byte]], expected: Option[Int])

  private def updateFn(flushIncompleteAfterMs: Long, timeoutEnabled: Boolean)(txId: Long,
      rows: Iterator[TxnEvent], state: GroupState[TxnState]): Iterator[TxnOut] = {
    if (state.hasTimedOut) {
      // boundary never arrived: flush what we have, flagged incomplete
      val st = state.get
      state.remove()
      return st.buffered.reverse.iterator.zipWithIndex.map { case (p, i) =>
        TxnOut(txId, i, p, complete = false)
      }
    }
    val prev = state.getOption.getOrElse(TxnState(Nil, None))
    var buffered = prev.buffered // reversed arrival order (prepend = O(1))
    var expected = prev.expected
    rows.foreach { e =>
      if (e.isBoundary) expected = Some(e.expected)
      else buffered ::= e.payload
    }
    if (expected.exists(_ <= buffered.size)) {
      state.remove()
      buffered.reverse.iterator.zipWithIndex.map { case (p, i) =>
        TxnOut(txId, i, p, complete = true)
      }
    } else if (buffered.isEmpty && expected.isEmpty) {
      state.remove(); Iterator.empty
    } else {
      state.update(TxnState(buffered, expected))
      // Only arm the timeout when buffer() actually selected
      // ProcessingTimeTimeout (streaming); setTimeoutDuration under
      // NoTimeout (the batch form) throws as soon as a transaction is
      // left incomplete.
      if (timeoutEnabled)
        state.setTimeoutDuration(flushIncompleteAfterMs)
      Iterator.empty
    }
  }

  /** Buffer a tagged event stream per transaction.
    * @param flushIncompleteAfterMs > 0 enables the processing-time
    *        force-flush of boundary-less transactions (streaming only).
    *        Enable it in at-least-once deployments: a REPLAYED boundary
    *        for a transaction that already flushed looks like an early
    *        boundary (expected count set, nothing buffered) and is
    *        otherwise held until its events "arrive" — the timeout is
    *        what clears such ghosts (they flush empty). */
  def buffer(events: Dataset[TxnEvent],
      flushIncompleteAfterMs: Long = 0L): Dataset[TxnOut] = {
    import events.sparkSession.implicits._
    val timeoutEnabled = events.isStreaming && flushIncompleteAfterMs > 0
    val timeout =
      if (timeoutEnabled) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.txId)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        updateFn(flushIncompleteAfterMs, timeoutEnabled))
  }

  /** Tag a decoded changelog (must carry `txIdCol`) as data events; the
    * full row rides as UnsafeRow bytes. */
  def tagData(df: DataFrame, txIdCol: String): Dataset[TxnEvent] = {
    import df.sparkSession.implicits._
    RowCodec.register(df.sparkSession)
    df.select(col(txIdCol).cast("long").as("txId"),
        lit(false).as("isBoundary"), lit(0).as("expected"),
        call_function("struct_to_binary",
          struct(df.columns.map(col): _*)).as("payload"))
      .as[TxnEvent]
  }

  /** Tag a transaction-boundary feed (Debezium transaction-topic END
    * events: txn id + event count). */
  def tagBoundaries(df: DataFrame, txIdCol: String,
      countCol: String): Dataset[TxnEvent] = {
    import df.sparkSession.implicits._
    df.select(col(txIdCol).cast("long").as("txId"),
        lit(true).as("isBoundary"), col(countCol).cast("int").as("expected"),
        lit(null).cast("binary").as("payload"))
      .as[TxnEvent]
  }

  /** Buffer + decode back to columns (payload schema = `rowSchema`),
    * keeping `_txn_seq`/`_complete`. */
  def bufferWide(data: DataFrame, txIdCol: String, boundaries: DataFrame,
      bTxIdCol: String, bCountCol: String,
      flushIncompleteAfterMs: Long = 0L): DataFrame = {
    RowCodec.register(data.sparkSession)
    val tagged = tagData(data, txIdCol)
      .unionByName(tagBoundaries(boundaries, bTxIdCol, bCountCol))
    buffer(tagged, flushIncompleteAfterMs)
      .select(
        call_function("binary_to_struct",
          col("payload"), lit(data.schema.toDDL)).as("_r"),
        col("seq").as("_txn_seq"), col("complete").as("_complete"))
      .select(data.columns.map(c => col(s"_r.$c")) :+
        col("_txn_seq") :+ col("_complete"): _*)
  }
}
