package graft.ops

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Overlap INDEPENDENT Spark action chains inside one operator (guide
  * §2.6 "Overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once in one application — actions are only
  * sequential because driver code calls them sequentially. Several
  * registry operators materialize two or three independent inputs
  * (e.g. the three near-dup pair generators of dedup_method_agreement,
  * or keep_central's CC and PageRank chains over one checkpointed pair
  * frame) and each chain's stage tail leaves most of the box idle;
  * submitting them from a bounded pool lets the next chain's tasks
  * back-fill the idle cores. FIFO scheduling (the default) gives
  * exactly the back-fill behaviour; results are the same DataFrames in
  * the same order, so determinism is untouched — only the wall clock
  * moves.
  *
  * The pool is per-call and sized to the thunk count (operators pass
  * 2-4 chains, bounded by their own structure — never data-sized).
  * Exceptions from any chain rethrow on the caller thread, unwrapped,
  * so failure behaviour matches the sequential form. */
private[graft] object Par {
  def run[A](thunks: (() => A)*): Seq[A] =
    if (thunks.sizeIs <= 1) thunks.map(_()).toSeq
    else {
      val pool = Executors.newFixedThreadPool(thunks.size)
      try {
        import scala.jdk.CollectionConverters._
        val futures = pool.invokeAll(
          thunks.map(t => new Callable[A] { def call(): A = t() }).asJava)
        futures.asScala.map { f =>
          try f.get()
          catch { case e: ExecutionException => throw e.getCause }
        }.toSeq
      } finally pool.shutdown()
    }
}
