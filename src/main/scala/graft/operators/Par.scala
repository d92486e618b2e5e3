package graft.operators

/** Driver-side overlap of INDEPENDENT Spark actions (optimization
  * guide §2.6: Spark's scheduler happily runs several jobs at once
  * inside one application; actions are sequential only because driver
  * code calls them sequentially). Used where a composed operator
  * performs several writes/appends that share no data dependency and
  * target disjoint directories — e.g. [[graft.Pipeline.refreshCorpus]]'s
  * per-family index appends, or one index family's two bucketed
  * datasets. The later job's tasks back-fill executors freed by the
  * earlier job's stragglers, and at bench scale the many fixed
  * per-action floors (planning, codegen, commit) overlap instead of
  * summing.
  *
  * Semantics vs the sequential original: each task is the SAME
  * idempotent write it was, targeting its own directory; a failure in
  * one no longer prevents the others from completing, which is a state
  * the crash contract already covers (partial family appends re-run to
  * completion; retried appends leave exact-duplicate rows that probes
  * collapse). All tasks are awaited; the first failure is rethrown
  * after every task has settled (never a dangling in-flight write).
  *
  * USAGE CONTRACT — no shared un-materialized frame instances: two
  * tasks must not both consume the SAME lazily-derived DataFrame
  * object whose tree carries expressions with mutable evaluation
  * state (higher-order-function lambda variables, stateful custom
  * expressions). When the source is a local relation, each task's
  * plan optimization constant-folds those SHARED expression instances
  * on the driver concurrently (ConvertToLocalRelation), and the race
  * corrupts the folded rows — observed as garbage shingle hashes in
  * the containment index writer (r20). Either materialize the shared
  * frame first ([[Barriers.barrier]] — what the index writers do) or
  * have each task build its own tree from the raw input.
  */
object Par {

  /** Run `tasks` concurrently on a bounded pool, awaiting ALL of them;
    * rethrows the first failure (suppressing the rest). Empty and
    * single-task inputs run inline. `parallelism` bounds driver-side
    * concurrency — 3-4 in-flight jobs is enough to fill a stage tail
    * without starving any one job of executors (guide §2.6).
    */
  def run(parallelism: Int)(tasks: Seq[() => Unit]): Unit = {
    require(parallelism > 0, s"parallelism must be > 0, got $parallelism")
    if (tasks.size <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size))
    try {
      val futures = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      var failure: Throwable = null
      var interrupted = false
      def record(t: Throwable): Unit =
        if (failure == null) failure = t else failure.addSuppressed(t)
      futures.foreach { f =>
        var settled = false
        while (!settled) {
          try { f.get(); settled = true }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              record(if (e.getCause != null) e.getCause else e)
              settled = true
            case e: java.util.concurrent.CancellationException =>
              record(e); settled = true
            case _: InterruptedException =>
              // the scaladoc's no-dangling-write promise: an interrupt
              // must NOT abandon in-flight writes on live pool threads
              // — remember it, keep awaiting, re-assert the flag after
              // every task has settled
              interrupted = true
          }
        }
      }
      if (interrupted) Thread.currentThread().interrupt()
      if (failure != null) throw failure
      if (interrupted) throw new InterruptedException(
        "Par.run interrupted (all tasks were awaited first)")
    } finally pool.shutdown()
  }
}
