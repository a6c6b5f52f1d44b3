package graft.util

/** Run INDEPENDENT Spark actions concurrently from the driver — the
  * overlap-independent-jobs pattern: Spark's scheduler happily runs
  * several jobs at once inside one application, and actions are only
  * sequential because driver code calls them sequentially. A store
  * build that writes three independent tables, or a query that runs
  * two independent retrievers, spends most of its wall clock waiting
  * on job tails; submitting them from separate threads lets the next
  * job's tasks back-fill executors freed by the current job's tail.
  * FIFO scheduling (the default) gives exactly the back-fill behavior
  * wanted — at ANY core count, which is why this is a plan-shape win
  * and not a local[32] tune: on a small executor the jobs simply
  * interleave.
  *
  * Semantics: runs every task, waits for ALL of them (even when one
  * fails — a half-finished sibling write must not be abandoned
  * mid-flight), then rethrows the first failure. The calling thread
  * runs the first task itself, so a 1-task call degenerates to a plain
  * invocation. Tasks MUST be independent: no task may read state
  * another writes (the callers here write disjoint paths/tables).
  * Spark job groups/descriptions are InheritableThreadLocals, so
  * spawned tasks keep the caller's labels. */
object Par {

  def run(tasks: (() => Unit)*): Unit = {
    if (tasks.isEmpty) return
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def guarded(t: () => Unit): Unit =
      try t() catch { case e: Throwable => failures.add(e) }
    val threads = tasks.tail.map { t =>
      val th = new Thread(() => guarded(t), "graft-par")
      th.setDaemon(true)
      th.start()
      th
    }
    guarded(tasks.head)
    threads.foreach(_.join())
    if (!failures.isEmpty) {
      // rethrow the first failure with the rest attached: concurrent
      // sibling writes can fail together, and a silently-dropped cause
      // is exactly what an incident debugger needs to see
      val first = failures.poll()
      var next = failures.poll()
      while (next != null) { first.addSuppressed(next); next = failures.poll() }
      throw first
    }
  }
}
