package graft

import scala.concurrent.{Await, ExecutionContext, Future, blocking}
import scala.concurrent.duration.Duration
import scala.util.Try

/** Concurrent INDEPENDENT Spark actions off one driver.
  *
  * Two invariants every call site needs and none should re-implement:
  *
  *  - '''`blocking` marker.''' The future bodies block on Spark job
  *    completion. `ExecutionContext.global` is a CPU-sized fork-join
  *    pool; without the marker a fan-out wider than the core count
  *    (a 100-table CDC capture, a purge across many data dirs) starves
  *    the pool and silently serializes — the exact idle-driver problem
  *    the concurrency exists to remove. `blocking {}` lets the pool
  *    spawn compensatory threads, so width is bounded by the work, not
  *    the host's core count.
  *
  *  - '''Await ALL, then rethrow the FIRST failure.''' Rethrowing on
  *    the first failed future while siblings are still running returns
  *    control (e.g. to the streaming engine, which may RETRY the
  *    micro-batch) with stray writers still committing — two writers
  *    race on one table and the single-writer invariant (A17) breaks:
  *    the retry's `stageCommit` deletes "debris" files the stray
  *    in-flight merge is actively producing. Joining every future
  *    before propagating means no action is in flight when the caller
  *    resumes, failed or not.
  */
object Par {

  /** A future for one blocking Spark action on the global pool. */
  def future[T](body: => T): Future[T] =
    Future(blocking(body))(ExecutionContext.global)

  /** Join EVERY future (none left in flight), then rethrow the first
    * failure in argument order. Returns the results in order.
    */
  def awaitAll[T](futures: Seq[Future[T]]): Seq[T] = {
    // Try-join EVERY future first; only then surface results — the
    // first .get on a Failure rethrows it in argument order.
    val joined = futures.map(f => Try(Await.result(f, Duration.Inf)))
    joined.map(_.get)
  }

  /** Await a single future (symmetry helper for mixed call sites). */
  def await[T](f: Future[T]): T = Await.result(f, Duration.Inf)

  /** Run the thunks as concurrent blocking Spark actions; join all,
    * rethrow the first failure, return results in order.
    */
  def run[T](thunks: Seq[() => T]): Seq[T] =
    awaitAll(thunks.map(t => future(t())))
}
