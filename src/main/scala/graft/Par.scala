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

  /** Join the futures, then rethrow the first failure in argument
    * order. Returns the results in order.
    *
    * With the default `timeout = Inf` this joins EVERY future — none
    * left in flight — which is what the pipeline fan-outs need (their
    * merges must never be abandoned mid commit). With a FINITE bound
    * the contract is weaker (ADVICE r16): on expiry a
    * TimeoutException is rethrown but the timed-out thunks are
    * ABANDONED, not interrupted — they keep running on the pool and
    * may keep mutating shared state (the OCC committers keep
    * committing) after this call has thrown. Bounded callers must
    * treat post-throw store state as still in motion. Demos that
    * deliberately provoke contention (the OCC committers) accept that
    * in exchange for failing one query after N minutes instead of
    * hanging the whole bench / correctness run (ADVICE r15). The
    * deadline is shared across the sequence: each Await gets the
    * REMAINING time, so the bound is on the fan-out, not per-future.
    */
  def awaitAll[T](futures: Seq[Future[T]],
                  timeout: Duration = Duration.Inf): Seq[T] = {
    // Try-join EVERY future first; only then surface results — the
    // first .get on a Failure rethrows it in argument order.
    val deadline = timeout match {
      case f: scala.concurrent.duration.FiniteDuration => Some(f.fromNow)
      case _ => None
    }
    val joined = futures.map { f =>
      // Clamp at Zero once the deadline passed: a negative Await
      // duration is rejected; Zero polls and times out immediately.
      val left = deadline.map(d => d.timeLeft max Duration.Zero)
      Try(Await.result(f, left.getOrElse(Duration.Inf)))
    }
    joined.map(_.get)
  }

  /** Await a single future (symmetry helper for mixed call sites). */
  def await[T](f: Future[T], timeout: Duration = Duration.Inf): T =
    Await.result(f, timeout)

  /** Run the thunks as concurrent blocking Spark actions; join all,
    * rethrow the first failure, return results in order.
    */
  def run[T](thunks: Seq[() => T],
             timeout: Duration = Duration.Inf): Seq[T] =
    awaitAll(thunks.map(t => future(t())), timeout)
}
