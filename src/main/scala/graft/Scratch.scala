package graft

import java.nio.file.{Files, Path}

/** Per-process scratch-space root (VERDICT r12 "what's wrong" #1).
  *
  * Before round 13 every temp-dir-using call site minted its own
  * directory directly in `/tmp` and nothing ever deleted them: 12
  * rounds of bench/verify/test runs deposited 5,680 `graft-*` dirs
  * (3.7 GB), slowing temp-dir create/list, polluting the page cache
  * the cold-bench discipline assumes away, and destined to fill the
  * disk of any long-lived deployment.
  *
  * Now ALL scratch dirs (main sources and test suites alike) are
  * children of ONE `graft-run-*` root, registered for recursive
  * delete in a JVM shutdown hook — a process leaves `/tmp` exactly as
  * it found it. The original call-site prefixes are kept so dirs stay
  * identifiable while the process lives.
  *
  * `clear()` is NOT called between bench repeats by design: many
  * sites memoize their dir in a per-JVM `computeIfAbsent` cache
  * (staged change logs, the DrainHarness warehouse/checkpoint pairs)
  * and deleting under a live cache would poison later repeats. The
  * within-run accumulation is bounded (one dir per cache key + the
  * ephemeral per-invocation dirs of a single run) and the shutdown
  * hook removes all of it; [[Bench]] publishes `scratch_dirs` /
  * `scratch_mb` in its `noise` block so any future leak of this class
  * is self-identifying from the artifact alone.
  */
object Scratch {

  lazy val root: Path = {
    val r = Files.createTempDirectory("graft-run-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh scratch directory under the per-process root. Drop-in
    * replacement for `Files.createTempDirectory(prefix)`.
    */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Number of live scratch dirs under the root (bench forensics). */
  def count(): Long =
    if (!Files.exists(root)) 0L
    else { val s = Files.list(root); try s.count() finally s.close() }

  /** Total bytes under the root (bench forensics). */
  def bytes(): Long =
    if (!Files.exists(root)) 0L
    else {
      val s = Files.walk(root)
      try s.filter(Files.isRegularFile(_))
        .mapToLong(p => try Files.size(p) catch { case _: Exception => 0L })
        .sum()
      finally s.close()
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { Files.deleteIfExists(q); () })
      catch { case _: Exception => () } // best-effort at JVM exit
      finally s.close()
    }
}
