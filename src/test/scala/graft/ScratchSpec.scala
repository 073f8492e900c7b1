package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Scratch-space contract (VERDICT r12 "what's wrong" #1): every
  * temp dir the engine mints nests under ONE per-process root that a
  * shutdown hook deletes — a process leaves /tmp as it found it.
  */
class ScratchSpec extends AnyFunSuite {

  test("dir() nests under the per-process root and keeps its prefix") {
    val before = Scratch.count()
    val d = Scratch.dir("graft-spec-probe-")
    assert(Files.exists(d))
    assert(d.getParent == Scratch.root)
    assert(d.getFileName.toString.startsWith("graft-spec-probe-"))
    assert(Scratch.count() == before + 1)
  }

  test("root lives directly in the system temp dir, not nested scratch") {
    val sysTmp = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir")).toAbsolutePath.normalize
    assert(Scratch.root.toAbsolutePath.normalize.getParent == sysTmp)
    assert(Scratch.root.getFileName.toString.startsWith("graft-run-"))
  }

  test("bytes() sums file sizes under the root") {
    val d = Scratch.dir("graft-spec-bytes-")
    val before = Scratch.bytes()
    Files.write(d.resolve("probe.bin"), Array.fill[Byte](4096)(1))
    assert(Scratch.bytes() >= before + 4096)
  }
}
