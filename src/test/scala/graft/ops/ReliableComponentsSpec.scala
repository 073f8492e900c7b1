package graft.ops

import graft.SparkTestBase

/** The cluster-durability path of connected components
  * ([[LlmOps.propagateComponents]] with `reliable = true`): reliable
  * `checkpoint()` into a checkpoint dir instead of executor-local
  * `localCheckpoint`. The algorithm must be bit-identical either way —
  * same labels, same round count — and the adversarial long-chain graph
  * must converge in O(log diameter) rounds on the reliable path too
  * (i.e. the checkpoint swap can't silently break path halving).
  */
class ReliableComponentsSpec extends SparkTestBase {
  import spark.implicits._

  // A pure 400-vertex path: the worst-case diameter-399 graph for label
  // propagation. Plain propagation would need ~399 rounds (over the 64
  // cap); path halving must land in ~log2(399) + a few ≈ 12.
  private val n = 400
  private def chainPairs =
    (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("v1", "v2")

  // Declared FIRST: the shared session has no checkpoint dir until the
  // match test below sets one, so the guard path is genuinely exercised
  // (the condition shields against another suite having set it).
  test("reliable mode fails fast when no checkpoint dir is set") {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalArgumentException](
        LlmOps.propagateComponents(chainPairs, reliable = true))
      assert(e.getMessage.contains("setCheckpointDir"))
    } else succeed
  }

  test("reliable checkpoint mode matches localCheckpoint labels and rounds") {
    val ckpt = graft.Scratch.dir("cc_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val (localLabels, localRounds) =
      LlmOps.propagateComponents(chainPairs, reliable = false)
    val (relLabels, relRounds) =
      LlmOps.propagateComponents(chainPairs, reliable = true)
    val l = localLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = relLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l === r, "reliable and local checkpoint modes must agree")
    assert(r.size === n)
    assert(r.values.toSet === Set(0L),
      s"chain must collapse to vertex 0, got reps ${r.values.toSet}")
    assert(relRounds === localRounds,
      s"round counts diverged: local=$localRounds reliable=$relRounds")
    assert(relRounds <= 14,
      s"path halving must converge a diameter-${n - 1} chain in " +
        s"O(log n) rounds, took $relRounds")
    // Reliable mode actually wrote checkpoint data (the durability the
    // mode exists for — not just a renamed localCheckpoint).
    def count(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles.map(count).sum else 1
    assert(count(new java.io.File(ckpt)) > 0, "no reliable checkpoint files")
  }

}
