package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded MinHash signature of a shingle set in ONE compiled pass:
  * md5 each element once, split the 32-hex-char digest into 4 disjoint
  * 8-char band slices, and keep the per-band minimum. Returns
  * `array<string>` of the 4 band minima (so `posexplode` yields the
  * (band, minhash) rows LSH banding buckets on).
  *
  * This replaces an `aggregate(transform(sset, md5), struct, 4×least)`
  * higher-order fold that Catalyst evaluates INTERPRETED — per-element
  * lambda dispatch, a 4-field struct rebuilt per step, and hex-string
  * substring/compare allocations. Measured at sf0.1 the fold made
  * `llm_dedup_minhash` the joint-slowest bench query (~9 s cold). Here
  * the whole signature is one JIT-compiled loop with FOUR LONG
  * ACCUMULATORS and zero per-element allocation beyond the digest:
  * lowercase-hex is order-isomorphic to the unsigned bytes it encodes,
  * so "min of the 8-hex-char slice" == "min of the 4-byte big-endian
  * unsigned int" and the comparison never needs the string at all; the
  * 4 hex strings are materialized once at the end. The MessageDigest is
  * thread-local (DigestUtils.md5Hex per element would do a provider
  * lookup per shingle).
  *
  * Bit-identical to the HOF fold by construction (BandedMinHashSpec
  * asserts equality against the fold twin on the fixture corpus),
  * including the empty-set case: no elements → the fold's "zzzzzzzz"
  * sentinels, which sort after every hex slice.
  */
case class BandedMinHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"banded_minhash expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "banded_minhash"

  override protected def nullSafeEval(v: Any): Any =
    BandedMinHash.compute(v.asInstanceOf[ArrayData])

  // The hot loop lives in a static method both eval modes share; the
  // generated code is a single static call, so the operator stays
  // inside WholeStageCodegen with a JIT-compiled body (the same shape
  // Spark's own StaticInvoke-backed expressions use).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BandedMinHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandedMinHash {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Four band minima over md5 slices, as unsigned-int comparisons.
    * Null elements are skipped, matching `least(acc, md5(null)) = acc`
    * in the fold twin. */
  def compute(arr: ArrayData): ArrayData = {
    val md = digests.get()
    var m0 = Long.MaxValue; var m1 = Long.MaxValue
    var m2 = Long.MaxValue; var m3 = Long.MaxValue
    var seen = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val s0 = slice(d, 0); val s1 = slice(d, 4)
        val s2 = slice(d, 8); val s3 = slice(d, 12)
        if (s0 < m0) m0 = s0
        if (s1 < m1) m1 = s1
        if (s2 < m2) m2 = s2
        if (s3 < m3) m3 = s3
      }
      i += 1
    }
    val out: Array[AnyRef] =
      if (!seen) Array.fill[AnyRef](4)(UTF8String.fromString("zzzzzzzz"))
      else Array(hex8(m0), hex8(m1), hex8(m2), hex8(m3))
    new GenericArrayData(out)
  }

  private def slice(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)

  private def hex8(v: Long): UTF8String = {
    val cs = new Array[Byte](8)
    var i = 7
    var x = v
    while (i >= 0) {
      val nib = (x & 0xf).toInt
      cs(i) = (if (nib < 10) '0' + nib else 'a' + nib - 10).toByte
      x >>>= 4
      i -= 1
    }
    UTF8String.fromBytes(cs)
  }

  def bandedMinhash(sset: Column): Column =
    GraftBridge.column(BandedMinHash(GraftBridge.expression(sset)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("banded_minhash"),
      new ExpressionInfo(classOf[BandedMinHash].getName, "banded_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"banded_minhash expects 1 argument, got ${children.length}")
        BandedMinHash(children.head)
      })
  }
}
