// Hosted under org.apache.spark.sql.* because ExpectsInputTypes /
// AbstractDataType / ExpressionUtils are private[sql] in Spark 4 —
// the standard technique for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native average-hash (aHash) of a binary payload — the perceptual
  * first pass of image dedup (SURVEY.md §2.6/35f) in ONE row-local
  * loop: 64 evenly-spaced byte samples (the stand-in for an 8×8
  * downscaled luma grid; a real pipeline swaps sampling for
  * decode+resize and keeps everything after), each thresholded
  * against the integer mean of the samples (`v·64 > Σv` — no
  * division), packed as a 64-char bit string.
  *
  * The composed formulation — `transform(sequence(0,63), …)` with a
  * per-sample `conv(hex(substring(…)),16,10)` plus an `aggregate`
  * fold — is a CodegenFallback higher-order-function stack that
  * round-trips every sampled byte through a hex STRING; measured 2.3 s
  * for what is arithmetic on 64 bytes/row. This expression bit-matches
  * it (reference: shmr has no media ops; the aHash design point is the
  * classic average-hash) and runs inside whole-stage codegen.
  *
  * Returns null on empty payloads (no pixels, no hash) — callers
  * filter `octet_length > 0` first, same gate as the oracle.
  */
@ExpressionDescription(
  usage = "_FUNC_(media) - 64-bit average-hash bit string of a binary payload."
)
case class AHash64(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ahash64"

  override protected def nullSafeEval(input: Any): Any =
    AHash64.compute(input.asInstanceOf[Array[Byte]])

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = s"org.apache.spark.sql.graft.AHash64.compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHash64 {

  /** Static entry shared by interpreted eval and generated code.
    * Null on empty input (matches the octet_length>0 caller gate). */
  def compute(bytes: Array[Byte]): UTF8String = {
    val n = bytes.length
    if (n == 0) return null
    // sample i ← byte[(i*n) div 64], 0-based — identical to the SQL
    // formulation substring(__m, (i*__n) DIV 64 + 1, 1)
    val v = new Array[Int](64)
    var t = 0L
    var i = 0
    while (i < 64) {
      v(i) = bytes(((i.toLong * n) / 64).toInt) & 0xff
      t += v(i)
      i += 1
    }
    val out = new Array[Byte](64)
    i = 0
    while (i < 64) {
      out(i) = if (v(i).toLong * 64 > t) '1' else '0'
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Column facade + SQL registration for the media expressions. */
object GraftMediaFunctions {
  import org.apache.spark.sql.SparkSessionExtensions

  def aHash64(media: Column): Column =
    ExpressionUtils.column(AHash64(ExpressionUtils.expression(media)))

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("graft_ahash64"),
      FunctionRegistryBase.expressionInfo[AHash64]("graft_ahash64", None),
      (children: Seq[Expression]) => AHash64(children(0))))
}
