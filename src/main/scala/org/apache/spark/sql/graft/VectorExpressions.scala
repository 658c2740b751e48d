// Hosted under org.apache.spark.sql.* because ExpectsInputTypes /
// AbstractDataType / ExpressionUtils are private[sql] in Spark 4 —
// the standard technique for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot paths (SURVEY.md
  * §2.4). The built-in route — `aggregate(zip_with(...))` — is a
  * higher-order function: interpreted eval, a lambda frame per
  * element, and an allocated zipped array per row. These expressions
  * generate a tight primitive loop inside whole-stage codegen
  * instead, which is what a 100 TB scan needs.
  *
  * Semantics match the HOF formulations exactly (same fold order,
  * same overflow behavior), so they can swap in under the oracle-
  * gated queries without changing a single output bit.
  */

/** Exact integer dot product of two array<long> columns (quantized
  * vectors — see graft.similarity.Similarity.quantize). */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - integer dot product of two BIGINT arrays."
)
case class DotProductLong(left: Expression, right: Expression, failOnError: Boolean = false)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    if (failOnError) {
      // ANSI arithmetic: overflow throws, matching Multiply/Add in ANSI mode
      while (i < n) {
        sum = Math.addExact(sum, Math.multiplyExact(x.getLong(i), y.getLong(i)))
        i += 1
      }
    } else {
      while (i < n) {
        sum += x.getLong(i) * y.getLong(i)
        i += 1
      }
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val step =
        if (failOnError)
          s"$sum = java.lang.Math.addExact($sum, java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else
          s"$sum += $a.getLong($i) * $b.getLong($i);"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $step
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level and SQL-registration facade for the native vector
  * expressions (the only public bridge graft-side code needs). */
object GraftFunctions {
  def dotLong(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotFloat(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductFloat(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** ADC fold: Σ_i table[i][codes[i]] (see PqExpressions.scala). */
  def pqLookupSum(codes: Column, table: Column): Column =
    ExpressionUtils.column(PqLookupSum(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(table)))

  /** SDC fold: Σ_i sdc[i][ca[i]][cb[i]] (see PqExpressions.scala). */
  def pqSdcSum(ca: Column, cb: Column, sdc: Column): Column =
    ExpressionUtils.column(PqSdcSum(ExpressionUtils.expression(ca),
      ExpressionUtils.expression(cb), ExpressionUtils.expression(sdc)))

  /** Per-query ADC lookup table build (see PqExpressions.scala). */
  def pqLut(e: Column, cbs: Column): Column =
    ExpressionUtils.column(PqLut(
      ExpressionUtils.expression(e), ExpressionUtils.expression(cbs)))

  /** Nearest-codeword encoding (see PqExpressions.scala). */
  def pqEncode(e: Column, cbs: Column, cn: Column): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(e),
      ExpressionUtils.expression(cbs), ExpressionUtils.expression(cn)))

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot_long"),
        FunctionRegistryBase.expressionInfo[DotProductLong]("graft_dot_long", None),
        (children: Seq[Expression]) => DotProductLong(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot_float"),
        FunctionRegistryBase.expressionInfo[DotProductFloat]("graft_dot_float", None),
        (children: Seq[Expression]) => DotProductFloat(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_pq_lookup_sum"),
        FunctionRegistryBase.expressionInfo[PqLookupSum]("graft_pq_lookup_sum", None),
        (children: Seq[Expression]) => PqLookupSum(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_pq_sdc_sum"),
        FunctionRegistryBase.expressionInfo[PqSdcSum]("graft_pq_sdc_sum", None),
        (children: Seq[Expression]) => PqSdcSum(children(0), children(1), children(2))
      )
    )
  }
}

/** Double dot product of two array<float> columns (the un-quantized
  * fast path: cast-to-double per element, left-to-right fold — the
  * same order as the HOF formulation). */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - double dot product of two FLOAT arrays."
)
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_float"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
