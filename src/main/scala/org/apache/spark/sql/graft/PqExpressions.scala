// Hosted under org.apache.spark.sql.* because ExpectsInputTypes /
// AbstractDataType are private[sql] in Spark 4 — the standard
// technique for third-party native expressions (see
// VectorExpressions.scala).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product-quantization ADC scoring
  * (SURVEY.md §2.4/29c2, 28h3). The HOF formulation —
  * `aggregate(sequence(0, m-1), 0L, (a, si) -> a +
  * element_at(element_at(lut, si+1), codes[si]+1))` — is interpreted:
  * a lambda frame and two generic element_at dispatches per subspace
  * per candidate, at exactly the step PQ exists to make cheap (the r12
  * measurement: the ADC path ran ~6× SLOWER than the full-dimension
  * codegen'd dot product it is supposed to undercut). These
  * expressions generate the tight two-array-loads-per-subspace loop
  * inside whole-stage codegen instead — m indexed loads per candidate,
  * the published ADC cost model.
  *
  * Semantics match the HOF formulations bit-for-bit (same ascending-si
  * fold order, same wrapping long addition), so they swap in under the
  * oracle-gated queries (q_ann_ivfpq, q_semdedup_pq, q_mutual_knn_pq)
  * without changing an output bit — PlansSpec pins expression ≡ HOF on
  * randomized inputs, and the existing exhaustive-settings bit-equality
  * gates hold unchanged. Out-of-range codes throw (UnsafeArrayData
  * does NOT bounds-check, so silent garbage reads must be fenced).
  */

/** Σ_si table[si][codes[si]] — the asymmetric-distance (ADC) fold: one
  * lookup per subspace into a per-query table of precomputed partial
  * dots (or codeword norms). `codes` indexes 0-based dense codeword
  * ids ([[graft.similarity.PqAnn.encode]]). */
@ExpressionDescription(
  usage = "_FUNC_(codes, table) - sum of table[i][codes[i]] over the codes array."
)
case class PqLookupSum(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_lookup_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tbl = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tbl.numElements() < m)
      throw new IllegalArgumentException(
        s"graft_pq_lookup_sum: ${tbl.numElements()} lookup rows for $m codes")
    var sum = 0L
    var i = 0
    while (i < m) {
      val row = tbl.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"graft_pq_lookup_sum: code $c out of range [0, ${row.numElements()}) at subspace $i")
      sum += row.getLong(c)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $m = $a.numElements();
         |if ($b.numElements() < $m) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_lookup_sum: " + $b.numElements() + " lookup rows for " + $m + " codes");
         |}
         |long $sum = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($i);
         |  int $c = $a.getInt($i);
         |  if ($c < 0 || $c >= $row.numElements()) {
         |    throw new IllegalArgumentException(
         |      "graft_pq_lookup_sum: code " + $c + " out of range at subspace " + $i);
         |  }
         |  $sum += $row.getLong($c);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ_si sdc[si][ca[si]][cb[si]] — the symmetric-distance (SDC) fold
  * for code-vs-code scoring ([[graft.similarity.SemDedup.semDedupPq]]):
  * one lookup per subspace into the broadcast m·k² table of
  * codeword-pair partial dots. */
@ExpressionDescription(
  usage = "_FUNC_(ca, cb, sdc) - sum of sdc[i][ca[i]][cb[i]] over the code arrays."
)
case class PqSdcSum(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType),
      ArrayType(ArrayType(ArrayType(LongType))))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_sdc_sum"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val ca = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val sdc = c.asInstanceOf[ArrayData]
    val m = ca.numElements()
    if (cb.numElements() != m || sdc.numElements() < m)
      throw new IllegalArgumentException(
        s"graft_pq_sdc_sum: code lengths $m/${cb.numElements()}, ${sdc.numElements()} tables")
    var sum = 0L
    var i = 0
    while (i < m) {
      val tbl = sdc.getArray(i)
      val ia = ca.getInt(i)
      if (ia < 0 || ia >= tbl.numElements())
        throw new IllegalArgumentException(
          s"graft_pq_sdc_sum: code $ia out of range at subspace $i")
      val row = tbl.getArray(ia)
      val ib = cb.getInt(i)
      if (ib < 0 || ib >= row.numElements())
        throw new IllegalArgumentException(
          s"graft_pq_sdc_sum: code $ib out of range at subspace $i")
      sum += row.getLong(ib)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      val tbl = ctx.freshName("tbl")
      val row = ctx.freshName("row")
      val ia = ctx.freshName("ia")
      val ib = ctx.freshName("ib")
      s"""
         |int $m = $a.numElements();
         |if ($b.numElements() != $m || $c.numElements() < $m) {
         |  throw new IllegalArgumentException("graft_pq_sdc_sum: shape mismatch");
         |}
         |long $sum = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $tbl = $c.getArray($i);
         |  int $ia = $a.getInt($i);
         |  if ($ia < 0 || $ia >= $tbl.numElements()) {
         |    throw new IllegalArgumentException(
         |      "graft_pq_sdc_sum: code " + $ia + " out of range at subspace " + $i);
         |  }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $tbl.getArray($ia);
         |  int $ib = $b.getInt($i);
         |  if ($ib < 0 || $ib >= $row.numElements()) {
         |    throw new IllegalArgumentException(
         |      "graft_pq_sdc_sum: code " + $ib + " out of range at subspace " + $i);
         |  }
         |  $sum += $row.getLong($ib);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
