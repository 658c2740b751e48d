// Hosted under org.apache.spark.sql.* (catalyst pattern-matching needs
// types that are private[sql] in Spark 4).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[DotProductLong]] when it is provably
  * bit-equivalent. Users (and SQL) write the composable built-in
  * formulation; the plan runs the tight primitive loop — the same
  * contract Catalyst applies to its own algebraic rewrites.
  *
  * The rewrite fires only when every step is exact:
  *   - both sides are array<bigint> with non-null elements (a null
  *     element nulls the HOF result but not the native loop's);
  *   - multiply/add agree on eval mode: LEGACY maps to the wrapping
  *     loop, ANSI to the checked loop (overflow throws either way;
  *     TRY is never rewritten);
  *   - the fold starts at literal 0L and the finish lambda is the
  *     identity.
  * Float folds are NOT rewritten: the HOF multiplies in float then
  * widens, DotProductFloat widens then multiplies — different last
  * bits. */
object VectorizeDotProducts extends Rule[LogicalPlan] {

  private def nonNullLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** e1 op e2 references exactly {v1, v2} (either order), nothing else. */
  private def refsExactly(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1, e2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        if nonNullLongArray(a) && nonNullLongArray(b) &&
          mul.evalMode == add.evalMode &&
          (mul.evalMode == EvalMode.LEGACY || mul.evalMode == EvalMode.ANSI) &&
          fin.exprId == finArg.exprId &&
          refsExactly(mul.left, mul.right, x, y) &&
          refsExactly(add.left, add.right, acc, el) =>
      DotProductLong(a, b, failOnError = mul.evalMode == EvalMode.ANSI)
  }
}
