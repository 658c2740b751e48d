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

/** Per-query ADC lookup table: lut[si][dcid] = Σ_j e[si·subDim + j] ·
  * cbs[si][dcid][j] — every (subspace, codeword) partial dot of one
  * query vector against the broadcast codebook, the table
  * [[PqLookupSum]] then folds per candidate. The HOF formulation
  * (transform × transform × aggregate(zip_with)) allocates a sliced
  * array and a lambda frame per codeword per row; this is one
  * m·k·subDim multiply-add loop inside whole-stage codegen. subDim is
  * inferred from the codeword length. */
@ExpressionDescription(
  usage = "_FUNC_(e, cbs) - per-subspace codeword partial-dot table for vector e."
)
case class PqLut(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(ArrayType(ArrayType(LongType))))
  override def dataType: DataType = ArrayType(ArrayType(LongType))
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val cbs = b.asInstanceOf[ArrayData]
    val m = cbs.numElements()
    val n = e.numElements()
    val out = new Array[Any](m)
    var si = 0
    while (si < m) {
      val cws = cbs.getArray(si)
      val k = cws.numElements()
      val row = new Array[Long](k)
      var c = 0
      while (c < k) {
        val ce = cws.getArray(c)
        val sub = ce.numElements()
        // UnsafeArrayData does not bounds-check: a vector shorter than
        // m·subDim would read silent garbage — fence it loudly
        if (si * sub + sub > n)
          throw new IllegalArgumentException(
            s"graft_pq_lut: vector length $n < ${si * sub + sub} needed at subspace $si")
        var s = 0L
        var j = 0
        while (j < sub) {
          s += e.getLong(si * sub + j) * ce.getLong(j)
          j += 1
        }
        row(c) = s
        c += 1
      }
      out(si) = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(row)
      si += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val si = ctx.freshName("si")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val sub = ctx.freshName("sub")
      val s = ctx.freshName("s")
      val cws = ctx.freshName("cws")
      val ce = ctx.freshName("ce")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      s"""
         |int $m = $b.numElements();
         |int $n = $a.numElements();
         |Object[] $out = new Object[$m];
         |for (int $si = 0; $si < $m; $si++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cws = $b.getArray($si);
         |  int $k = $cws.numElements();
         |  long[] $row = new long[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $ce = $cws.getArray($c);
         |    int $sub = $ce.numElements();
         |    if ($si * $sub + $sub > $n) {
         |      throw new IllegalArgumentException(
         |        "graft_pq_lut: vector length " + $n + " too short at subspace " + $si);
         |    }
         |    long $s = 0L;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      $s += $a.getLong($si * $sub + $j) * $ce.getLong($j);
         |    }
         |    $row[$c] = $s;
         |  }
         |  $out[$si] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ encoding: codes[si] = argmin over dcid of cn[si][dcid] −
  * 2·(Σ_j e[si·subDim + j] · cbs[si][dcid][j]) — the integer-L2
  * nearest codeword per subspace, ties to the SMALLER dcid (strict
  * less-than over ascending dcid: exactly the HOF fold's semantics,
  * including the degenerate all-empty −1). One m·k·subDim loop in
  * codegen, replacing the interpreted fold that allocated a struct
  * per codeword per row — the PQ BUILD-side hot path (encode runs
  * once per corpus vector). */
@ExpressionDescription(
  usage = "_FUNC_(e, cbs, cn) - nearest-codeword ids per subspace for vector e."
)
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(ArrayType(ArrayType(LongType))),
      ArrayType(ArrayType(LongType)))
  override def dataType: DataType = ArrayType(IntegerType)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val cbs = b.asInstanceOf[ArrayData]
    val cn = c.asInstanceOf[ArrayData]
    val m = cbs.numElements()
    val n = e.numElements()
    val out = new Array[Int](m)
    var si = 0
    while (si < m) {
      val cws = cbs.getArray(si)
      val cns = cn.getArray(si)
      val k = cws.numElements()
      var best = -1
      var bestD = Long.MaxValue
      var ci = 0
      while (ci < k) {
        val ce = cws.getArray(ci)
        val sub = ce.numElements()
        // fence: UnsafeArrayData reads past a short vector silently
        if (si * sub + sub > n)
          throw new IllegalArgumentException(
            s"graft_pq_encode: vector length $n < ${si * sub + sub} needed at subspace $si")
        var dot = 0L
        var j = 0
        while (j < sub) {
          dot += e.getLong(si * sub + j) * ce.getLong(j)
          j += 1
        }
        val d = cns.getLong(ci) - 2L * dot
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      out(si) = best
      si += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val si = ctx.freshName("si")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val sub = ctx.freshName("sub")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cws = ctx.freshName("cws")
      val cns = ctx.freshName("cns")
      val ce = ctx.freshName("ce")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      s"""
         |int $m = $b.numElements();
         |int $n = $a.numElements();
         |int[] $out = new int[$m];
         |for (int $si = 0; $si < $m; $si++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cws = $b.getArray($si);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cns = $c.getArray($si);
         |  int $k = $cws.numElements();
         |  int $best = -1;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $ci = 0; $ci < $k; $ci++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $ce = $cws.getArray($ci);
         |    int $sub = $ce.numElements();
         |    if ($si * $sub + $sub > $n) {
         |      throw new IllegalArgumentException(
         |        "graft_pq_encode: vector length " + $n + " too short at subspace " + $si);
         |    }
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      $dot += $a.getLong($si * $sub + $j) * $ce.getLong($j);
         |    }
         |    long $d = $cns.getLong($ci) - 2L * $dot;
         |    if ($d < $bestD) { $bestD = $d; $best = $ci; }
         |  }
         |  $out[$si] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
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
