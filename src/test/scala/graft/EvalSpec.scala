package graft

import org.apache.spark.sql.functions._

import graft.quality.Eval

/** Per-class metric arithmetic on crafted confusion structures —
  * classes missing from one side, zero denominators, and the exact
  * milli values. */
class EvalSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact milli metrics on a known confusion structure") {
    // truth:  a a a b b c
    // pred:   a a b b a c
    val preds = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"), ("c", "c"))
      .toDF("t", "p")
    val m = Eval.perClassMetrics(preds, col("t"), col("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // a: tp=2 fp=1 fn=1 → p=2000/3=666, r=666, f1=4000/6=666
    assert(m("a") === ((2L, 1L, 1L, 666L, 666L, 666L)))
    // b: tp=1 fp=1 fn=1 → 500 across the board
    assert(m("b") === ((1L, 1L, 1L, 500L, 500L, 500L)))
    // c: perfect singleton
    assert(m("c") === ((1L, 0L, 0L, 1000L, 1000L, 1000L)))
  }

  test("classes observed only as prediction or only as truth still report") {
    // 'x' never predicted (recall side only), 'y' never true (precision side only)
    val preds = Seq(("x", "y")).toDF("t", "p")
    val m = Eval.perClassMetrics(preds, col("t"), col("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(m.keySet === Set("x", "y"))
    // x: n_pred=0 → precision 0 by convention; fn=1
    assert(m("x") === ((0L, 0L, 1L, 0L, 0L, 0L)))
    // y: n_true=0 → recall 0 by convention; fp=1
    assert(m("y") === ((0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("integer labels survive the string cast consistently") {
    val preds = Seq((1, 1), (2, 1)).toDF("t", "p")
    val labs = Eval.perClassMetrics(preds, col("t"), col("p"))
      .select("lab").as[String].collect().toSet
    assert(labs === Set("1", "2"))
  }
}
