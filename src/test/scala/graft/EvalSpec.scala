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

  private def aucRow(df: org.apache.spark.sql.DataFrame, g: String) =
    Eval.aucExact(df, col("g"), col("s"), col("pos"))
      .filter(col("g") === g)
      .select("n_pos", "n_neg", "auc_num", "auc_den", "auc_milli")
      .as[(Long, Long, Long, Long, Option[Long])].head()

  test("aucExact: hand-traced tie-averaged rank sum") {
    // scores pos={3,1}, neg={2,2}: sorted 1p 2n 2n 3p, tied run at 2.
    // Concordant pairs 2 of 4 → AUC exactly 1/2.
    val df = Seq(("a", 3L, true), ("a", 1L, true), ("a", 2L, false), ("a", 2L, false))
      .toDF("g", "s", "pos")
    assert(aucRow(df, "a") === ((2L, 2L, 4L, 8L, Some(500L))))
  }

  test("aucExact: perfect separation, reversal, and the undefined-group NULL") {
    val df = Seq(
      ("sep", 10L, true), ("sep", 11L, true), ("sep", 1L, false),
      ("rev", 1L, true), ("rev", 9L, false),
      ("allpos", 5L, true), ("allpos", 6L, true)).toDF("g", "s", "pos")
    assert(aucRow(df, "sep")._5 === Some(1000L))
    assert(aucRow(df, "rev")._5 === Some(0L))
    assert(aucRow(df, "allpos") === ((2L, 0L, 0L, 0L, None)))
  }

  test("aucExact: randomized brute-force pair replay (ties at half weight)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      ("g" + (i % 3), rnd.nextInt(12).toLong, rnd.nextBoolean())
    }
    val df = rows.toDF("g", "s", "pos")
    val got = Eval.aucExact(df, col("g"), col("s"), col("pos"))
      .select("g", "auc_num", "auc_den")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val ps = rows.filter(r => r._1 == g && r._3).map(_._2)
      val ns = rows.filter(r => r._1 == g && !r._3).map(_._2)
      // 2×(concordant + ties/2) over 2·n⁺·n⁻ — the Mann–Whitney identity
      val num2 = ps.map(p => ns.map(n => if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
      assert(got(g) === ((num2, 2L * ps.size * ns.size)), s"group $g")
    }
  }
}
