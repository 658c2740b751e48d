package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofJoin picks latest right row at-or-before, null when none") {
    val left = Seq((1L, 100L, "c1"), (1L, 50L, "c2"), (2L, 10L, "c3")).toDF("k", "ts", "name")
    val right = Seq((1L, 100L, "r100"), (1L, 60L, "r60"), (1L, 200L, "r200")).toDF("k", "rts", "tag")
    val out = TemporalJoins
      .asofJoin(left, right, "k", col("ts"), col("rts"), Seq("tag"))
      .select("name", "tag").as[(String, Option[String])].collect().toMap
    assert(out("c1") === Some("r100")) // equal ts matches (ASOF >=)
    assert(out("c2") === None)         // earliest right is 60 > 50
    assert(out("c3") === None)         // no right rows for key 2
  }

  test("asofJoin is deterministic on duplicate (key, ts) right rows; payload from one row") {
    val left = Seq((1L, 100L, "c1")).toDF("k", "ts", "name")
    // two right rows tie exactly on (k, rts): tie-break = max payload struct,
    // and both payload columns must come from THAT row (never mixed).
    val right = Seq((1L, 100L, "a", 10L), (1L, 100L, "b", 2L)).toDF("k", "rts", "tag", "rid")
    val outs = (1 to 5).map { _ =>
      TemporalJoins.asofJoin(left, right, "k", col("ts"), col("rts"), Seq("tag", "rid"))
        .select("name", "tag", "rid").as[(String, String, Long)].collect().toSeq
    }
    assert(outs.distinct.size === 1)                    // run-to-run deterministic
    assert(outs.head === Seq(("c1", "b", 2L)))          // max struct row, columns paired
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(300)((rnd.nextInt(3).toLong, rnd.nextInt(10000).toLong)).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "pt", "pid")
    val ivs = Seq.fill(50)((rnd.nextInt(3).toLong, rnd.nextInt(9000).toLong)).zipWithIndex
      .map { case ((k, s), i) => (k, s, s + rnd.nextInt(2000).toLong, i.toLong) }.toDF("k", "s", "e", "iid")
    val bucketed = TemporalJoins
      .rangeJoinBucketed(points, ivs, "k", col("pt"), col("s"), col("e"), bucketUs = 512)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, Seq("k"))
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }
}
