package graft

import org.apache.spark.sql.functions._
import graft.operators.JsonShred._

class JsonShredSpec extends SparkSpecBase {
  import spark.implicits._

  test("pack then shred round-trips typed rows losslessly") {
    val df = Seq((1L, 10L, 3L), (1L, 11L, 4L), (2L, 12L, 5L))
      .toDF("k", "p", "q")
    val out = df.packJsonPerKey(col("k"), Seq("p" -> col("p"), "q" -> col("q")))
      .shredJson(col("doc"), "key BIGINT, items ARRAY<STRUCT<p: BIGINT, q: BIGINT>>")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 10L, 3L), (1L, 11L, 4L), (2L, 12L, 5L)))
  }

  test("packJsonPerKey emits one parseable document per key") {
    val df = Seq((1L, 10L, 3L), (1L, 11L, 4L)).toDF("k", "p", "q")
    val docs = df.packJsonPerKey(col("k"), Seq("p" -> col("p"), "q" -> col("q")))
      .as[String].collect()
    assert(docs.length === 1)
    assert(docs.head.contains("\"key\":1"))
    assert(docs.head.contains("\"items\":["))
  }

  test("shredJson drops unparseable documents instead of failing") {
    val df = Seq("""{"key":7,"items":[{"p":1,"q":2}]}""", "not json at all")
      .toDF("doc")
    val out = df.shredJson(col("doc"), "key BIGINT, items ARRAY<STRUCT<p: BIGINT, q: BIGINT>>")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((7L, 1L, 2L)))
  }

  test("shredJson preserves duplicate items (multiset semantics)") {
    val df = Seq((1L, 5L, 5L), (1L, 5L, 5L)).toDF("k", "p", "q")
    val out = df.packJsonPerKey(col("k"), Seq("p" -> col("p"), "q" -> col("q")))
      .shredJson(col("doc"), "key BIGINT, items ARRAY<STRUCT<p: BIGINT, q: BIGINT>>")
      .collect()
    assert(out.length === 2)
  }
}
