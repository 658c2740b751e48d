package graft

import org.apache.spark.sql.functions._

import graft.quality.Validate._

class ValidateSpec extends SparkSpecBase {
  import spark.implicits._

  test("kAnonymityRisk flags exactly the quasi-id combos below k") {
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1),          // combo (a,1): n=3 → safe at k=3
      ("a", 2), ("a", 2),                    // (a,2): n=2 → risky
      ("b", 1)                               // (b,1): n=1 → risky
    ).toDF("zip", "age")
    val risky = kAnonymityRisk(df, Seq(col("zip"), col("age")), k = 3L)
      .as[(String, Int, Long)].collect().toSet
    assert(risky === Set(("a", 2, 2L), ("b", 1, 1L)))
    // at k=2 only the singleton remains; safe data yields an empty audit
    assert(kAnonymityRisk(df, Seq(col("zip"), col("age")), k = 2L)
      .as[(String, Int, Long)].collect().toSet === Set(("b", 1, 1L)))
    assert(kAnonymityRisk(df.filter(col("age") === 1 && col("zip") === "a"),
      Seq(col("zip")), k = 2L).count() === 0)
  }

  test("violations counts each broken expectation exactly") {
    val dim = Seq(1L, 2L).toDF("dk")
    val df = Seq(
      (Some(1L), 100L, 10),   // clean
      (Some(1L), 100L, 10),   // duplicate key 100
      (None, 101L, 5),        // null fk
      (Some(9L), 102L, -1),   // orphan fk + out-of-range
      (Some(2L), 103L, 200)   // out-of-range high
    ).toDF("fk", "k", "v")
    val out = violations(df, Seq(
      NotNull("fk_not_null", col("fk")),
      Unique("k_unique", Seq(col("k"))),
      InRange("v_range", col("v"), lit(0), lit(100)),
      RefIntegrity("fk_exists", col("fk"), dim, col("dk")),
      Satisfies("v_even", col("v") % 2 === 0)
    )).as[(String, Long)].collect().toMap
    assert(out === Map(
      "fk_not_null" -> 1L,
      "k_unique" -> 1L,     // 5 rows, 4 distinct keys
      "v_range" -> 2L,
      "fk_exists" -> 1L,    // only the orphan fk=9; null fk is skipped (NOT IN semantics)
      "v_even" -> 2L        // 5 and -1 are odd
    ))
  }

  test("violations is all-zero on clean data") {
    val dim = Seq(1L).toDF("dk")
    val df = Seq((1L, 10L, 4), (1L, 11L, 6)).toDF("fk", "k", "v")
    val out = violations(df, Seq(
      NotNull("nn", col("fk")),
      Unique("u", Seq(col("k"))),
      InRange("r", col("v"), lit(0), lit(10)),
      RefIntegrity("fki", col("fk"), dim, col("dk"))
    )).as[(String, Long)].collect().toMap
    assert(out.values.forall(_ == 0L))
  }

  test("schemaDrift classifies ok / type_changed / missing / extra") {
    val df = Seq((1L, "x", 3)).toDF("id", "name", "age")
    val out = schemaDrift(df, "id BIGINT, name INT, city STRING")
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("id") === (("ok", "BIGINT", "BIGINT")))
    assert(out("name") === (("type_changed", "INT", "STRING")))
    assert(out("city") === (("missing", "STRING", null)))
    assert(out("age") === (("extra", null, "INT")))
    assert(out.size === 4)
  }

  test("schemaDrift ignores case and nullability") {
    val df = Seq((1L, 2L)).toDF("ID", "v")
    val out = schemaDrift(df, "id bigint not null, V BIGINT")
      .as[(String, String, String, String)].collect().map(r => r._1 -> r._2).toMap
    assert(out === Map("id" -> "ok", "v" -> "ok"))
  }

  test("srmAudit: perfect ratio → dev 0; vanished and unexpected arms surface") {
    // 90/5/5 over 100 rows hitting the ratio exactly
    val exact = (1 to 90).map(i => (i.toLong, "train")) ++
      (91 to 95).map(i => (i.toLong, "val")) ++ (96 to 100).map(i => (i.toLong, "test"))
    val clean = srmAudit(exact.toDF("id", "arm"), col("arm"),
      Seq(("train", 90L), ("val", 5L), ("test", 5L)))
      .as[(String, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(clean("train") === (("train", 90L, 90L, 900L, 900L, 0L)))
    assert(clean("val")._6 === 0L && clean("test")._6 === 0L)

    // "val" vanished (a filter ate it) and a rogue arm appeared
    val broken = ((1 to 90).map(i => (i.toLong, "train")) ++
      (91 to 100).map(i => (i.toLong, "rogue"))).toDF("id", "arm")
    val rep = srmAudit(broken, col("arm"), Seq(("train", 90L), ("val", 5L), ("test", 5L)))
      .as[(String, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rep("val") === (("val", 0L, 5L, 50L, 0L, -500L))) // 0·100 − 5·100
    assert(rep("rogue")._2 === 10L && rep("rogue")._3 === 0L && rep("rogue")._6 === 1000L)
    assert(rep("train")._6 === 0L) // 90·100 − 90·100
  }

  test("srmAudit refuses an all-zero weight set loudly (r10 fuzz find)") {
    val df = Seq((1L, "a")).toDF("id", "arm")
    val e = intercept[IllegalArgumentException] {
      srmAudit(df, col("arm"), Seq(("a", 0L), ("b", 0L)))
    }
    assert(e.getMessage.contains("expected weights sum to 0"))
  }

  test("conversionReport: entity-level conversion, exact rate, AC interval arithmetic") {
    // arm A: users 1 (converts TWICE — counts once), 2, 3 → x=1 n=3
    // arm B: user 9 converts → x=1 n=1
    val df = Seq(
      ("A", 1L, true), ("A", 1L, true), ("A", 1L, false),
      ("A", 2L, false), ("A", 3L, false),
      ("B", 9L, true)).toDF("arm", "u", "conv")
    val got = graft.quality.Validate.conversionReport(
        df, col("arm"), col("u"), col("conv"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A")._2 === 3L && got("A")._3 === 1L && got("A")._4 === 333L)
    // the exact IEEE chain both engines replay
    val pt = 3.0 / 7.0
    val hw = 2.0 * math.sqrt(pt * (1.0 - pt) / 7.0)
    assert(got("A")._5 === pt - hw && got("A")._6 === pt + hw)
    // heavy converter in a 1-user arm: interval still inside sane bounds
    assert(got("B")._3 === 1L && got("B")._5 > 0.0 && got("B")._6 < 1.2)
  }

  test("benfordAudit: constants sum to 1000; all nine digits report; exact shares") {
    assert(graft.quality.Validate.BenfordPm.map(_._2).sum === 1000L)
    // 6 positive values: digits 1,1,2,9; zero and negative excluded
    val df = Seq(100L, 19L, 2L, 900L, 0L, -5L).toDF("v")
    val got = graft.quality.Validate.benfordAudit(df, col("v"))
      .orderBy("digit")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 9)
    val byD = got.map(r => r._1 -> r).toMap
    assert(byD(1)._2 === 2L); assert(byD(2)._2 === 1L); assert(byD(9)._2 === 1L)
    assert(byD(3)._2 === 0L) // unobserved digit still reports
    assert(byD(1)._3 === 500L) // 2 of 4 → exact 500‰
    // dev and MAD are exact integers off the published constants
    assert(byD(1)._5 === 500L - 301L)
    val mad = got.map(r => math.abs(r._5)).sum / 9
    assert(got.forall(_._6 === mad))
  }

  test("benfordAudit: digit extraction is exact at power-of-ten boundaries") {
    // float log10 would misclassify near 10^k; lexical extraction can't
    val df = Seq(999999999999L, 1000000000000L, 99L, 100L).toDF("v")
    val got = graft.quality.Validate.benfordAudit(df, col("v"))
      .filter(col("n") > 0).select("digit", "n")
      .as[(Int, Long)].collect().toMap
    assert(got === Map(9 -> 2L, 1 -> 2L))
  }
}
