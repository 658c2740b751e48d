package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class PlansSpec extends SparkSpecBase {
  import spark.implicits._

  test("native DotProductLong equals the HOF formulation (randomized)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)(
      (Seq.fill(16)(rnd.nextLong() % 1000000L), Seq.fill(16)(rnd.nextLong() % 1000000L))
    )
    val mismatches = rows.toDF("a", "b")
      .select(Similarity.dotQ(col("a"), col("b")).as("n"), Similarity.dotQHof(col("a"), col("b")).as("h"))
      .filter(col("n") =!= col("h"))
      .count()
    assert(mismatches === 0L)
  }

  test("DotProductLong handles nulls and length mismatch") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L))), // mismatched: min length
      (None, Some(Seq(1L)))                       // null in → null out
    ).toDF("a", "b")
    val out = df.select(Similarity.dotQ(col("a"), col("b"))).collect()
    assert(out(0).getLong(0) === 14L)
    assert(out(1).isNullAt(0))
  }

  test("graft_dot_long / graft_dot_float are registered SQL functions via extensions") {
    val l = spark.sql("SELECT graft_dot_long(array(1L, 2L), array(3L, 4L)) AS d").as[Long].head()
    assert(l === 11L)
    val f = spark.sql("SELECT graft_dot_float(array(CAST(0.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(f === 1.0)
  }

  test("graft_shingles / graft_char_shingles are registered SQL functions") {
    val w = spark.sql("SELECT graft_shingles('The quick Fox', 2) AS g")
      .as[Seq[String]].head()
    assert(w === Seq("the quick", "quick fox"))
    val c = spark.sql("SELECT graft_char_shingles('AbC', 2) AS g")
      .as[Seq[String]].head()
    assert(c === Seq("ab", "bc"))
  }

  test("VectorizeDotProducts rewrites the HOF fold to the native expression") {
    // non-local child so the projection isn't constant-folded away
    val df = spark.range(50)
      .select(array(col("id"), col("id") + 1).as("a"), array(col("id") * 2, col("id") + 3).as("b"))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v).as("d"))
    // the optimizer swapped in the native expression...
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot_long"))
    assert(!hof.queryExecution.optimizedPlan.toString.contains("aggregate("))
    // ...and values match the native formulation exactly
    val native = df.select(Similarity.dotQ(col("a"), col("b")).as("d"))
    assert(hof.as[Long].collect().toSeq === native.as[Long].collect().toSeq)
  }

  test("VectorizeDotProducts leaves non-dot-product folds alone") {
    val df = spark.range(10).select(array(col("id"), col("id") + 1).as("a"), array(col("id")).as("b"))
    // max-fold, not a dot product: must stay a HOF
    val other = df.select(
      aggregate(zip_with(col("a"), col("a"), (x, y) => x * y), lit(1L), (acc, v) => greatest(acc, v)))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot_long"))
    // SQL route gets the rewrite too
    val sqlPlan = spark.range(5)
      .select(array(col("id")).as("a"), array(col("id")).as("b"))
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d")
    assert(sqlPlan.queryExecution.optimizedPlan.toString.contains("graft_dot_long"))
  }

  test("native dot product appears inside WholeStageCodegen") {
    // needs a non-local child: local relations constant-fold the whole projection
    val df = spark.range(100)
      .select(array(col("id"), col("id") + 1).as("a"), array(col("id") * 2, col("id")).as("b"))
      .select(Similarity.dotQ(col("a"), col("b")).as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot_long"))
    assert(df.agg(sum(col("d"))).as[Long].head() === (0L until 100L).map(i => i * i * 2 + (i + 1) * i).sum)
  }
}
