package graft

/** Every registered query must RUN against the driver's real sf0.001
  * testdata.
  *
  * This guards the correctness gate's coverage, not its answers (the
  * DuckDB oracle does that): between rounds 6 and 7 the driver
  * regenerated events.parquet with a different physical timestamp
  * type, the round-1 loader threw at analysis time, and 22 queries
  * silently vanished from CORRECTNESS_r07.json — Verify logs failures
  * to stderr and moves on, and Bench swallows exceptions by design.
  * A thrown analysis/runtime error here turns that silent coverage
  * loss into a red suite.
  *
  * Cost: one count() per query at sf0.001 (~6k-row tables) on the
  * shared session — seconds total, not minutes.
  */
class SmokeAllQueriesSpec extends SparkSpecBase {
  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry query runs on sf0.001 and its oracle pairing is consistent") {
    val missingOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missingOracle.isEmpty,
      s"oracleSql entries without a queries entry: $missingOracle")

    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(name -> s"${e.getClass.getSimpleName}: ${e.getMessage.take(200)}") }
      graft.operators.Checkpoints.releaseAll()
      r
    }
    assert(failures.isEmpty, failures.map { case (n, m) => s"\n  $n → $m" }.mkString)
  }

  test("events loader normalizes ts to session-UTC TimestampType") {
    import org.apache.spark.sql.types.TimestampType
    val df = graft.sources.Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must be TimestampType regardless of the parquet generation, got ${df.schema("ts").dataType}")
    assert(df.limit(1).count() == 1)
  }
}
