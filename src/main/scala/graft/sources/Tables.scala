package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. At cluster scale these
  * would be partitioned parquet directories; the API is identical —
  * `spark.read.parquet` handles both, and column pruning / predicate
  * pushdown apply either way.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read nanos as long, truncate to µs)
    * and as TIMESTAMP(MICROS) without UTC adjustment (read as
    * TIMESTAMP_NTZ). Normalize both to session-UTC TimestampType so
    * every downstream operator sees one stable type regardless of
    * which generation of the files it runs against. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to µs (generator emits µs)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => // TIMESTAMP_NTZ: wall time is UTC by construction
        df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  /** documents/embeddings arrive as ONE parquet file → one input
    * split → the expensive per-row work (shingling, hashing, vector
    * math) would run on a single core. Fan out to the session's
    * parallelism up front; on a real cluster with many input files
    * this repartition is unnecessary but harmless (AQE coalesces). */
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
}
