package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (SURVEY.md §2.5 extension) — the
  * expectations a pipeline runs before accepting an ingest batch:
  * null-ness, key uniqueness, value ranges, referential integrity.
  *
  * `violations` builds ONE plan: each check reduces to an aggregate
  * (or anti-join + aggregate) producing a (rule, violations) row, all
  * branches unioned — so a 10-rule suite is one job, and each branch
  * is a scan-side filter + count that whole-stage-codegens. Checks
  * report counts, not booleans: "how broken" matters operationally.
  */
object Validate {

  sealed trait Check { def rule: String }
  /** `column` must never be null. */
  case class NotNull(rule: String, column: Column) extends Check
  /** `columns` combination must be unique. */
  case class Unique(rule: String, columns: Seq[Column]) extends Check
  /** `column` must lie in [lo, hi]. */
  case class InRange(rule: String, column: Column, lo: Column, hi: Column) extends Check
  /** `column` values must exist in `dim.dimColumn` (FK integrity).
    * Null values are skipped — SQL `NOT IN` semantics; pair with
    * [[NotNull]] when nulls are themselves violations. */
  case class RefIntegrity(rule: String, column: Column, dim: DataFrame, dimColumn: Column) extends Check
  /** Rows must satisfy an arbitrary predicate. */
  case class Satisfies(rule: String, predicate: Column) extends Check

  /** Schema-drift report: the incoming batch's actual schema compared
    * against the expected DDL — the guard that catches an upstream
    * producer silently adding, dropping or re-typing a column before
    * the batch lands in the warehouse. One row per column name seen on
    * either side: status ∈ ok | type_changed | missing (expected but
    * absent) | extra (present but undeclared). Pure metadata — no data
    * is scanned, so it costs nothing to run on every ingest.
    *
    * Comparison is by lower-cased name and DDL-normalized type
    * (nullability is not drift: parquet/JSON sources flip it freely). */
  def schemaDrift(df: DataFrame, expectedDdl: String): DataFrame = {
    val expected = org.apache.spark.sql.types.StructType.fromDDL(expectedDdl)
    val exp = expected.fields.map(f => f.name.toLowerCase -> f.dataType.sql).toMap
    val act = df.schema.fields.map(f => f.name.toLowerCase -> f.dataType.sql).toMap
    val rows = (exp.keySet ++ act.keySet).toSeq.sorted.map { name =>
      val (e, a) = (exp.get(name), act.get(name))
      val status = (e, a) match {
        case (Some(x), Some(y)) if x == y => "ok"
        case (Some(_), Some(_))           => "type_changed"
        case (Some(_), None)              => "missing"
        case (None, Some(_))              => "extra"
      }
      (name, status, e.orNull, a.orNull)
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column", "status", "expected_type", "actual_type")
  }

  /** (rule, violations) per check; 0 = clean. */
  def violations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val branches = checks.map {
      case NotNull(r, c) =>
        df.filter(c.isNull).agg(count(lit(1)).as("violations")).withColumn("rule", lit(r))
      case Unique(r, cs) =>
        df.agg((count(lit(1)) - count_distinct(cs.head, cs.tail: _*)).as("violations"))
          .withColumn("rule", lit(r))
      case InRange(r, c, lo, hi) =>
        df.filter(c.isNull || c < lo || c > hi)
          .agg(count(lit(1)).as("violations")).withColumn("rule", lit(r))
      case RefIntegrity(r, c, dim, dc) =>
        df.filter(c.isNotNull)
          .join(dim.select(dc.as("__ref")), c === col("__ref"), "left_anti")
          .agg(count(lit(1)).as("violations")).withColumn("rule", lit(r))
      case Satisfies(r, p) =>
        df.filter(!coalesce(p, lit(false)))
          .agg(count(lit(1)).as("violations")).withColumn("rule", lit(r))
    }
    branches.reduce(_ unionByName _).select(col("rule"), col("violations"))
  }

  /** Sample-ratio-mismatch audit: observed arm sizes of a hash split
    * / experiment assignment against their intended weights, in exact
    * integers. For each expected arm: its row count (0 when the arm
    * VANISHED — the smoking gun a groupBy-only report never shows),
    * expected and observed shares in per-mille, and the
    * cross-multiplied deviation dev = n·W − w·N (exactly 0 when the
    * arm's share matches its weight; sign = direction). The release
    * gate that catches a broken bucketing hash or a filter that
    * silently ate one arm before training data ships.
    *
    * One map-side-combined count aggregate over the data; everything
    * after is arms-sized arithmetic (the expected table and totals
    * ride a broadcast of ≤ |arms| rows). Arms observed in the data
    * but absent from `expected` surface with expected_w = 0 (their
    * dev = n·W > 0 flags them). */
  def srmAudit(df: DataFrame, assignment: Column, expected: Seq[(String, Long)]): DataFrame = {
    require(expected.nonEmpty && expected.forall(_._2 >= 0))
    val spark = df.sparkSession
    import spark.implicits._
    val totalW = expected.map(_._2).sum
    // all-zero weights are a caller config error, not a data finding —
    // fail loudly here instead of an opaque ANSI divide-by-zero in the
    // expected_pm projection (found by the r10 fuzz gate)
    require(totalW > 0, "srmAudit: expected weights sum to 0")
    val exp = expected.toDF("arm", "expected_w")
    val counts = df.groupBy(assignment.as("arm")).agg(count(lit(1)).as("__n"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    exp.join(counts, Seq("arm"), "full_outer")
      .select(col("arm"),
        coalesce(col("__n"), lit(0L)).as("n"),
        coalesce(col("expected_w"), lit(0L)).as("expected_w"))
      .withColumn("__N", sum(col("n")).over(wAll))
      .withColumn("expected_pm", expr(s"(1000 * expected_w) div ${totalW}L"))
      .withColumn("observed_pm", expr("(1000 * n) div greatest(__N, 1)"))
      .withColumn("dev", col("n") * lit(totalW) - col("expected_w") * col("__N"))
      .select(col("arm"), col("n"), col("expected_w"),
        col("expected_pm"), col("observed_pm"), col("dev"))
  }

  /** k-anonymity risk audit (Sweeney 2002): every quasi-identifier
    * combination shared by FEWER than k rows is a re-identification
    * risk — the release gate that runs beside PII redaction before
    * any dataset ships. One map-side-combined aggregate over the
    * quasi-identifier tuple; the output is only the risky combos
    * (tiny by construction: each carries < k rows), so a 100 TB
    * audit returns KB. Output: (quasi-id columns…, n) for combos
    * with 1 ≤ n < k. */
  def kAnonymityRisk(df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    require(quasiIds.nonEmpty && k >= 2)
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Per-arm conversion readout with the Agresti–Coull interval at
    * z = 2 (Agresti & Coull 1998, the "add two successes and two
    * failures" estimator — the recommended small-sample interval, and
    * at z = 2 EXACTLY it needs no z table): per arm, the entity-level
    * conversion count x of n (an entity converts if ANY of its rows
    * does — the per-event rate the naive version quotes is inflated
    * by heavy users), the exact per-mille rate, and
    * p̃ ± 2·√(p̃(1−p̃)/(n+4)) with p̃ = (x+2)/(n+4). The interval is
    * a FIXED IEEE op sequence (divide, multiply, sqrt, add) replayed
    * identically by the oracle — every op correctly rounded, so the
    * doubles are bit-stable cross-engine (the q_corr precedent).
    * Read BESIDE the SRM audit: SRM says whether the split is valid,
    * this says what it measured.
    *
    * Scale shape: one (arm, entity) aggregate (map-side partials)
    * collapses the corpus to entity rows, then an arm-sized rollup. */
  def conversionReport(df: DataFrame, arm: Column, entity: Column,
      converted: Column): DataFrame = {
    val per = df.groupBy(arm.as("arm"), entity.as("__e"))
      .agg(max(converted.cast("int")).cast("long").as("__c"))
    per.groupBy("arm").agg(count(lit(1)).as("n"), sum("__c").as("x"))
      .withColumn("rate_pm", expr("(1000 * x) div n"))
      .withColumn("__pt",
        (col("x") + 2L).cast("double") / (col("n") + 4L).cast("double"))
      .withColumn("__hw",
        lit(2.0) * sqrt(col("__pt") * (lit(1.0) - col("__pt"))
          / (col("n") + 4L).cast("double")))
      .withColumn("ci_lo", col("__pt") - col("__hw"))
      .withColumn("ci_hi", col("__pt") + col("__hw"))
      .select("arm", "n", "x", "rate_pm", "ci_lo", "ci_hi")
  }

  /** Benford's-law first-digit constants in per-mille:
    * round(log10(1 + 1/d)·1000) for d = 1..9 — published fixed
    * integers (Nigrini's MAD reference distribution), summing to
    * 1000, so the audit needs no runtime transcendental. */
  private[graft] val BenfordPm: Seq[(Int, Long)] =
    Seq(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L, 5 -> 79L,
      6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)

  /** Benford first-significant-digit audit (Newcomb 1881 / Benford
    * 1938; Nigrini's forensic-accounting MAD test): naturally-grown
    * magnitudes (transaction amounts, populations, file sizes) lead
    * with digit d at probability log10(1 + 1/d); fabricated or
    * truncated data doesn't. Emits one row per digit 1..9: observed
    * n, exact per-mille share (floor over the POSITIVE-value count),
    * the fixed expected share, the signed per-mille deviation, and
    * mad_pm — Σ\|dev\|/9 repeated on each row, Nigrini's conformity
    * statistic (≲6 conformant, ≳15 nonconformity) as an exact
    * integer. First digit extracted lexically from the decimal
    * rendering of the positive integral value — exact at every
    * magnitude, engine-portable (no float log10 near power-of-ten
    * boundaries). Zero/negative rows are excluded (no first
    * significant digit); all nine digits always report, observed or
    * not.
    *
    * Scale shape: one 9-bucket map-side-combined aggregate over the
    * scan — corpus-sized input, 9-row output; everything after is
    * on 9 rows. */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val digits = df.sparkSession.createDataFrame(BenfordPm)
      .toDF("digit", "expected_pm")
    val obs = df
      .select(value.cast("long").as("__v")).filter(col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    digits.join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("__N", sum("n").over(wAll))
      .withColumn("observed_pm", expr("(1000 * n) div greatest(__N, 1)"))
      .withColumn("dev_pm", col("observed_pm") - col("expected_pm"))
      .withColumn("__sumdev", sum(abs(col("dev_pm"))).over(wAll))
      .withColumn("mad_pm", expr("__sumdev div 9"))
      .select("digit", "n", "observed_pm", "expected_pm", "dev_pm", "mad_pm")
  }
}
