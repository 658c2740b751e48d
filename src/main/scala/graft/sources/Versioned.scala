package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.operators.TableDiff
import graft.quality.Validate

/** Write-audit-publish corpus promotion on plain parquet — the
  * poor-man's table format (SURVEY.md §2.2/22bh).
  *
  * A corpus version is an immutable directory `v%05d` under a table
  * root; `_manifest.json` is the single mutable object and names the
  * live version. Promotion stages the candidate to a private
  * directory, audits WHAT WAS ACTUALLY WRITTEN (the staged files are
  * re-read for validation — a writer bug that corrupts encoding is
  * caught here, not by auditing the in-memory frame), and only then
  * swaps the manifest pointer with an atomic rename. Consequences:
  *
  *  - a failed audit leaves the live pointer untouched and removes
  *    the staging directory — readers never knew the candidate
  *    existed;
  *  - a reader that resolved the manifest keeps a consistent snapshot
  *    for the whole query, because version directories are never
  *    mutated and [[vacuum]] retains the previous version by default
  *    (in-flight readers of version N−1 survive a promotion to N);
  *  - a crashed promotion leaves at most a stale `_staging_*`
  *    directory, which the next promotion clears — never a
  *    half-written live version;
  *  - every publish (promote or rollback) appends an IMMUTABLE
  *    `_v%05d.json` entry to the manifest chain — [[versions]] lists
  *    it, [[readVersion]] time-travels through it, [[rollback]]
  *    re-publishes an old version's directory as a NEW version (the
  *    audit trail records the rollback; history is never rewritten),
  *    and [[vacuum]] GCs directories outside the retention window
  *    while keeping the chain entries so a vacuumed version reads as
  *    "vacuumed", not "unknown".
  *
  * The audit has two gates: a [[Validate.Check]] expectation suite
  * (every rule must report 0 violations) and an optional
  * [[DiffGate]] — refuse when more than `maxChangedPerMille` of the
  * LIVE corpus' keys changed or disappeared
  * ([[TableDiff.snapshotDiff]] stats), the fat-finger guard against
  * promoting a truncated or mis-joined rebuild over a good corpus.
  * Both gates collect only audit-sized rows (one per rule / one per
  * diff status).
  *
  * Scale note: the manifest rename is atomic on POSIX and HDFS; on
  * object stores without atomic rename, point the manifest write at a
  * consistent metadata service (the same caveat every manifest-based
  * table format carries). Data files are written once and never
  * renamed across directories by the publish step — the staging
  * directory becomes the version directory with one directory-level
  * rename, so publish cost is O(1) regardless of corpus size. */
object Versioned {

  /** The live pointer: monotonically increasing version, its
    * directory (relative to the root), and the directory it
    * superseded (kept for in-flight readers and [[rollback]]). */
  final case class Manifest(version: Int, path: String, previous: Option[String])

  /** Refuse promotion when (changed + removed) keys exceed
    * `maxChangedPerMille`/1000 of the live corpus' rows. `key` and
    * `content` are column names present in both the live and staged
    * frames. */
  final case class DiffGate(key: String, content: String, maxChangedPerMille: Long)

  /** Audit outcome. `violations` is (rule → count), `diffStats` is
    * (status → count) when a [[DiffGate]] ran against a live version;
    * `reason` is set iff the promotion was refused. */
  final case class PromoteReport(
      promoted: Boolean,
      version: Int,
      path: String,
      violations: Seq[(String, Long)],
      diffStats: Seq[(String, Long)],
      reason: Option[String])

  private def manifestFile(root: String) = new File(root, "_manifest.json")
  private def versionFile(root: String, v: Int) = new File(root, f"_v$v%05d.json")

  private def render(m: Manifest): String = {
    val prev = m.previous.map(p => "\"" + p + "\"").getOrElse("null")
    s"""{"version": ${m.version}, "path": "${m.path}", "previous": $prev}"""
  }

  private val VersionRe = """"version"\s*:\s*(\d+)""".r.unanchored
  private val PathRe = """"path"\s*:\s*"([^"]+)"""".r.unanchored
  private val PrevRe = """"previous"\s*:\s*"([^"]+)"""".r.unanchored

  private def parseManifest(f: File): Manifest = {
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val v = text match { case VersionRe(n) => n.toInt case _ => sys.error(s"bad manifest: $text") }
    val p = text match { case PathRe(s) => s case _ => sys.error(s"bad manifest: $text") }
    val prev = text match { case PrevRe(s) => Some(s) case _ => None }
    Manifest(v, p, prev)
  }

  /** The live manifest, if the table exists. */
  def currentManifest(root: String): Option[Manifest] = {
    val f = manifestFile(root)
    if (!f.exists()) None else Some(parseManifest(f))
  }

  /** The full manifest CHAIN: every version ever published (promote or
    * rollback), ascending. Each version's `_v%05d.json` is written
    * once at publish and never mutated — a rollback never rewrites
    * history, it appends to it. Tables created before per-version
    * manifests existed fall back to directory-name reconstruction. */
  def versions(root: String): Seq[Manifest] = {
    val files = Option(new File(root).listFiles()).getOrElse(Array.empty)
    val chain = files.filter(f => f.isFile && f.getName.matches("_v\\d{5}\\.json"))
      .map(parseManifest).sortBy(_.version).toSeq
    if (chain.nonEmpty) chain
    else // pre-r11 table: version = directory name, chain unknown
      files.filter(f => f.isDirectory && f.getName.matches("v\\d{5}"))
        .map(d => Manifest(d.getName.stripPrefix("v").toInt, d.getName, None))
        .sortBy(_.version).toSeq
  }

  /** Atomic pointer swap: write beside, rename over. Also records the
    * version's immutable `_v%05d.json` chain entry. */
  private def writeManifest(root: String, m: Manifest): Unit = {
    // chain entry first: if we crash between the two writes, the live
    // pointer still names the old version and the orphan chain entry
    // is overwritten by the next publish of that version number
    java.nio.file.Files.write(versionFile(root, m.version).toPath,
      render(m).getBytes("UTF-8"))
    val tmp = new File(root, s"_manifest.json.tmp${System.nanoTime()}")
    java.nio.file.Files.write(tmp.toPath, render(m).getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, manifestFile(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The live version's data. Fails if the table has never been
    * promoted. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val m = currentManifest(root).getOrElse(sys.error(s"no live version under $root"))
    spark.read.parquet(new File(root, m.path).getPath)
  }

  /** Time travel: the data as of version `v` — resolved through the
    * manifest chain, so it works for rollback-published versions whose
    * directory name differs from the version number. Fails loudly when
    * the version was never published or its directory was vacuumed. */
  def readVersion(spark: SparkSession, root: String, v: Int): DataFrame = {
    val m = versions(root).find(_.version == v)
      .getOrElse(sys.error(s"version $v was never published under $root"))
    val dir = new File(root, m.path)
    require(dir.exists(),
      s"version $v's data (${m.path}) was vacuumed — retained versions: " +
        versions(root).filter(x => new File(root, x.path).exists())
          .map(_.version).mkString(", "))
    spark.read.parquet(dir.getPath)
  }

  private def rmTree(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }

  /** Stage → audit → publish. Returns the report either way; the
    * manifest moves only on `promoted = true`. */
  def promote(
      df: DataFrame,
      root: String,
      checks: Seq[Validate.Check] = Seq.empty,
      diffGate: Option[DiffGate] = None): PromoteReport = {
    val spark = df.sparkSession
    new File(root).mkdirs()
    val live = currentManifest(root)
    val version = live.map(_.version + 1).getOrElse(1)
    val dirName = f"v$version%05d"
    val staging = new File(root, s"_staging_$dirName")
    if (staging.exists()) rmTree(staging) // leftover from a crashed run
    df.write.mode(SaveMode.Overwrite).parquet(staging.getPath)
    val staged = spark.read.parquet(staging.getPath)

    val viol: Seq[(String, Long)] =
      if (checks.isEmpty) Seq.empty
      else Validate.violations(staged, checks).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val firstViolation = viol.find(_._2 > 0)

    val (diffStats, diffReason): (Seq[(String, Long)], Option[String]) =
      (live, diffGate) match {
        case (Some(m), Some(g)) =>
          import org.apache.spark.sql.functions.col
          val liveDf = spark.read.parquet(new File(root, m.path).getPath)
          val stats = TableDiff.snapshotDiffStats(TableDiff.snapshotDiff(
            liveDf, staged, col(g.key), col(g.key), col(g.content), col(g.content)))
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          val byStatus = stats.toMap.withDefaultValue(0L)
          val liveRows = byStatus("unchanged") + byStatus("changed") + byStatus("removed")
          val moved = byStatus("changed") + byStatus("removed")
          val over = liveRows > 0 && moved * 1000L > g.maxChangedPerMille * liveRows
          (stats, if (over) Some(
            s"diff gate: $moved of $liveRows live keys changed/removed " +
              s"(> ${g.maxChangedPerMille} per mille)") else None)
        case _ => (Seq.empty, None)
      }

    val reason = firstViolation
      .map { case (rule, n) => s"validation: rule '$rule' has $n violations" }
      .orElse(diffReason)

    reason match {
      case Some(_) =>
        rmTree(staging)
        PromoteReport(promoted = false, version, dirName, viol, diffStats, reason)
      case None =>
        val target = new File(root, dirName)
        // the slot can only be occupied by a crashed publish (every
        // publish — promote or rollback — ADVANCES the version
        // counter, so a live version never reuses a slot); the
        // manifest does not reference it, so reclaiming it is safe
        if (target.exists()) rmTree(target)
        require(staging.renameTo(target), s"publish rename failed: $staging -> $target")
        writeManifest(root, Manifest(version, dirName, live.map(_.path)))
        PromoteReport(promoted = true, version, dirName, viol, diffStats, None)
    }
  }

  /** Roll back by PUBLISHING: the new live version is
    * `live.version + 1` and its path is the TARGET version's
    * directory — no data is copied, no directory is deleted, and no
    * history entry is ever rewritten (the audit trail shows the
    * rollback as its own version, exactly like every table format
    * with time travel). The rolled-back-from version stays readable
    * via [[readVersion]] for post-mortems until vacuumed. */
  def rollback(root: String, toVersion: Int): Manifest = {
    val live = currentManifest(root).getOrElse(sys.error(s"no live version under $root"))
    require(toVersion != live.version, s"version $toVersion is already live")
    val target = versions(root).find(_.version == toVersion)
      .getOrElse(sys.error(s"version $toVersion was never published under $root"))
    require(new File(root, target.path).exists(),
      s"version $toVersion's data (${target.path}) was vacuumed")
    val next = Manifest(live.version + 1, target.path, Some(live.path))
    writeManifest(root, next)
    next
  }

  /** One-step rollback: re-publish the live version's `previous`
    * directory as the new version. */
  def rollback(root: String): Manifest = {
    val live = currentManifest(root).getOrElse(sys.error(s"no live version under $root"))
    val prev = live.previous.getOrElse(sys.error(s"version ${live.version} has no previous"))
    require(new File(root, prev).exists(), s"previous version directory $prev is gone")
    val next = Manifest(live.version + 1, prev, Some(live.path))
    writeManifest(root, next)
    next
  }

  /** Retention GC: delete version directories EXCEPT the live one,
    * its `previous` (the in-flight-reader grace set — a reader that
    * resolved the manifest just before a promotion is still scanning
    * it), and the directories of the `retainLast` highest versions in
    * the chain (the time-travel window). Refuses retainLast < 1 — the
    * live version is never collectable. Chain entries are kept even
    * for vacuumed versions, so the audit trail stays complete and
    * [[readVersion]] can say "vacuumed" rather than "unknown".
    * Returns the deleted directory names. */
  def vacuum(root: String, retainLast: Int = 2): Seq[String] = {
    require(retainLast >= 1, "retainLast must be >= 1")
    val m = currentManifest(root).getOrElse(sys.error(s"no live version under $root"))
    val recent = versions(root).sortBy(-_.version).take(retainLast).map(_.path)
    val keep = Set(m.path) ++ m.previous ++ recent
    val doomed = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d{5}") && !keep(f.getName))
    doomed.foreach(rmTree)
    doomed.map(_.getName).toSeq.sorted
  }
}
