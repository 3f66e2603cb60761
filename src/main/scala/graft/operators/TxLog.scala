package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal log-backed table format: ACID-on-parquet via an ordered
  * transaction log — the structure every production lakehouse table
  * format (as published in the Delta Lake paper, VLDB 2020) builds on,
  * reduced to the four properties that matter at warehouse scale:
  *
  *   1. ATOMIC COMMITS. A commit is one log file `_txlog/%08d.json`
  *      whose creation is all-or-nothing (hard-link publish, which
  *      fails atomically if the version already exists — the POSIX
  *      stand-in for an object store's put-if-absent). Readers never
  *      see a half-written table state: data files are invisible until
  *      the commit that adds them exists in full.
  *   2. OPTIMISTIC CONCURRENCY. Writers commit against an expected
  *      version; losing a race throws [[TxLog.ConcurrentCommit]] and
  *      the caller re-reads + retries. No locks, arbitrarily many
  *      concurrent readers.
  *   3. SNAPSHOT ISOLATION + TIME TRAVEL. A snapshot at version v is
  *      the log's add/remove actions folded through commit v — old
  *      versions stay readable (`read(..., asOf = Some(v))`) until a
  *      retention job vacuums removed files.
  *   4. FILE-GRANULAR COPY-ON-WRITE. `deleteWhere` rewrites ONLY the
  *      files that contain matching rows (discovered distributedly via
  *      input_file_name aggregation — the driver handles file METADATA,
  *      never data); untouched files carry over by reference. At 100 TB
  *      that is the difference between rewriting gigabytes and
  *      rewriting the table.
  *
  * Deliberately out of scope (documented, not faked): log checkpoints
  * (at 1e5+ commits you fold the log into a parquet checkpoint exactly
  * like the published formats), schema evolution, and multi-table
  * transactions.
  */
object TxLog {

  final class ConcurrentCommit(msg: String) extends RuntimeException(msg)

  private def logDir(table: String): File = new File(table, "_txlog")

  private def logFile(table: String, v: Int): File =
    new File(logDir(table), f"$v%08d.json")

  /** Latest committed version, -1 for an empty/new table. */
  def version(table: String): Int = {
    val d = logDir(table)
    val fs = d.listFiles()
    if (fs == null) -1
    else fs.map(_.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt).sorted.lastOption.getOrElse(-1)
  }

  /** Atomically publish version `expected + 1` containing `actions`
    * (op -> relative path). Hard-link from a fully-written temp file:
    * link(2) is atomic and fails if the target exists, so exactly one
    * of two racing writers wins; the loser gets [[ConcurrentCommit]].
    */
  def commit(table: String, expected: Int,
             actions: Seq[(String, String)]): Int =
    commitLines(table, expected, actions.map { case (op, path) =>
      s"""{"op":"$op","path":"$path"}"""
    })

  private[operators] def commitLines(table: String, expected: Int,
                                     lines: Seq[String]): Int = {
    val next = expected + 1
    val d = logDir(table)
    d.mkdirs()
    val body = lines.mkString("", "\n", "\n")
    val tmp = Files.createTempFile(d.toPath, s".commit-", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      try Files.createLink(logFile(table, next).toPath, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentCommit(
            s"version $next already committed (expected base $expected); " +
              "re-read the snapshot and retry")
      }
    } finally Files.deleteIfExists(tmp)
    maybeCheckpoint(table, next)
    next
  }

  /** OPTIMIZE: compact the live file set down to `targetFiles` as one
    * log commit (remove all live, add the compacted set) — the
    * maintenance op a streaming TxLog sink needs, since every
    * micro-batch commit adds at least one file. History before the
    * optimize stays time-travelable until vacuumed; a concurrent
    * append surfaces as ConcurrentCommit (read-modify-write, caller
    * retries on the fresh snapshot). */
  def optimize(spark: SparkSession, table: String,
               targetFiles: Int): Int = {
    val base = version(table)
    val live = files(table, Some(base))
    if (live.size <= targetFiles) return base
    val sub = s"data-${java.util.UUID.randomUUID().toString.take(8)}"
    read(spark, table, Some(base)).repartition(targetFiles)
      .write.parquet(new File(table, sub).getAbsolutePath)
    val actions = live.map(("remove", _)) ++
      newFiles(table, sub).map(("add", _))
    commit(table, base, actions)
  }

  /** Live file set (relative paths) at `asOf` (default: latest). */
  def files(table: String, asOf: Option[Int] = None): Seq[String] =
    filesWithStats(table, asOf).map(_._1)

  /** Snapshot read at a version. Empty live set still yields the right
    * schema by reading zero files is impossible in Spark — callers only
    * time-travel to versions with data (all graft uses do). */
  def read(spark: SparkSession, table: String,
           asOf: Option[Int] = None): DataFrame = {
    val fs = files(table, asOf).map(p => new File(table, p).getAbsolutePath)
    spark.read.parquet(fs: _*)
  }

  /** Write `df` as new parquet files under the table and commit them as
    * an APPEND. Returns the new version. Retries once on a lost race
    * (append never conflicts logically — the file set is additive).
    *
    * `statsCol`: optionally record per-file min/max of one long column
    * in the add actions (computed in ONE distributed pass, grouped by
    * input_file_name) — the data-skipping index [[readPruned]] uses.
    * At 100 TB this is what turns a key-range query from "scan the
    * table" into "scan the few files whose range overlaps".
    */
  def append(spark: SparkSession, df: DataFrame, table: String,
             statsCol: Option[String] = None): Int = {
    enforceSchema(spark, df, table)
    val sub = s"data-${java.util.UUID.randomUUID().toString.take(8)}"
    val subAbs = new File(table, sub).getAbsolutePath
    df.write.parquet(subAbs)
    val adds: Seq[String] = statsCol match {
      case None => newFiles(table, sub).map(p =>
        s"""{"op":"add","path":"$p"}""")
      case Some(c) =>
        val stats = spark.read.parquet(subAbs)
          .groupBy(input_file_name().as("f"))
          .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
          .collect() // file METADATA (one row per file), not data
          .map(r => (new File(new java.net.URI(r.getString(0))).getName,
            (r.getLong(1), r.getLong(2)))).toMap
        newFiles(table, sub).map { p =>
          val (lo, hi) = stats(new File(p).getName)
          s"""{"op":"add","path":"$p","min":$lo,"max":$hi,"col":"$c"}"""
        }
    }
    retryCommit(table)(commitLines(table, _, adds))
  }

  /** Optimistic-concurrency retry loop: re-read the latest version and
    * re-attempt the commit until it lands (bounded — 64 lost races in a
    * row means something is pathologically wrong, fail loudly). Correct
    * only for commits whose actions stay valid on a moved base (appends
    * and txn markers); read-modify-write commits like deleteWhere must
    * instead recompute from the fresh snapshot, so they surface the
    * conflict to the caller. */
  private def retryCommit(table: String)(attempt: Int => Int): Int = {
    var lastErr: ConcurrentCommit = null
    for (_ <- 0 until 64) {
      try return attempt(version(table))
      catch { case e: ConcurrentCommit => lastErr = e }
    }
    throw lastErr
  }

  /** Commit interval at which a checkpoint of the full live state is
    * folded next to the log (the published-format answer to "replay
    * 1e5 commits to plan one query"): reads start from the newest
    * checkpoint at or below the requested version and replay only the
    * suffix. Checkpoints are an OPTIMIZATION — every log file is kept,
    * so any version stays replayable without one. */
  private val CheckpointEvery = 16

  private def checkpointFile(table: String, v: Int): File =
    new File(logDir(table), f"$v%08d.checkpoint")

  private def maybeCheckpoint(table: String, v: Int): Unit =
    if (v > 0 && v % CheckpointEvery == 0) {
      val body = filesWithStats(table, Some(v)).map {
        case (p, None)           => s"""{"op":"add","path":"$p"}"""
        case (p, Some((lo, hi))) =>
          s"""{"op":"add","path":"$p","min":$lo,"max":$hi}"""
      }.mkString("", "\n", "\n")
      val tmp = Files.createTempFile(logDir(table).toPath, ".ckpt-", ".tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.TRUNCATE_EXISTING)
      try Files.createLink(checkpointFile(table, v).toPath, tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.deleteIfExists(tmp)
    }

  /** Live files with their recorded stats range (None when the add
    * carried no stats). Starts from the newest checkpoint <= asOf when
    * one exists; otherwise replays from commit 0. */
  def filesWithStats(table: String,
                     asOf: Option[Int] = None): Seq[(String, Option[(Long, Long)])] = {
    val latest = version(table)
    val v = asOf.getOrElse(latest)
    require(v >= 0 && v <= latest, s"version $v outside [0, $latest]")
    val ckpt = (v to 1 by -1).find(i => checkpointFile(table, i).exists())
    val live =
      scala.collection.mutable.LinkedHashMap[String, Option[(Long, Long)]]()
    val from = ckpt match {
      case Some(c) =>
        applyLines(Files.readAllLines(checkpointFile(table, c).toPath), live)
        c + 1
      case None => 0
    }
    for (i <- from to v)
      applyLines(Files.readAllLines(logFile(table, i).toPath), live)
    live.toSeq
  }

  /** Fold one file's action lines (hand-rolled two-key parse, no JSON
    * dependency) into the live map. */
  private def applyLines(lines: java.util.List[String],
      live: scala.collection.mutable.LinkedHashMap[String, Option[(Long, Long)]]): Unit =
    lines.forEach { l =>
      val op = l.split("\"op\":\"")(1).split("\"")(0)
      val path = l.split("\"path\":\"")(1).split("\"")(0)
      op match {
        case "add" =>
          val stats =
            if (l.contains("\"min\":"))
              Some((l.split("\"min\":")(1).split(",")(0).toLong,
                l.split("\"max\":")(1).split(",")(0).toLong))
            else None
          live += path -> stats
        case "remove" => live -= path
        case _        => ()
      }
    }

  /** Data-skipping read: prune files whose recorded [min, max] cannot
    * intersect [lo, hi] BEFORE Spark ever lists them — log-level
    * skipping on top of parquet's own row-group pruning. Files without
    * stats are conservatively kept. The residual filter still applies
    * (stats prune files, not rows). */
  def readPruned(spark: SparkSession, table: String, col0: String,
                 lo: Long, hi: Long): DataFrame = {
    val kept = filesWithStats(table).collect {
      case (p, None)                                   => p
      case (p, Some((mn, mx))) if mx >= lo && mn <= hi => p
    }
    val fs = kept.map(p => new File(table, p).getAbsolutePath)
    spark.read.parquet(fs: _*)
      .filter(col(col0) >= lo && col(col0) <= hi)
  }

  /** Transaction ids recorded in the log (see [[appendIdempotent]]). */
  def txns(table: String): Set[String] = {
    val latest = version(table)
    (0 to latest).flatMap { i =>
      val out = scala.collection.mutable.ListBuffer[String]()
      Files.readAllLines(logFile(table, i).toPath).forEach { l =>
        if (l.contains("\"op\":\"txn\""))
          out += l.split("\"path\":\"")(1).split("\"")(0)
      }
      out
    }.toSet
  }

  /** Exactly-once append: commit `df` tagged with `txn`, or do nothing
    * if that transaction id is already in the log. This is the sink
    * contract a streaming foreachBatch needs — Spark may re-invoke the
    * same (batchId, data) after a failure, and the re-delivery must not
    * double-append. The txn check and the commit race safely: if two
    * deliveries interleave, the loser's commit throws ConcurrentCommit,
    * it re-reads the log, sees its txn committed, and returns. Orphaned
    * data files from the losing writer are unreferenced by the log and
    * invisible to readers (vacuum-able), never double-counted.
    */
  def appendIdempotent(spark: SparkSession, df: DataFrame, table: String,
                       txn: String): Int = {
    if (txns(table).contains(txn)) return version(table)
    val sub = s"data-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(new File(table, sub).getAbsolutePath)
    val actions = ("txn" -> txn) +: newFiles(table, sub).map(("add", _))
    retryCommit(table) { base =>
      if (txns(table).contains(txn)) base // a racing delivery won: no-op
      else commit(table, base, actions)
    }
  }

  /** File-granular copy-on-write delete: rewrite only the files that
    * contain matching rows; everything else carries over by reference
    * in the log. Returns the new version (unchanged if nothing matched).
    */
  def deleteWhere(spark: SparkSession, table: String,
                  pred: org.apache.spark.sql.Column): Int = {
    val base = version(table)
    val snap = read(spark, table, Some(base))
    val tablePath = new File(table).toPath.toAbsolutePath
    val affected = snap.filter(pred)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)) // file METADATA, not data
      .map(u => tablePath.relativize(
        Paths.get(new java.net.URI(u)).toAbsolutePath).toString)
      .toSeq
    if (affected.isEmpty) return base
    val affectedAbs = affected.map(p => new File(table, p).getAbsolutePath)
    val survivors = spark.read.parquet(affectedAbs: _*).filter(!pred)
    val sub = s"data-${java.util.UUID.randomUUID().toString.take(8)}"
    survivors.write.parquet(new File(table, sub).getAbsolutePath)
    val actions = affected.map(("remove", _)) ++
      newFiles(table, sub).map(("add", _))
    commit(table, base, actions) // conflict => caller retries from snapshot
  }

  /** File-granular MERGE (upsert): matched keys take the update row's
    * values, unmatched update keys insert — and ONLY the files that
    * contain a matched key are rewritten (discovered with a left-semi
    * join at file grain); every other file carries over by reference.
    * This is the log-backed upgrade of the full-outer-join COW upsert:
    * at 100 TB a trickle of updates rewrites the few overlapping files,
    * not the table. Conflicts surface to the caller (read-modify-write
    * cannot blindly retry on a moved base). */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            key: String): Int = {
    enforceSchema(spark, updates, table)
    val base = version(table)
    val snap = read(spark, table, Some(base))
    val tablePath = new File(table).toPath.toAbsolutePath
    // input_file_name must bind to the snapshot's scan BEFORE the join
    // introduces a second file source (Spark rejects it as ambiguous
    // otherwise)
    val affected = snap.withColumn("__file", input_file_name())
      .join(updates.select(col(key)), Seq(key), "left_semi")
      .select(col("__file").as("f")).distinct()
      .collect().map(_.getString(0)) // file METADATA, not data
      .map(u => tablePath.relativize(
        Paths.get(new java.net.URI(u)).toAbsolutePath).toString)
      .toSeq
    val sub = s"data-${java.util.UUID.randomUUID().toString.take(8)}"
    val newData =
      if (affected.isEmpty) updates // pure insert
      else {
        val affectedAbs = affected.map(p => new File(table, p).getAbsolutePath)
        spark.read.parquet(affectedAbs: _*)
          .join(updates.select(col(key)), Seq(key), "left_anti")
          .select(snap.columns.map(col): _*)
          .unionByName(updates.select(snap.columns.map(col): _*))
      }
    newData.write.parquet(new File(table, sub).getAbsolutePath)
    val actions = affected.map(("remove", _)) ++
      newFiles(table, sub).map(("add", _))
    commit(table, base, actions)
  }

  /** ACID tables enforce their schema on write: an append whose shape
    * drifts from the table's (names + types; nullability is advisory)
    * fails LOUDLY at commit time instead of poisoning every future read
    * — the failure mode schemaless parquet directories are notorious
    * for. Evolution would be an explicit log action; out of scope. */
  private def enforceSchema(spark: SparkSession, df: DataFrame,
                            table: String): Unit = {
    if (version(table) < 0) return
    val existing = read(spark, table).schema
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(existing) == shape(df.schema),
      s"schema drift rejected: table has ${existing.simpleString}, " +
        s"append has ${df.schema.simpleString}")
  }

  /** Delete data files no LIVE OR HISTORICAL version references (failed
    * writers' orphans) plus, when `retainVersions` is given, files only
    * referenced by versions older than the retention horizon — after
    * which time travel below the horizon is gone (the log entries stay
    * as an audit record). Returns the deleted relative paths. The
    * deletion order is safe under concurrent readers of RETAINED
    * versions: a file is only removed once no retained snapshot can
    * resolve to it.
    */
  def vacuum(table: String, retainVersions: Int = Int.MaxValue): Seq[String] = {
    val latest = version(table)
    val floor = math.max(0, latest - math.max(0, retainVersions - 1))
    val referenced = (floor to latest).flatMap(v => files(table, Some(v))).toSet
    val tableDir = new File(table).toPath.toAbsolutePath
    val onDisk = {
      val out = scala.collection.mutable.ListBuffer[String]()
      Files.walk(tableDir).forEach { p =>
        val rel = tableDir.relativize(p).toString
        if (rel.endsWith(".parquet") && !rel.startsWith("_txlog")) out += rel
      }
      out.toList
    }
    val doomed = onDisk.filterNot(referenced)
    doomed.foreach(p => Files.deleteIfExists(tableDir.resolve(p)))
    doomed
  }

  private def newFiles(table: String, sub: String): Seq[String] = {
    val d = new File(table, sub).listFiles()
    require(d != null, s"no files written under $sub")
    d.filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
      .map(f => s"$sub/${f.getName}").sorted.toSeq
  }
}
