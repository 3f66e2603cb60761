package graft.operators

import java.io.File
import java.nio.file.{FileAlreadyExistsException, Files, Path}

import org.apache.spark.sql.SparkSession

/** Exactly-once APPEND protocol for managed (bucketed) catalog tables
  * — the [[TxLog.appendIdempotent]] discipline applied where the
  * storage must stay a plain bucketed parquet table (so bucket-join
  * plans keep consuming the layout with no exchange on the index
  * side) and the log-backed format is not an option. TxLog gets
  * exactly-once from ONE atomic commit point (the log-line append);
  * here the commit point is the atomic creation of a txn MARKER file
  * under `_graft_txn/` inside the table location — `_`-prefixed paths
  * are invisible to Spark's file index, so markers never surface as
  * data.
  *
  * Protocol per (table, txn):
  *   1. `<txn>.committed` exists → the batch is already in: no-op.
  *      This alone closes sequential re-delivery from any JVM.
  *   2. Atomically create `<txn>.inflight` (`Files.createFile` — the
  *      cross-process AND cross-thread mutex, replacing the JVM-local
  *      TrieMap guard this protocol superseded). The winner HEARTBEATS
  *      the marker (touches its mtime every `pollMs/20`) while it runs
  *      the append (Spark's parquet job commit is all-or-nothing at
  *      the driver: task files move into place at job commit), then
  *      creates `.committed` — the durable commit record. If the
  *      append THROWS, the winner deletes `.inflight` before
  *      rethrowing, so a retry reacquires the mutex immediately
  *      instead of burning a full recovery poll against a ghost.
  *   3. The loser waits on `.committed`. A winner that is merely SLOW
  *      is distinguished from a dead one by the heartbeat: takeover is
  *      gated on the `.inflight` mtime being STALE (older than
  *      `pollMs`, i.e. ≥20 missed heartbeats) — a live writer blocks
  *      losers indefinitely, which is what exactly-once requires. If
  *      `.inflight` vanishes without a commit record (a failed winner
  *      cleaned up), the loser retries acquisition from the top. Only
  *      a timed-out wait WITH a stale marker recovers: `presentRows()`
  *      (caller predicate counting the batch's rows in the table)
  *      against `expectedRows()` decides whether the orphaned append
  *      landed before the crash — complete → just write `.committed`;
  *      absent → take over the append under a second `.recover` mutex
  *      (itself heartbeated, so a third delivery waits rather than
  *      declaring the recoverer dead). A partial landing is impossible
  *      under job-commit atomicity, so it raises instead of risking a
  *      silent double-append.
  *
  * Delivered TWICE — sequentially, concurrently, or from two JVMs —
  * the table holds exactly ONE copy of the batch (double-delivery,
  * failed-winner, slow-winner, and crash-recovery paths unit-tested
  * in TxnMarkerSpec).
  *
  * ==Storage atomicity contract==
  * The mutex is `Files.createFile`, which is atomic-or-throws on any
  * POSIX filesystem — the local FS of this sandbox, and equally HDFS
  * (`create` without overwrite is an atomic namespace operation at
  * the NameNode). On an OBJECT STORE (S3/GCS/ABFS — the realistic
  * 100 TB home of a managed table) a plain PUT is last-writer-wins,
  * NOT a mutex: deploying there requires swapping the marker create
  * for a conditional put (S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`, ABFS lease/ETag), which restores the same
  * win-or-observe semantics; without it the protocol degrades to
  * best-effort and loses its concurrency guarantee. That swap is an
  * injection point, not a comment: pass a [[TxnMarker.MarkerCreate]]
  * to [[appendOnce]] (default [[TxnMarker.LocalFsMarkerCreate]]) and
  * both mutexes ride the injected primitive. Residual fencing
  * caveat even with atomic create: a writer FROZEN long enough to go
  * heartbeat-stale and then resurrected can still complete its append
  * after a recoverer took over (the classic lease limitation). The
  * heartbeat shrinks that window from "any append slower than
  * `pollMs`" to "a ≥`pollMs` full-process freeze"; closing it
  * entirely needs staged output plus a conditional-rename commit,
  * which plain bucketed-parquet `saveAsTable` appends cannot express
  * — size `pollMs` against worst-case GC/preemption pauses.
  */
object TxnMarker {

  /** The atomic-create primitive the whole protocol rests on —
    * extracted as a strategy so the object-store deployment posture
    * in the contract above is CODE, not a comment: swap
    * [[LocalFsMarkerCreate]] for a conditional-put implementation
    * (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, ABFS
    * lease/ETag) and every mutex in the protocol — `.inflight` and
    * `.recover` alike — carries that store's win-or-observe
    * semantics. The contract an implementation must honor: of any
    * set of concurrent `create(p)` calls for the same path, EXACTLY
    * ONE returns true (it created the marker); all others return
    * false and the marker exists when they do. (A racing mock
    * implementation is unit-tested in TxnMarkerSpec — the losing
    * racer must observe, never double-create.) */
  trait MarkerCreate {
    def create(p: Path): Boolean
  }

  /** `Files.createFile` — atomic-or-throws on POSIX filesystems and
    * HDFS (see the storage contract above); the default. */
  object LocalFsMarkerCreate extends MarkerCreate {
    def create(p: Path): Boolean =
      try { Files.createFile(p); true }
      catch { case _: FileAlreadyExistsException => false }
  }

  /** True iff `txn` already holds its durable commit record under
    * `tableDir` — the cheap fast path a caller can consult BEFORE
    * materializing the batch it would hand to [[appendOnce]] (which
    * re-checks internally; this is an optimization seam, not a
    * correctness one — a re-delivered streaming batch should not pay
    * tokenize/route + a localCheckpoint just to be no-op'd). */
  def isCommitted(tableDir: File, txn: String): Boolean =
    Files.exists(new File(new File(tableDir, "_graft_txn"),
      s"$txn.committed").toPath)

  /** Append `doAppend`'s batch into the table at `tableDir` exactly
    * once under transaction id `txn`. `presentRows`/`expectedRows`
    * are consulted only on the crash-recovery path (a stale-marker
    * timeout for a dead writer's commit record). `pollMs` bounds both
    * the losing delivery's wait-per-cycle AND the heartbeat staleness
    * threshold beyond which an in-flight writer is presumed dead.
    */
  def appendOnce(tableDir: File, txn: String,
                 doAppend: () => Unit,
                 presentRows: () => Long,
                 expectedRows: () => Long,
                 pollMs: Long = 120000L,
                 marker: MarkerCreate = LocalFsMarkerCreate): Unit = {
    val dir = new File(tableDir, "_graft_txn")
    dir.mkdirs()
    val committed = new File(dir, s"$txn.committed").toPath
    if (Files.exists(committed)) return
    val inflight = new File(dir, s"$txn.inflight").toPath
    val won = marker.create(inflight)
    if (won) {
      val hb = startHeartbeat(inflight, pollMs)
      try doAppend()
      catch {
        case t: Throwable =>
          // release the mutex so a retry reacquires instantly instead
          // of waiting out a recovery poll against a ghost writer
          stopHeartbeat(hb)
          Files.deleteIfExists(inflight)
          throw t
      }
      stopHeartbeat(hb)
      commitMarker(committed)
      Files.deleteIfExists(inflight): Unit
    } else {
      waitOrRecover(dir, txn, committed, inflight, tableDir,
        doAppend, presentRows, expectedRows, pollMs, marker)
    }
  }

  /** Daemon thread refreshing `p`'s mtime every `pollMs/20` (floor
    * 50 ms) — the liveness signal that gates takeover. Touch-only: a
    * marker someone deleted is never resurrected. */
  private def startHeartbeat(p: Path, pollMs: Long): Thread = {
    val interval = math.max(50L, pollMs / 20)
    val t = new Thread(() => {
      var run = true
      while (run) {
        // a transient FS error (or the exists/set TOCTOU window) must
        // NOT kill the beat: a silently dead heartbeat lets a loser
        // declare a live writer stale and re-run its append — the
        // exact double-append this thread exists to prevent. Skip the
        // failed beat and keep beating; only interruption exits.
        try {
          Thread.sleep(interval)
          if (Files.exists(p)) {
            Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis()))
          }
        } catch {
          case _: InterruptedException => run = false
          case scala.util.control.NonFatal(_) => ()
        }
      }
    }, s"graft-txn-heartbeat-${p.getFileName}")
    t.setDaemon(true)
    t.start()
    t
  }

  private def stopHeartbeat(t: Thread): Unit = {
    t.interrupt()
    t.join(5000)
  }

  /** mtime older than `ms` (a vanished file is not stale — the caller
    * handles absence as its own case first). */
  private def isStale(p: Path, ms: Long): Boolean =
    try System.currentTimeMillis() -
      Files.getLastModifiedTime(p).toMillis > ms
    catch { case _: java.io.IOException => false }

  /** The losing delivery's wait loop: exit on the commit record;
    * retry acquisition if the in-flight marker vanished uncommitted
    * (failed winner cleaned up); recover only once the wait has run a
    * full `pollMs` AND the marker is heartbeat-stale. A fresh marker
    * past the timeout means a live-but-slow writer: keep waiting —
    * blocking on a live writer is the exactly-once contract. */
  private def waitOrRecover(dir: File, txn: String,
                            committed: Path, inflight: Path,
                            tableDir: File,
                            doAppend: () => Unit,
                            presentRows: () => Long,
                            expectedRows: () => Long,
                            pollMs: Long,
                            marker: MarkerCreate): Unit = {
    val start = System.nanoTime()
    while (true) {
      if (Files.exists(committed)) return
      if (!Files.exists(inflight)) {
        // winner failed and released the mutex (or committed — the
        // retry sees `.committed` and no-ops): take it from the top
        appendOnce(tableDir, txn, doAppend, presentRows, expectedRows,
          pollMs, marker)
        return
      }
      val waitedMs = (System.nanoTime() - start) / 1000000L
      if (waitedMs > pollMs && isStale(inflight, pollMs)) {
        recover(dir, txn, committed, doAppend, presentRows,
          expectedRows, pollMs, marker)
        return
      }
      Thread.sleep(50)
    }
  }

  private def commitMarker(committed: Path): Unit =
    try Files.createFile(committed): Unit
    catch { case _: FileAlreadyExistsException => () }

  /** The in-flight writer is presumed dead (its `.inflight` marker
    * went heartbeat-stale with no commit record). Decide from the
    * DATA whether its append landed, under a `.recover` mutex so two
    * stalled deliveries cannot both take over; the recoverer
    * heartbeats its lock so a third delivery waits instead of
    * declaring the recovery itself dead. */
  private def recover(dir: File, txn: String,
                      committed: Path,
                      doAppend: () => Unit,
                      presentRows: () => Long,
                      expectedRows: () => Long,
                      pollMs: Long,
                      marker: MarkerCreate): Unit = {
    val recoverLock = new File(dir, s"$txn.recover").toPath
    val won = marker.create(recoverLock)
    if (!won) {
      // a sibling recoverer is at work; wait while it is live, give up
      // only if it too goes stale without committing
      val start = System.nanoTime()
      while (!Files.exists(committed)) {
        if (!Files.exists(recoverLock)) {
          if (Files.exists(committed)) return
          throw new IllegalStateException(
            s"txn $txn: recovery elsewhere released its lock uncommitted")
        }
        val waitedMs = (System.nanoTime() - start) / 1000000L
        if (waitedMs > pollMs && isStale(recoverLock, pollMs)) {
          throw new IllegalStateException(
            s"txn $txn: recovery in progress elsewhere but never committed")
        }
        Thread.sleep(50)
      }
      return
    }
    val hb = startHeartbeat(recoverLock, pollMs)
    try {
      val (present, expected) = (presentRows(), expectedRows())
      if (present == expected) () // dead writer's append landed whole
      else if (present == 0L) doAppend()
      else throw new IllegalStateException(
        s"txn $txn: partial batch in table ($present of $expected rows)" +
          " — job-commit atomicity violated, refusing to re-append")
      commitMarker(committed)
    } finally {
      stopHeartbeat(hb)
      Files.deleteIfExists(recoverLock): Unit
    }
  }

  /** Location of managed table `tbl` under the session warehouse —
    * the same path derivation the write-once artifact helper uses. */
  def managedTableDir(s: SparkSession, tbl: String): File =
    new File(new File(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath), tbl)

  /** Recursive delete, tolerant of concurrent removal: `listFiles`
    * returns null when the directory vanishes between the isDirectory
    * check and the listing (two processes vacuuming the same stale
    * artifact) — treat it as already-gone rather than NPE. The ONE
    * copy of the helper the codebase's five prior inline clones
    * collapsed into. */
  def rmTree(f: File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rmTree)
    }
    f.delete(): Unit
  }
}
