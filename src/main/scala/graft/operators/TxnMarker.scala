package graft.operators

import java.io.File
import java.nio.file.{FileAlreadyExistsException, Files}

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
  *      TrieMap guard this protocol superseded). The winner runs the
  *      append (Spark's parquet job commit is all-or-nothing at the
  *      driver: task files move into place at job commit), then
  *      creates `.committed` — the durable commit record.
  *   3. The loser polls for `.committed` while the winner works. If
  *      the winner DIED mid-append the poll times out and the loser
  *      recovers: `presentRows()` (caller predicate counting the
  *      batch's rows in the table) against `expectedRows()` decides
  *      whether the orphaned append landed before the crash —
  *      complete → just write `.committed`; absent → take over the
  *      append under a second `.recover` mutex. A partial landing is
  *      impossible under job-commit atomicity, so it raises instead
  *      of risking a silent double-append.
  *
  * Delivered TWICE — sequentially, concurrently, or from two JVMs —
  * the table holds exactly ONE copy of the batch (double-delivery and
  * crash-recovery paths unit-tested in OperatorSpec).
  */
object TxnMarker {

  /** Append `doAppend`'s batch into the table at `tableDir` exactly
    * once under transaction id `txn`. `presentRows`/`expectedRows`
    * are consulted only on the crash-recovery path (a timed-out poll
    * for a dead writer's commit marker). `pollMs` bounds how long a
    * losing delivery waits for the in-flight winner.
    */
  def appendOnce(tableDir: File, txn: String,
                 doAppend: () => Unit,
                 presentRows: () => Long,
                 expectedRows: () => Long,
                 pollMs: Long = 120000L): Unit = {
    val dir = new File(tableDir, "_graft_txn")
    dir.mkdirs()
    val committed = new File(dir, s"$txn.committed").toPath
    if (Files.exists(committed)) return
    val inflight = new File(dir, s"$txn.inflight").toPath
    val won =
      try { Files.createFile(inflight); true }
      catch { case _: FileAlreadyExistsException => false }
    if (won) {
      doAppend()
      commitMarker(committed)
      Files.deleteIfExists(inflight): Unit
    } else {
      // another delivery holds the append; wait for its commit record
      if (!pollFor(committed, pollMs)) recover(
        dir, txn, committed, doAppend, presentRows, expectedRows, pollMs)
    }
  }

  private def commitMarker(committed: java.nio.file.Path): Unit =
    try Files.createFile(committed): Unit
    catch { case _: FileAlreadyExistsException => () }

  private def pollFor(p: java.nio.file.Path, ms: Long): Boolean = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (!Files.exists(p)) {
      if (System.nanoTime() > deadline) return false
      Thread.sleep(50)
    }
    true
  }

  /** The in-flight writer is presumed dead (its `.inflight` marker
    * outlived `pollMs` with no commit record). Decide from the DATA
    * whether its append landed, under a `.recover` mutex so two
    * stalled deliveries cannot both take over. */
  private def recover(dir: File, txn: String,
                      committed: java.nio.file.Path,
                      doAppend: () => Unit,
                      presentRows: () => Long,
                      expectedRows: () => Long,
                      pollMs: Long): Unit = {
    val recoverLock = new File(dir, s"$txn.recover").toPath
    val won =
      try { Files.createFile(recoverLock); true }
      catch { case _: FileAlreadyExistsException => false }
    if (!won) {
      // a sibling recoverer is at work; its commit is the only exit
      if (!pollFor(committed, pollMs)) throw new IllegalStateException(
        s"txn $txn: recovery in progress elsewhere but never committed")
      return
    }
    try {
      val (present, expected) = (presentRows(), expectedRows())
      if (present == expected) () // dead writer's append landed whole
      else if (present == 0L) doAppend()
      else throw new IllegalStateException(
        s"txn $txn: partial batch in table ($present of $expected rows)" +
          " — job-commit atomicity violated, refusing to re-append")
      commitMarker(committed)
    } finally Files.deleteIfExists(recoverLock): Unit
  }

  /** Location of managed table `tbl` under the session warehouse —
    * the same path derivation the write-once artifact helper uses. */
  def managedTableDir(s: SparkSession, tbl: String): File =
    new File(new File(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath), tbl)
}
