package graft

import java.nio.file.Files

import graft.operators.TxnMarker
import org.scalatest.funsuite.AnyFunSuite

/** The exactly-once marker protocol guarding managed-table appends
  * (the IVF index upsert's commit discipline). Exercises every path a
  * repeated delivery can take: sequential redelivery, a concurrent
  * race, a writer that died BEFORE its append landed, one that died
  * AFTER, and the (atomicity-violating) partial landing that must
  * refuse to re-append. */
class TxnMarkerSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir() = Files.createTempDirectory("txnmarker").toFile

  test("sequential double delivery appends exactly once") {
    val dir = freshDir()
    val appends = new java.util.concurrent.atomic.AtomicInteger()
    def deliver(): Unit = TxnMarker.appendOnce(dir, "b1",
      doAppend = () => { appends.incrementAndGet(); () },
      presentRows = () => appends.get().toLong,
      expectedRows = () => 1L)
    deliver(); deliver(); deliver()
    assert(appends.get() === 1)
  }

  test("concurrent double delivery appends exactly once") {
    val dir = freshDir()
    val appends = new java.util.concurrent.atomic.AtomicInteger()
    val slowAppend = () => {
      Thread.sleep(300) // hold the inflight mutex while the loser polls
      appends.incrementAndGet(); ()
    }
    val threads = (1 to 4).map { _ =>
      new Thread(() => TxnMarker.appendOnce(dir, "b1",
        doAppend = slowAppend,
        presentRows = () => appends.get().toLong,
        expectedRows = () => 1L))
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(appends.get() === 1)
  }

  test("recovery: writer died before its append -> takeover appends") {
    val dir = freshDir()
    val txnDir = new java.io.File(dir, "_graft_txn")
    txnDir.mkdirs()
    // simulate the dead writer: inflight marker, no data, no commit
    Files.createFile(new java.io.File(txnDir, "b1.inflight").toPath)
    val appends = new java.util.concurrent.atomic.AtomicInteger()
    TxnMarker.appendOnce(dir, "b1",
      doAppend = () => { appends.incrementAndGet(); () },
      presentRows = () => appends.get().toLong,
      expectedRows = () => 1L,
      pollMs = 200L)
    assert(appends.get() === 1)
    // and the recovery COMMITTED: a later delivery is a no-op
    TxnMarker.appendOnce(dir, "b1",
      doAppend = () => { appends.incrementAndGet(); () },
      presentRows = () => appends.get().toLong,
      expectedRows = () => 1L)
    assert(appends.get() === 1)
  }

  test("recovery: writer died after its append landed -> no re-append") {
    val dir = freshDir()
    val txnDir = new java.io.File(dir, "_graft_txn")
    txnDir.mkdirs()
    Files.createFile(new java.io.File(txnDir, "b1.inflight").toPath)
    val appends = new java.util.concurrent.atomic.AtomicInteger()
    TxnMarker.appendOnce(dir, "b1",
      doAppend = () => { appends.incrementAndGet(); () },
      presentRows = () => 1L, // the dead writer's batch IS in the table
      expectedRows = () => 1L,
      pollMs = 200L)
    assert(appends.get() === 0, "complete orphan batch must not re-append")
    assert(new java.io.File(txnDir, "b1.committed").isFile)
  }

  test("recovery: partial landing raises instead of double-appending") {
    val dir = freshDir()
    val txnDir = new java.io.File(dir, "_graft_txn")
    txnDir.mkdirs()
    Files.createFile(new java.io.File(txnDir, "b1.inflight").toPath)
    val e = intercept[IllegalStateException] {
      TxnMarker.appendOnce(dir, "b1",
        doAppend = () => (),
        presentRows = () => 1L,
        expectedRows = () => 2L,
        pollMs = 200L)
    }
    assert(e.getMessage.contains("partial"))
  }

  test("failed winner releases the mutex; a retry reacquires instantly") {
    val dir = freshDir()
    val txnDir = new java.io.File(dir, "_graft_txn")
    val appends = new java.util.concurrent.atomic.AtomicInteger()
    intercept[RuntimeException] {
      TxnMarker.appendOnce(dir, "b1",
        doAppend = () => throw new RuntimeException("job failed"),
        presentRows = () => 0L,
        expectedRows = () => 1L)
    }
    assert(!new java.io.File(txnDir, "b1.inflight").exists(),
      "a failed append must not leave its inflight marker behind")
    // the retry must win the mutex immediately — no recovery poll. An
    // absurdly large pollMs makes any recovery-path detour hang the test.
    val t0 = System.nanoTime()
    TxnMarker.appendOnce(dir, "b1",
      doAppend = () => { appends.incrementAndGet(); () },
      presentRows = () => appends.get().toLong,
      expectedRows = () => 1L,
      pollMs = 600000L)
    assert(appends.get() === 1)
    assert((System.nanoTime() - t0) / 1e9 < 30.0)
  }

  test("live-but-slow winner is NOT taken over (heartbeat beats pollMs)") {
    val dir = freshDir()
    val appends = new java.util.concurrent.atomic.AtomicInteger()
    // winner's append runs 4x the loser's pollMs: without the liveness
    // gate the loser would time out, see presentRows()==0, and re-run
    // the append — the ADVICE double-append. The heartbeat (pollMs/20,
    // floored at 50 ms) keeps the marker fresh, so the loser must WAIT.
    val winner = new Thread(() => TxnMarker.appendOnce(dir, "b1",
      doAppend = () => { Thread.sleep(800); appends.incrementAndGet(); () },
      presentRows = () => appends.get().toLong,
      expectedRows = () => 1L,
      pollMs = 200L))
    winner.start()
    Thread.sleep(100) // let the winner take the mutex
    TxnMarker.appendOnce(dir, "b1",
      doAppend = () => { appends.incrementAndGet(); () },
      presentRows = () => appends.get().toLong,
      expectedRows = () => 1L,
      pollMs = 200L)
    winner.join(30000)
    assert(appends.get() === 1,
      "loser must wait out a live slow winner, not re-append")
  }

  test("injected marker-create carries win-or-observe (racing conditional-put mock)") {
    val dir = freshDir()
    // mock object-store conditional put: the win/lose decision lives
    // in an external compare-and-set (the S3 If-None-Match semantics),
    // and the marker file is then written NON-atomically — so if the
    // protocol consulted the filesystem instead of the injected
    // strategy, two racers could both "win". The counters prove the
    // strategy's contract: of all concurrent creates, exactly one won
    // and every other racer observed.
    val puts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
    val wins = new java.util.concurrent.atomic.AtomicInteger()
    val losses = new java.util.concurrent.atomic.AtomicInteger()
    val condPut = new TxnMarker.MarkerCreate {
      def create(p: java.nio.file.Path): Boolean =
        if (puts.putIfAbsent(p.toString, java.lang.Boolean.TRUE) == null) {
          Files.write(p, Array.emptyByteArray)
          wins.incrementAndGet(); true
        } else { losses.incrementAndGet(); false }
    }
    val appends = new java.util.concurrent.atomic.AtomicInteger()
    val threads = (1 to 4).map { _ =>
      new Thread(() => TxnMarker.appendOnce(dir, "b1",
        doAppend = () => {
          Thread.sleep(200) // hold the mutex while losers race create()
          appends.incrementAndGet(); ()
        },
        presentRows = () => appends.get().toLong,
        expectedRows = () => 1L,
        marker = condPut))
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(appends.get() === 1)
    assert(wins.get() === 1, "exactly one racer may win the injected mutex")
    assert(losses.get() >= 1, "losing racers must observe, never re-create")
    assert(new java.io.File(new java.io.File(dir, "_graft_txn"),
      "b1.committed").isFile)
  }

  test("IVF index upsert delivered twice holds exactly one arrival batch") {
    import spark.implicits._
    // the real consumer: persistedIvfCellsUpserted routes its append
    // through the marker protocol — a second delivery (same JVM here;
    // the marker is durable, so any JVM) must be a no-op and the gated
    // row set must be byte-stable across deliveries
    val first = graft.queries.LlmSim.persistedIvfCellsUpserted(spark, sf)
      .select($"vec_id").as[Long].collect().sorted
    val second = graft.queries.LlmSim.persistedIvfCellsUpserted(spark, sf)
      .select($"vec_id").as[Long].collect().sorted
    assert(first.sameElements(second))
    val arrivals = first.count(_ >= 500000L)
    assert(arrivals > 0, "arrival batch must be present")
    assert(first.length === first.distinct.length,
      "no vec_id may appear twice (double-append would duplicate)")
  }

  test("maintenance commit delivered twice holds exactly one maintained epoch") {
    import spark.implicits._
    // the real cascade: a second delivery — sequential or concurrent —
    // must return the SAME committed epoch, duplicating nothing (the
    // within-JVM lock serializes; the durable marker carries the
    // cross-process case, same protocol the upsert tests exercise)
    val (c1, _) = graft.queries.LlmSim.maintainIvfCommit(spark, sf)
    val first = c1.select($"vec_id").as[Long].collect().sorted
    assert(first.length === first.distinct.length,
      "maintained cells hold a duplicated vec_id")
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        graft.queries.LlmSim.maintainIvfCommit(spark, sf); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    val (c2, _) = graft.queries.LlmSim.maintainIvfCommit(spark, sf)
    val second = c2.select($"vec_id").as[Long].collect().sorted
    assert(first.sameElements(second),
      "a repeated delivery changed the maintained epoch")
  }

  test("PQ index upsert delivered twice holds exactly one arrival batch") {
    import spark.implicits._
    // the coded-index twin of the cells upsert: same marker protocol,
    // distinct table + txn — both deliveries must agree byte-for-byte
    // and carry the arrival encodings exactly once
    val first = graft.queries.LlmSim.persistedPqIdxUpserted(spark, sf)
      .select($"vec_id").as[Long].collect().sorted
    val second = graft.queries.LlmSim.persistedPqIdxUpserted(spark, sf)
      .select($"vec_id").as[Long].collect().sorted
    assert(first.sameElements(second))
    val arrivals = first.count(_ >= 500000L)
    assert(arrivals > 0, "arrival encodings must be present")
    assert(first.length === first.distinct.length,
      "no vec_id may appear twice (double-append would duplicate)")
  }
}
