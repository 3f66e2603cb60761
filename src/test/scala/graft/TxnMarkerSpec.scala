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
