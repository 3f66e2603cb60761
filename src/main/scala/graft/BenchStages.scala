package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.io.{BufferedReader, File, FileReader}

/** Distills a Spark event log into a per-job-group stage-metrics table —
  * the attribution evidence for bench-time inflation (PLANS.md r7/r8:
  * three rounds of driver-box records showed per-query times 3-27x the
  * same-HEAD local numbers, with no way to tell scheduler delay from GC
  * from IO from compute). Bench tags every query's jobs with
  * `setJobGroup(queryName)`, so the event log's JobStart properties map
  * every stage - and hence every TaskEnd's metrics - back to the query
  * that ran it. This runs INSIDE Bench.main after `spark.stop()`: the
  * driver's own bench run self-produces `bench_stages.json` and deletes
  * the raw log (hundreds of MB; the distilled table is a few KB).
  *
  * Per group, summed over all runs of that query:
  *   - jobs / job_wall_s: job count and sum of JobEnd-JobStart wall time
  *     (driver-side planning/listing time is the bench-wall MINUS this)
  *   - tasks / task_s: task count and sum of per-task wall
  *   - run_s / gc_s: executor run time and JVM GC time inside it
  *   - fetch_wait_s: shuffle-read blocked time
  *   - sched_delay_s: per-task (wall - run - deser - resultSer -
  *     shuffleWrite), clamped at 0 - the scheduler/dispatch component
  *   - input_mb / sh_read_mb / sh_write_mb: bytes through the scan and
  *     the shuffle
  * Reading it: healthy compute has task_s ~= run_s, gc_s and
  * sched_delay_s near 0, and job_wall_s ~= task_s / cores. An inflated
  * box shows up as one dominant column: gc_s (memory pressure),
  * sched_delay_s (CPU contention from a co-tenant), fetch_wait_s or a
  * job_wall_s >> task_s/cores gap (IO stall / driver starvation).
  */
object BenchStages {

  private case class Agg(
      var jobs: Int = 0, var jobWallMs: Long = 0L,
      var tasks: Int = 0, var taskMs: Long = 0L,
      var runMs: Long = 0L, var gcMs: Long = 0L,
      var fetchWaitMs: Long = 0L, var schedDelayMs: Long = 0L,
      var inputBytes: Long = 0L, var shReadBytes: Long = 0L,
      var shWriteBytes: Long = 0L)

  /** Parse `logFile` and write the distilled per-group JSON to `outFile`.
    * Returns the number of groups seen. Never throws on malformed lines
    * (a live log's tail can be truncated mid-line). */
  def distill(logFile: File, outFile: File): Int = {
    val mapper = new ObjectMapper()
    val stageToGroup = scala.collection.mutable.Map[Int, String]()
    val jobToGroup = scala.collection.mutable.Map[Int, String]()
    val jobStartMs = scala.collection.mutable.Map[Int, Long]()
    val groups = scala.collection.mutable.LinkedHashMap[String, Agg]()
    def agg(g: String): Agg = groups.getOrElseUpdate(g, Agg())
    def opt(n: JsonNode, field: String): Option[JsonNode] =
      Option(n.get(field)).filterNot(_.isNull)
    def lng(n: JsonNode, field: String): Long =
      opt(n, field).map(_.asLong(0L)).getOrElse(0L)

    val rd = new BufferedReader(new FileReader(logFile))
    try {
      var line = rd.readLine()
      while (line != null) {
        try {
          val ev = mapper.readTree(line)
          opt(ev, "Event").map(_.asText("")).getOrElse("") match {
            case "SparkListenerJobStart" =>
              val jobId = lng(ev, "Job ID").toInt
              val group = opt(ev, "Properties")
                .flatMap(p => opt(p, "spark.jobGroup.id"))
                .map(_.asText("ungrouped")).getOrElse("ungrouped")
              jobToGroup(jobId) = group
              jobStartMs(jobId) = lng(ev, "Submission Time")
              opt(ev, "Stage IDs").foreach(_.forEach { sid =>
                stageToGroup(sid.asInt()) = group
              })
              agg(group).jobs += 1
            case "SparkListenerJobEnd" =>
              val jobId = lng(ev, "Job ID").toInt
              for (g <- jobToGroup.get(jobId); t0 <- jobStartMs.get(jobId)) {
                val t1 = lng(ev, "Completion Time")
                if (t1 > t0) agg(g).jobWallMs += t1 - t0
              }
            case "SparkListenerTaskEnd" =>
              val g = stageToGroup.getOrElse(lng(ev, "Stage ID").toInt,
                "ungrouped")
              val a = agg(g)
              opt(ev, "Task Info").foreach { ti =>
                val wall = lng(ti, "Finish Time") - lng(ti, "Launch Time")
                a.tasks += 1
                a.taskMs += math.max(0L, wall)
                opt(ev, "Task Metrics").foreach { tm =>
                  val run = lng(tm, "Executor Run Time")
                  val deser = lng(tm, "Executor Deserialize Time")
                  val rser = lng(tm, "Result Serialization Time")
                  a.runMs += run
                  a.gcMs += lng(tm, "JVM GC Time")
                  var shWriteMs = 0L
                  opt(tm, "Shuffle Write Metrics").foreach { w =>
                    shWriteMs = lng(w, "Shuffle Write Time") / 1000000L
                    a.shWriteBytes += lng(w, "Shuffle Bytes Written")
                  }
                  opt(tm, "Shuffle Read Metrics").foreach { r =>
                    a.fetchWaitMs += lng(r, "Fetch Wait Time")
                    a.shReadBytes +=
                      lng(r, "Local Bytes Read") + lng(r, "Remote Bytes Read")
                  }
                  opt(tm, "Input Metrics").foreach { i =>
                    a.inputBytes += lng(i, "Bytes Read")
                  }
                  a.schedDelayMs += math.max(0L,
                    wall - run - deser - rser - shWriteMs)
                }
              }
            case _ => ()
          }
        } catch { case _: Exception => () } // truncated / foreign line
        line = rd.readLine()
      }
    } finally rd.close()

    def s(ms: Long): String = f"${ms / 1e3}%.2f"
    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    val rows = groups.map { case (g, a) =>
      s""""$g":{"jobs":${a.jobs},"job_wall_s":${s(a.jobWallMs)},""" +
        s""""tasks":${a.tasks},"task_s":${s(a.taskMs)},""" +
        s""""run_s":${s(a.runMs)},"gc_s":${s(a.gcMs)},""" +
        s""""fetch_wait_s":${s(a.fetchWaitMs)},""" +
        s""""sched_delay_s":${s(a.schedDelayMs)},""" +
        s""""input_mb":${mb(a.inputBytes)},""" +
        s""""sh_read_mb":${mb(a.shReadBytes)},""" +
        s""""sh_write_mb":${mb(a.shWriteBytes)}}"""
    }
    java.nio.file.Files.write(outFile.toPath,
      rows.mkString("{\"groups\":{", ",", "}}")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    groups.size
  }

  /** Ad-hoc use: graft.BenchStages <event-log-file> [out.json] */
  def main(args: Array[String]): Unit = {
    val log = new File(args(0))
    val out = new File(args.lift(1).getOrElse("bench_stages.json"))
    val n = distill(log, out)
    println(s"distilled ${log.getName}: $n job groups -> ${out.getPath}")
  }
}
