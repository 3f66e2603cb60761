package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark-4 `transformWithState` processor: running (count, min-ts,
  * max-ts) per key through the new arbitrary-state API — typed
  * [[ValueState]] obtained from the processor handle, RocksDB-backed
  * state store. Mirrors the classic `mapGroupsWithState` formulation in
  * `q_stream_mapgroups` so the corpus covers BOTH stateful APIs with the
  * same monotone-recovery oracle (SURVEY.md §2B-9 arbitrary keyed
  * state). Input rows are (key, epoch-ms); output one updated row per
  * key per micro-batch.
  */
class RunningStatsProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("running",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (n, mn, mx) =
      if (st.exists()) st.get() else (0L, Long.MaxValue, Long.MinValue)
    rows.foreach { case (_, ms) =>
      n += 1
      mn = math.min(mn, ms)
      mx = math.max(mx, ms)
    }
    st.update((n, mn, mx))
    Iterator.single((key, n, mn, mx))
  }
}
