package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.SessionClose

/** Timer-driven custom session state on Spark 4's `transformWithState` —
  * the ProcessFunction-style sibling of the built-in
  * [[StreamingWindows.userSessions session_window]] aggregation. Where
  * `session_window` merges window ranges inside Spark's aggregation
  * state, this operator owns the state machine explicitly: one
  * `ValueState` per user plus an EVENT-TIME TIMER at
  * `lastSeen + gap`; the session closes (emits + clears) when the
  * watermark passes the timer, exactly once per quiet period.
  *
  * This is the template for custom state the built-ins can't express
  * (reference's windowing surface is SURVEY §2.4; Flink's equivalent is
  * `KeyedProcessFunction` + `ctx.timerService`): state partitions by key
  * across executors, timers live in the state store (RocksDB) and
  * survive checkpoint restarts, and eviction is watermark-driven — no
  * unbounded state at 100 TB event volume.
  */
object SessionTimers {

  /** Per-user inactivity sessions. Input rows are (userId, eventMillis);
    * the caller must have a watermark on the event-time column so
    * TimeMode.EventTime has a watermark to advance timers with.
    */
  class InactivitySessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, (String, Long), SessionClose] {
    // (events, firstMs, lastMs) for the open session
    @transient private var state: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("session",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[SessionClose] = {
      val ts = rows.map(_._2).toArray
      val (events, first, last) =
        if (state.exists()) state.get() else (0L, Long.MaxValue, Long.MinValue)
      val newLast = math.max(last, ts.max)
      state.update((events + ts.length, math.min(first, ts.min), newLast))
      // one live timer per key: replace the stale expiry with lastSeen+gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(newLast + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClose] = {
      val out =
        if (state.exists()) {
          val (events, first, last) = state.get()
          Iterator.single(SessionClose(key, events, first, last))
        } else Iterator.empty
      state.clear() // session closed — state evicted, next event starts fresh
      out
    }
  }

  /** Wire the processor: `ds` must already carry the watermark. */
  def inactivitySessions(spark: SparkSession, ds: Dataset[(String, Long)],
      gapMs: Long): Dataset[SessionClose] = {
    import spark.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new InactivitySessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** State TTL demo operator: a per-key running event counter whose state
    * expires `ttl` after its last write (TTLConfig + processing-time
    * mode). At 100 TB this is the pattern that keeps abandoned keys from
    * accumulating forever without any explicit cleanup logic: the state
    * store ages them out.
    */
  class TtlCounterProcessor(ttl: Duration)
      extends StatefulProcessor[String, (String, Long), (String, Long)] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("cnt", Encoders.scalaLong,
        TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[(String, Long)] = {
      // an expired value reads as absent — the counter restarts
      val prev = if (state.exists()) state.get() else 0L
      val next = prev + rows.size
      state.update(next)
      Iterator.single(key -> next)
    }
  }

  def ttlCounts(spark: SparkSession, ds: Dataset[(String, Long)],
      ttl: Duration): Dataset[(String, Long)] = {
    import spark.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new TtlCounterProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
