package graft

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SessionTimers

/** Timer + TTL surface of `transformWithState` (the round-1 untested
  * surface): watermark-driven event-time timers closing inactivity
  * sessions, timer replacement on new activity, state eviction after
  * close, and TTL-based state expiry.
  */
class SessionTimersSpec extends SparkSpec {
  // RocksDB + checksum workaround shared via SparkSpec.withRocksDb

  test("event-time timers close sessions when the watermark passes lastSeen+gap") {
    import spark.implicits._
    withRocksDb {
      val mem = MemoryStream[(String, java.sql.Timestamp)](spark)
      val ds = mem.toDF().toDF("userId", "eventTime")
        .withWatermark("eventTime", "0 seconds")
        .select(col("userId"), unix_millis(col("eventTime")).as("ms"))
        .as[(String, Long)]
      val q = SessionTimers.inactivitySessions(spark, ds, gapMs = 5000)
        .writeStream.format("memory").queryName("timer_sessions")
        .outputMode("append").start()
      try {
        def ev(u: String, sec: Int) =
          (u, java.sql.Timestamp.from(java.time.Instant.parse(f"2025-08-03T13:00:$sec%02dZ")))
        // a: events at 0,1 — timer set for 1+5=6; b: event at 2 — timer at 7
        mem.addData(Seq(ev("a", 0), ev("a", 1), ev("b", 2)))
        q.processAllAvailable()
        // a@4 is within the gap: timer must MOVE to 9, not fire at 6
        mem.addData(Seq(ev("a", 4)))
        q.processAllAvailable()
        // watermark -> 8: b's timer (7) fires, a's (9) must not
        mem.addData(Seq(ev("c", 8)))
        q.processAllAvailable()
        val afterB = spark.table("timer_sessions").as[SessionClose].collect()
        assert(afterB.map(_.userId).toSet === Set("b"),
          s"only b is quiet past its gap; got ${afterB.toSeq}")
        // watermark -> 40: a (timer 9) and c (timer 13) both close
        mem.addData(Seq(ev("z", 40)))
        q.processAllAvailable()
        val all = spark.table("timer_sessions").as[SessionClose].collect()
          .map(s => s.userId -> s).toMap
        assert(all.keySet === Set("a", "b", "c"))
        assert(all("a").events === 3 && all("a").firstMs % 100000 === 0L &&
          all("a").lastMs - all("a").firstMs === 4000L,
          s"a's session spans 0..4 with 3 events; got ${all("a")}")
        assert(all("b").events === 1)
        // state evicted on close: a new event for b opens a FRESH session
        mem.addData(Seq(ev("b", 45)))
        q.processAllAvailable()
        mem.addData(Seq(ev("z2", 59)))
        q.processAllAvailable()
        val reopened = spark.table("timer_sessions").as[SessionClose].collect()
          .filter(_.userId == "b").sortBy(_.firstMs)
        assert(reopened.length === 2)
        assert(reopened(1).events === 1, "closed state must not leak into the next session")
      } finally q.stop()
    }
  }

  test("open sessions and their timers survive a checkpoint restart (changelog mode)") {
    import spark.implicits._
    withChangelogRocksDb {
      val out = tempDir("timer_restart_out").toPath.toString
      val ckpt = tempDir("timer_restart_ckpt").toPath.toString
      val mem = MemoryStream[(String, java.sql.Timestamp)](spark)
      def start() = {
        val ds = mem.toDF().toDF("userId", "eventTime")
          .withWatermark("eventTime", "0 seconds")
          .select(col("userId"), unix_millis(col("eventTime")).as("ms"))
          .as[(String, Long)]
        SessionTimers.inactivitySessions(spark, ds, gapMs = 5000)
          .toDF().writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
      }
      def ev(u: String, sec: Int) =
        (u, java.sql.Timestamp.from(java.time.Instant.parse(f"2025-08-03T13:00:$sec%02dZ")))
      val q1 = start()
      // a's session is OPEN (2 events, timer at 1+5=6) when the query is
      // killed — session aggregate AND registered timer live only in ckpt
      try { mem.addData(Seq(ev("a", 0), ev("a", 1))); q1.processAllAvailable() }
      finally q1.stop()
      val q2 = start()
      try {
        // within the gap: the restored timer must MOVE to 9, the restored
        // aggregate must extend to 3 events
        mem.addData(Seq(ev("a", 4)))
        q2.processAllAvailable()
        assert(spark.read.schema(
          "userId STRING, firstMs LONG, lastMs LONG, events LONG")
          .parquet(out).isEmpty, "no close may fire while a is active")
        // watermark -> 40: the moved timer fires; the close row carries
        // the FULL pre-kill + post-restart session
        mem.addData(Seq(ev("z", 40)))
        q2.processAllAvailable()
        val a = spark.read.parquet(out).as[SessionClose].collect()
          .filter(_.userId == "a")
        assert(a.length === 1)
        assert(a.head.events === 3 && a.head.lastMs - a.head.firstMs === 4000L,
          s"restored session must span pre-kill and post-restart events; got ${a.head}")
      } finally q2.stop()
    }
  }

  test("value state with TTL expires: counter restarts after the TTL elapses") {
    import spark.implicits._
    withRocksDb {
      val mem = MemoryStream[(String, Long)](spark)
      // TTL is wide (10 s) relative to the pre-expiry steps so a GC/CI
      // pause between addData and its micro-batch can't lapse the TTL
      // early and flip the within-TTL continuation to a restart.
      val q = SessionTimers.ttlCounts(spark, mem.toDS(), Duration.ofSeconds(10))
        .writeStream.format("memory").queryName("ttl_counts")
        // pace the no-data batches a processing-time-mode query runs
        // continuously (they only exist to age state out)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
        .outputMode("update").start()
      // A processing-time TWS query always requests another micro-batch
      // (to age state), so `noNewData` never latches and
      // processAllAvailable would block forever — poll the sink instead.
      def awaitRows(n: Int): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("ttl_counts").count() < n &&
               System.nanoTime() < deadline) Thread.sleep(100)
        assert(spark.table("ttl_counts").count() >= n,
          s"timed out waiting for $n sink rows")
      }
      try {
        mem.addData(Seq(("k", 1L), ("k", 2L)))
        awaitRows(1)
        // within TTL: counter continues (2 -> 3)
        mem.addData(Seq(("k", 3L)))
        awaitRows(2)
        Thread.sleep(12500) // let the 10 s TTL lapse
        mem.addData(Seq(("k", 4L)))
        awaitRows(3)
        val counts = spark.table("ttl_counts").as[(String, Long)].collect()
          .map(_._2).toSet
        // without expiry the last batch would emit 4; expiry restarts at 1
        assert(counts === Set(2L, 3L, 1L),
          s"state written before the TTL horizon must read as absent; got $counts")
      } finally q.stop()
    }
  }
}
