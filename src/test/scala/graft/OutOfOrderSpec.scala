package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Port of the reference's described-but-unshipped out-of-order dataset
  * (reference: src/main/resources/README.md:1-14; FIXTURES.md §2): events
  * arrive out of chronological order and the watermark decides which late
  * arrivals are aggregated vs discarded. Window size 30 s so the two
  * configured delays (the demo's 500 ms and the documented 1 min) give
  * DIFFERENT drop sets for the same arrival sequence:
  *  - "napoleon" is ~4 min late → dropped under both delays;
  *  - "marie" is ~55 s late → dropped at 500 ms, kept at 1 min.
  */
class OutOfOrderSpec extends SparkSpec {

  private def run(delay: String): Map[Long, Long] = {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
      .withWatermark("eventTime", delay)
    val name = s"ooo_${delay.replaceAll("[^a-z0-9]", "_")}"
    val q = df.groupBy(window(col("eventTime"), "30 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      def ev(u: String, t: String) = UserActivity(u, "login", s"2025-08-03T$t")
      // in-order arrivals up to 13:20:00
      mem.addData(Seq(
        ev("alice", "13:14:30Z"), ev("bob", "13:15:10Z"),
        ev("carl", "13:19:20Z"), ev("dave", "13:20:00Z")))
      q.processAllAvailable()
      // late arrivals: napoleon ~4min behind max, marie ~55s behind max
      mem.addData(Seq(ev("napoleon", "13:15:05Z"), ev("marie", "13:19:05Z")))
      q.processAllAvailable()
      // flush: push the watermark far past every open window
      mem.addData(Seq(ev("zz", "13:28:45Z"))); q.processAllAvailable()
      mem.addData(Seq(ev("zz", "13:28:46Z"))); q.processAllAvailable()
      spark.table(name).collect()
        .map(r => r.getTimestamp(0).toInstant.getEpochSecond -> r.getLong(1)).toMap
    } finally q.stop()
  }

  private def sec(t: String): Long =
    java.time.Instant.parse(s"2025-08-03T$t").getEpochSecond

  test("1-minute watermark: napoleon discarded, marie aggregated") {
    val got = run("1 minute")
    assert(got(sec("13:15:00Z")) === 1L, "napoleon must be dropped")
    assert(got(sec("13:19:00Z")) === 2L, "marie must be kept")
  }

  test("500 ms watermark (demo default): both late arrivals discarded") {
    val got = run("500 milliseconds")
    assert(got(sec("13:15:00Z")) === 1L)
    assert(got(sec("13:19:00Z")) === 1L, "marie must be dropped at 500 ms")
  }

  // ------------------------------------------------------------------
  // A5 session windows over the same out-of-order scenario (the
  // reference ships session windows only as a README goal, and its
  // rich out-of-order dataset is described but absent — reference
  // src/main/resources/README.md:1-14): the watermark decides whether a
  // late BRIDGE event merges two open sessions or is discarded, which
  // is the part of the drop pattern tumbling windows can't express.
  // Session lateness keys on the would-be session END: a late row is
  // discarded iff event_time + gap ≤ watermark (its session could no
  // longer change anything emitted), NOT iff event_time < watermark.
  // Gap 2 min, high-water event 13:22:50 (bob):
  //  - napoleon 13:14:45 → end 13:16:45, behind BOTH watermarks
  //    (1 min → 13:21:50; 500 ms → 13:22:49.5): dropped twice;
  //  - marie's bridge 13:20:45 → end 13:22:45: ahead of 13:21:50
  //    (kept at 1 min) but behind 13:22:49.5 (dropped at 500 ms).
  // Marie's own events 13:20:00 and 13:22:40 sit 2:40 apart — two
  // sessions — and the bridge lands within the 2-min gap of both.
  // ------------------------------------------------------------------

  private def runSessions(delay: String): Map[(String, Long), (Long, Long)] = {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
      .withWatermark("eventTime", delay)
    val name = s"ooo_sess_${delay.replaceAll("[^a-z0-9]", "_")}"
    val q = streaming.StreamingWindows.userSessions(df, gap = "2 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      def ev(u: String, t: String, a: String = "click") =
        UserActivity(u, a, s"2025-08-03T$t")
      // in-order: alice's two-event session, her later separate session,
      // marie's first session, bob pushing the high-water mark to 13:22:50
      mem.addData(Seq(
        ev("alice_wonderland", "13:14:30Z", "register"),
        ev("alice_wonderland", "13:15:10Z", "login"),
        ev("alice_wonderland", "13:19:20Z"),
        ev("marie_curie", "13:20:00Z", "login"),
        ev("bob_builder", "13:22:50Z", "register")))
      q.processAllAvailable() // watermark now 13:22:50 - delay
      // late arrivals (see header math): napoleon discarded under BOTH
      // delays; marie's 13:20:45 bridge kept at 1 min, dropped at
      // 500 ms; marie 13:22:40 is live either way (end 13:24:40)
      mem.addData(Seq(
        ev("napoleon_bonaparte", "13:14:45Z", "register"),
        ev("marie_curie", "13:20:45Z"),
        ev("marie_curie", "13:22:40Z", "logout")))
      q.processAllAvailable()
      // flush: push the watermark far past every open session
      mem.addData(Seq(ev("zz", "13:40:00Z"))); q.processAllAvailable()
      mem.addData(Seq(ev("zz", "13:50:00Z"))); q.processAllAvailable()
      spark.table(name).collect()
        .filter(_.getString(0) != "zz")
        .map(r => (r.getString(0), r.getTimestamp(1).toInstant.getEpochSecond) ->
          (r.getTimestamp(2).toInstant.getEpochSecond, r.getLong(3)))
        .toMap
    } finally q.stop()
  }

  test("A5 sessions, 1-minute watermark: late bridge MERGES marie's sessions; napoleon discarded") {
    val got = runSessions("1 minute")
    assert(!got.keys.exists(_._1 == "napoleon_bonaparte"),
      s"napoleon (~8 min late) must be discarded: $got")
    // bridge accepted → 13:20:00 + 13:20:45 + 13:22:40 fuse into ONE
    // session ending 13:24:40 with 3 events
    assert(got(("marie_curie", sec("13:20:00Z"))) === (sec("13:24:40Z"), 3L),
      s"bridge must merge marie's sessions: $got")
    assert(got(("alice_wonderland", sec("13:14:30Z"))) === (sec("13:17:10Z"), 2L))
    assert(got(("alice_wonderland", sec("13:19:20Z"))) === (sec("13:21:20Z"), 1L))
  }

  test("A5 sessions, 500 ms watermark: bridge discarded — marie keeps TWO sessions") {
    val got = runSessions("500 milliseconds")
    assert(!got.keys.exists(_._1 == "napoleon_bonaparte"))
    assert(got(("marie_curie", sec("13:20:00Z"))) === (sec("13:22:00Z"), 1L),
      s"no merge at 500 ms — first session closes alone: $got")
    assert(got(("marie_curie", sec("13:22:40Z"))) === (sec("13:24:40Z"), 1L),
      s"second session stands alone: $got")
  }
}
