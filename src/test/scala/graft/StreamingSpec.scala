package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{CountTriggerStream, StreamingWindows}

/** Streaming-equivalence and watermark-semantics tests (SURVEY §5 tier 2):
  * the batch plans of UserActivityGoldenSpec run unchanged on
  * MemoryStream micro-batches; final results must match batch, and late
  * data beyond the watermark must be dropped from closed windows.
  */
class StreamingSpec extends SparkSpec {

  private def fixtureEvents: Seq[UserActivity] = {
    import spark.implicits._
    fixture.select(col("userId"), col("activity"), col("timestamp"))
      .as[UserActivity].orderBy(col("timestamp")).collect().toSeq
  }

  test("streaming tumbling counts (complete mode) == batch counts") {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
    val q = StreamingWindows.tumblingRegistrations(
      StreamingWindows.watermarked(df))
      .writeStream.format("memory").queryName("stream_tumbling")
      .outputMode(OutputMode.Complete).start()
    try {
      val (b1, rest) = fixtureEvents.splitAt(4)
      val (b2, b3) = rest.splitAt(4)
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val rows = spark.table("stream_tumbling").orderBy(col("start")).collect()
      assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L, 0L))
    } finally q.stop()
  }

  test("watermark drops late data for already-closed windows (append mode)") {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
    val q = StreamingWindows.tumblingRegistrations(
      StreamingWindows.watermarked(df, delay = "2 seconds"))
      .writeStream.format("memory").queryName("stream_late")
      .outputMode(OutputMode.Append).start()
    try {
      def ev(act: String, sec: Int) =
        UserActivity("u", act, f"2025-08-03T13:00:$sec%02dZ")
      // batch 1 advances the watermark to :08 -> window [0,3) closes
      mem.addData(Seq(ev("register", 2), ev("online", 10)))
      q.processAllAvailable()
      // batch 2: register@1 is LATE (watermark :08 > window end :03) -> dropped
      mem.addData(Seq(ev("register", 1), ev("register", 11)))
      q.processAllAvailable()
      // advance watermark past [9,12) so it closes and emits
      mem.addData(Seq(ev("online", 20)))
      q.processAllAvailable()
      mem.addData(Seq(ev("online", 21)))
      q.processAllAvailable()
      val got = spark.table("stream_late").collect()
        .map(r => r.getTimestamp(0).toInstant.getEpochSecond % 60 -> r.getLong(2))
        .toMap
      assert(got(0L) === 1L, "late register@1 must not be re-counted")
      assert(got(9L) === 1L)
    } finally q.stop()
  }

  test("streaming count-trigger fires across micro-batches == batch fires") {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val q = CountTriggerStream.fires(spark, mem.toDS())
      .writeStream.format("memory").queryName("stream_fires")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, rest) = fixtureEvents.splitAt(3)
      val (b2, b3) = rest.splitAt(4)
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val fires = spark.table("stream_fires").orderBy(col("fireSeq"))
        .as[CountFire].collect().toSeq
      assert(fires === Seq(CountFire(1, 5, 4), CountFire(2, 10, 6)))
    } finally q.stop()
  }

  test("session windows stream with watermark: final sessions == batch (append mode)") {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
    val q = StreamingWindows.userSessions(
      StreamingWindows.watermarked(df, delay = "2 seconds"), gap = "5 seconds")
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      def ev(u: String, sec: Int) =
        UserActivity(u, "online", f"2025-08-03T13:00:$sec%02dZ")
      // session a:[0,1] then a:[10]; b:[2]; watermark pushed past all ends
      mem.addData(Seq(ev("a", 0), ev("a", 1), ev("b", 2)))
      q.processAllAvailable()
      mem.addData(Seq(ev("a", 10)))
      q.processAllAvailable()
      mem.addData(Seq(ev("a", 40)))
      q.processAllAvailable()
      mem.addData(Seq(ev("a", 41)))
      q.processAllAvailable()
      val got = spark.table("stream_sessions")
        .collect().map(r => (r.getString(0), r.getLong(3))).toSeq.sorted
      assert(got === Seq(("a", 1L), ("a", 2L), ("b", 1L)))
    } finally q.stop()
  }

  test("foreachBatch sink: per-micro-batch parquet writes land every row (K3 shape)") {
    import spark.implicits._
    val outDir = tempDir("graft_fb").toPath.toString
    val mem = MemoryStream[UserActivity](spark)
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserActivity], id: Long) =>
        batch.write.mode("append").parquet(s"$outDir/data")
      }
      .start()
    try {
      mem.addData(fixtureEvents.take(5)); q.processAllAvailable()
      mem.addData(fixtureEvents.drop(5)); q.processAllAvailable()
      assert(spark.read.parquet(s"$outDir/data").count() === 12)
    } finally q.stop()
  }

  test("transformWithState count-trigger (RocksDB state) == flatMapGroupsWithState") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[UserActivity](spark)
    val q = CountTriggerStream.firesTws(spark, mem.toDS())
      .writeStream.format("memory").queryName("tws_fires")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = fixtureEvents.splitAt(7)
      Seq(b1, b2).foreach { b => mem.addData(b); q.processAllAvailable() }
      val fires = spark.table("tws_fires").orderBy(col("fireSeq"))
        .as[CountFire].collect().toSeq
      assert(fires === Seq(CountFire(1, 5, 4), CountFire(2, 10, 6)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join matches follow-ups to registrations") {
    import spark.implicits._
    val regMem = MemoryStream[UserActivity](spark)
    val fuMem = MemoryStream[UserActivity](spark)
    def withTime(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("eventTime", to_timestamp(col("timestamp")))
    val q = StreamingWindows.registrationFollowups(
      withTime(regMem.toDF()), withTime(fuMem.toDF()))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      def ev(u: String, sec: Int) =
        UserActivity(u, "x", f"2025-08-03T13:00:$sec%02dZ")
      regMem.addData(Seq(ev("a", 1), ev("b", 2)))
      fuMem.addData(Seq(ev("a", 3), ev("a", 20), ev("b", 5), ev("c", 4)))
      q.processAllAvailable()
      // push watermarks far past the interval so all matches emit
      regMem.addData(Seq(ev("z", 50))); fuMem.addData(Seq(ev("z", 50)))
      q.processAllAvailable()
      regMem.addData(Seq(ev("z2", 51))); fuMem.addData(Seq(ev("z2", 51)))
      q.processAllAvailable()
      val got = spark.table("ss_join").collect()
        .map(r => (r.getString(0), r.getTimestamp(2).toInstant.getEpochSecond % 100))
        .toSet
      // a@3 within [1, 11] matches; a@20 outside; b@5 within [2, 12];
      // c has no registration
      assert(got === Set(("a", 3L), ("b", 5L)))
    } finally q.stop()
  }

  test("checkpoint recovery: stateful query resumes counters after restart") {
    import spark.implicits._
    val ckpt = tempDir("graft_ckpt").toPath.toString
    val out = tempDir("graft_ckpt_out").toPath.toString
    val mem = MemoryStream[UserActivity](spark)
    def start() = CountTriggerStream.fires(spark, mem.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val q1 = start()
    try {
      mem.addData(fixtureEvents.take(7)); q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: state (7 seen, fires=1) must carry over
    val q2 = start()
    try {
      mem.addData(fixtureEvents.drop(7)); q2.processAllAvailable()
      val fires = spark.read.parquet(out).orderBy(col("fireSeq"))
        .as[CountFire].collect().toSeq
      assert(fires === Seq(CountFire(1, 5, 4), CountFire(2, 10, 6)))
    } finally q2.stop()
  }

  test("update mode re-emits only changed windows per micro-batch") {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
    val q = StreamingWindows.tumblingRegistrations(df)
      .writeStream.format("memory").queryName("upd_stream")
      .outputMode(OutputMode.Update).start()
    try {
      def ev(sec: Int) = UserActivity("u", "register", f"2025-08-03T13:00:$sec%02dZ")
      mem.addData(Seq(ev(1))); q.processAllAvailable()
      val afterB1 = spark.table("upd_stream").count()
      // second batch touches the SAME window -> exactly one more update row
      mem.addData(Seq(ev(2))); q.processAllAvailable()
      val rows = spark.table("upd_stream").collect()
        .map(r => (r.getTimestamp(0).toInstant.getEpochSecond % 60, r.getLong(2)))
      assert(afterB1 === 1L)
      assert(rows.length === 2, "update mode appends one changed-window row per batch")
      assert(rows.toSet === Set((0L, 1L), (0L, 2L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("keyed count-trigger keeps independent per-activity counters") {
    import spark.implicits._
    val ds = fixture.select(col("userId"), col("activity"), col("timestamp"))
      .as[UserActivity]
    val fires = CountTriggerStream.firesPerKey(spark, ds, every = 3)
      .collect().toSeq.sortBy(f => (f._1, f._2.fireSeq))
    // 6 registers -> fires at 3 and 6 (all matching); 6 online -> same count shape
    assert(fires === Seq(
      ("online", CountFire(1, 3, 0)), ("online", CountFire(2, 6, 0)),
      ("register", CountFire(1, 3, 3)), ("register", CountFire(2, 6, 6))))
  }
}
