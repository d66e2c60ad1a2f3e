package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.{CountTriggerStream, StreamingWindows}

/** Golden tests for the reference's windowing semantics (SURVEY §5) over
  * the fixture corpus: 12 events, 6 users, register/online, 13:00:01Z–
  * 13:00:10Z, engineered so every documented window shape has a non-
  * trivial hand-computed expectation.
  */
class UserActivityGoldenSpec extends SparkSpec {

  private def startSecond(r: Row): Long =
    r.getTimestamp(0).toInstant.getEpochSecond % 60

  test("malformed-record policy: record missing a field is skipped, job succeeds") {
    assert(fixture.count() === 12)
    assert(fixture.filter(col("userId") === "u7").count() === 0)
  }

  test("corrupt JSONL lines are skipped per-line, job never fails (S5 policy)") {
    val path = getClass.getResource("/user_activity_corrupt.jsonl").getPath
    val df = sources.Tables.userActivityJson(spark, path, multiLine = false)
    assert(df.count() === 3)
    assert(df.select("userId").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("u1", "u3", "u4"))
  }

  test("A1 tumbling 3s registration counts = [1, 3, 2, 0]") {
    val rows = StreamingWindows.tumblingRegistrations(fixture)
      .orderBy(col("start")).collect()
    assert(rows.map(startSecond).toSeq === Seq(0L, 3L, 6L, 9L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L, 0L))
  }

  test("A2 keyed tumbling 3s event counts: register [1,3,2], online [1,1,1,3]") {
    val rows = StreamingWindows.keyedTumblingCounts(fixture)
      .orderBy(col("activity"), col("start")).collect()
    val byKey = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(3)).toSeq).toMap
    // a (key, window) group with no events never materializes — same as
    // Flink keyed windows: no element, no window firing
    assert(byKey("register") === Seq(1L, 3L, 2L))
    assert(byKey("online") === Seq(1L, 1L, 1L, 3L))
  }

  test("A3 sliding 3s/1s registration counts match the recomputed vector") {
    val got = StreamingWindows.slidingRegistrations(fixture).collect()
      .map(r => startSecond(r) -> r.getLong(2)).toMap
    val expected = Map(0L -> 1L, 1L -> 2L, 2L -> 4L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 2L, 7L -> 1L, 8L -> 1L, 9L -> 0L)
    expected.foreach { case (s, n) => assert(got(s) === n, s"window start :$s") }
    // windows outside [0, 9] contain only online events
    got.filterNot { case (s, _) => expected.contains(s) }
      .foreach { case (s, n) => assert(n === 0L, s"window start :$s") }
  }

  test("A4 count-trigger(5) fires cumulative (accumulating, no purge): 4 then 6") {
    import spark.implicits._
    val ds = fixture.select(col("userId"), col("activity"), col("timestamp"))
      .as[UserActivity]
    val fires = CountTriggerStream.fires(spark, ds).orderBy("fireSeq").collect()
    assert(fires.toSeq === Seq(CountFire(1, 5, 4), CountFire(2, 10, 6)))
  }

  test("A5 session windows: gap merges nearby events, splits idle users") {
    import spark.implicits._
    val events = Seq(
      UserActivity("a", "online", "2025-08-03T13:00:00Z"),
      UserActivity("a", "online", "2025-08-03T13:00:01Z"),
      UserActivity("a", "online", "2025-08-03T13:00:10Z"),
      UserActivity("b", "online", "2025-08-03T13:00:02Z")
    ).toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
    val rows = StreamingWindows.userSessions(events, gap = "5 seconds")
      .orderBy(col("userId"), col("start")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(3))).toSeq ===
      Seq(("a", 2L), ("a", 1L), ("b", 1L)))
  }

  test("R6 report formatting matches the reference's line shape") {
    val line = StreamingWindows.formatReport(
      StreamingWindows.tumblingRegistrations(fixture)).orderBy(col("report"))
      .collect().head.getString(0)
    assert(line.matches("Window \\[.* - .*\\] Registration Count: \\d+"))
  }
}
