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
}
