package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** The driver `events` table through Structured Streaming: same plans,
  * same final answers as the batch/oracle path; streaming dedup keeps one
  * row per key and evicts state by watermark.
  */
class EventStreamsSpec extends SparkSpec {

  test("streaming tumbling signups over events.parquet == batch q20") {
    val batch = SparkEntry.queries("q20_win_tumbling")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val q = EventStreams.tumblingSignups(spark, sfDir)
      .writeStream.format("memory").queryName("ev_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark emits one row per duplicated key") {
    import spark.implicits._
    val mem = MemoryStream[UserActivity](spark)
    val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
    val q = EventStreams.dedupWithinWatermark(df,
      Seq("userId", "timestamp"), delay = "10 seconds")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      def ev(u: String, sec: Int) =
        UserActivity(u, "online", f"2025-08-03T13:00:$sec%02dZ")
      mem.addData(Seq(ev("a", 1), ev("a", 1), ev("b", 2)))
      q.processAllAvailable()
      // same keys again in a later batch, still within the watermark
      mem.addData(Seq(ev("a", 1), ev("b", 2), ev("c", 3)))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .select(col("userId"), col("timestamp")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(rows.length === rows.distinct.length)
      assert(rows.map(_._1).sorted.toSeq === Seq("a", "b", "c"))
    } finally q.stop()
  }
}
