package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingWindows

/** The DSv2 replay source must deliver the fixture in paced micro-batches
  * and produce the same final window results as the batch path (S1–S5
  * parity, SURVEY §2.1).
  */
class ReplaySourceSpec extends SparkSpec {

  private val fmt = classOf[sources.UserActivityReplayProvider].getName

  test("batch read: parses the JSON array, skips the malformed record") {
    val df = spark.read.format(fmt).option("path", fixturePath).load()
    assert(df.count() === 12)
    assert(df.schema.fieldNames.toSeq === Seq("userId", "activity", "timestamp"))
  }

  test("streaming replay in 5-event micro-batches == batch goldens") {
    val df = spark.readStream.format(fmt)
      .option("path", fixturePath).option("eventsPerBatch", 5).load()
      .withColumn("eventTime", to_timestamp(col("timestamp")))
    val q = StreamingWindows.tumblingRegistrations(
      StreamingWindows.watermarked(df))
      .writeStream.format("memory").queryName("replay_tumbling")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("replay_tumbling").orderBy(col("start")).collect()
      assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L, 0L))
      // replay pacing: 12 events at 5/batch -> at least 3 micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    } finally q.stop()
  }

  test("replay pacing edge cases: batch larger than file, and one-by-one") {
    val big = spark.readStream.format(fmt)
      .option("path", fixturePath).option("eventsPerBatch", 1000).load()
    val q1 = big.writeStream.format("memory").queryName("replay_big")
      .outputMode(OutputMode.Append).start()
    try {
      q1.processAllAvailable()
      assert(spark.table("replay_big").count() === 12)
    } finally q1.stop()

    val one = spark.readStream.format(fmt)
      .option("path", fixturePath).option("eventsPerBatch", 1).load()
    val q2 = one.writeStream.format("memory").queryName("replay_one")
      .outputMode(OutputMode.Append).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("replay_one").count() === 12)
      assert(q2.recentProgress.count(_.numInputRows > 0) >= 10,
        "1-per-batch replay must take ~12 micro-batches")
    } finally q2.stop()
  }

  test("checkpoint restart: delivers exactly-once, no stall or duplicates") {
    // Stop a paced replay mid-stream, then restart from the checkpoint.
    // A stateful pace counter would restart at 0 and regress latestOffset
    // below the committed offset, re-planning already-committed ranges
    // (duplicates) or stalling on empty batches; admission control paces
    // from the engine-supplied start offset, so restart is seamless.
    val out = tempDir("replay_restart_out").toPath.toString
    val ckpt = tempDir("replay_restart_ckpt").toPath.toString
    def start() = spark.readStream.format(fmt)
      .option("path", fixturePath).option("eventsPerBatch", 5).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      // wait until at least one non-empty batch is committed, then stop
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
             System.nanoTime() < deadline) Thread.sleep(50)
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 1)
    } finally q1.stop()

    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
      assert(rows.count() === 12, "restart must deliver all 12 events exactly once")
      assert(rows.distinct().count() === 12)
    } finally q2.stop()
  }

  test("short-name registration resolves via DataSourceRegister") {
    val df = spark.read.format("user-activity-replay")
      .option("path", fixturePath).load()
    assert(df.count() === 12)
  }
}
