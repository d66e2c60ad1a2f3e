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

  /** 3-segment directory: the 13 fixture objects (12 valid + 1
    * malformed) split 5/5/3, named so sort order == event order.
    */
  private def segmentDir(): String = {
    val dir = tempDir("replay_segments").toPath
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(fixturePath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val objs = "\\{[^{}]*\\}".r.findAllIn(text).toSeq
    assert(objs.size === 13, "fixture: 12 valid + 1 malformed record")
    objs.grouped(5).zipWithIndex.foreach { case (group, i) =>
      java.nio.file.Files.write(dir.resolve(f"seg_$i%02d.json"),
        group.mkString("[\n", ",\n", "\n]")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    dir.toString
  }

  test("directory replay: batch read concatenates segments in name order") {
    val dir = segmentDir()
    val df = spark.read.format(fmt).option("path", dir).load()
    assert(df.count() === 12, "malformed record in the last segment still skipped")
    // name-order concatenation == the single-file parse, row for row
    val single = spark.read.format(fmt).option("path", fixturePath).load()
    assert(df.collect().map(_.toSeq).toSeq === single.collect().map(_.toSeq).toSeq)
  }

  test("directory replay: paced micro-batches span file boundaries; mid-file checkpoint restart") {
    val dir = segmentDir()
    val out = tempDir("replay_dir_out").toPath.toString
    val ckpt = tempDir("replay_dir_ckpt").toPath.toString
    // eventsPerBatch=4 over 5/5/2-valid segments: the first committed
    // offset is global 4 — INSIDE segment 0 — so the restart resumes
    // from a non-boundary offset, and the next batch [4,8) spans the
    // segment-0/segment-1 file boundary (two partitions, one per file)
    def start() = spark.readStream.format(fmt)
      .option("path", dir).option("eventsPerBatch", 4).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
             System.nanoTime() < deadline) Thread.sleep(50)
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 1)
    } finally q1.stop()

    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
      assert(rows.count() === 12,
        "restart from a mid-file offset must deliver all 12 events exactly once")
      assert(rows.distinct().count() === 12)
      // same multiset of events as the single-file replay
      assert(rows.collect().map(_.toSeq).toSet ===
        spark.read.format(fmt).option("path", fixturePath).load()
          .collect().map(_.toSeq).toSet)
    } finally q2.stop()
  }

  test("sliceRanges partitions any [s,e) exactly over random segment counts (seeded property)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 2000) {
      val counts = IndexedSeq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(5).toLong)
      val total = counts.sum
      val a = rnd.nextInt(total.toInt + 2).toLong
      val b = rnd.nextInt(total.toInt + 2).toLong
      val (s, e) = (math.min(a, b), math.max(a, b))
      val slices = sources.UserActivityReplay.sliceRanges(counts, s, e)
      // every slice stays inside its segment
      slices.foreach { case (i, lo, hi) =>
        assert(0 <= lo && lo < hi && hi <= counts(i), s"trial $trial: $slices")
      }
      // expanded to global indices, the slices ARE [s, e) clamped to the
      // data — ordered, gapless, duplicate-free
      val offsets = counts.scanLeft(0L)(_ + _)
      val expanded = slices.flatMap { case (i, lo, hi) =>
        (offsets(i) + lo) until (offsets(i) + hi)
      }
      val expected = math.min(s, total) until math.min(e, total)
      assert(expanded == expected.toSeq,
        s"trial $trial: counts=$counts s=$s e=$e slices=$slices")
    }
  }

  test("short-name registration resolves via DataSourceRegister") {
    val df = spark.read.format("user-activity-replay")
      .option("path", fixturePath).load()
    assert(df.count() === 12)
  }
}
