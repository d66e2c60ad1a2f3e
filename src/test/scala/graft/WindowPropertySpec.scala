package graft

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingWindows

/** Property tests (SURVEY §5 tier 3) over seeded random event sequences:
  * event-time semantics make window results a pure function of the event
  * multiset — independent of arrival order and of batch/streaming split.
  */
class WindowPropertySpec extends SparkSpec {

  private def randomEvents(seed: Int): Seq[UserActivity] = {
    val rnd = new Random(seed)
    (1 to 20 + rnd.nextInt(20)).map { _ =>
      UserActivity(
        s"u${rnd.nextInt(5)}",
        if (rnd.nextBoolean()) "register" else "online",
        f"2025-08-03T13:00:${rnd.nextInt(13)}%02dZ")
    }
  }

  private def toDf(events: Seq[UserActivity]) = {
    import spark.implicits._
    events.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
  }

  private def tumblingMap(events: Seq[UserActivity], size: String = "3 seconds") =
    StreamingWindows.tumblingRegistrations(toDf(events), size).collect()
      .map(r => r.getTimestamp(0).toInstant.getEpochSecond -> r.getLong(2)).toMap

  test("window counts are invariant under input permutation") {
    (1 to 4).foreach { seed =>
      val events = randomEvents(seed)
      val shuffled = new Random(seed + 100).shuffle(events)
      assert(tumblingMap(events) === tumblingMap(shuffled), s"seed=$seed")
    }
  }

  test("final streaming result == batch result for random chunked input") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val events = randomEvents(seed)
      val mem = MemoryStream[UserActivity](spark)
      val df = mem.toDF().withColumn("eventTime", to_timestamp(col("timestamp")))
      val q = StreamingWindows.tumblingRegistrations(StreamingWindows.watermarked(df))
        .writeStream.format("memory").queryName(s"prop_stream_$seed")
        .outputMode(OutputMode.Complete).start()
      try {
        val rnd = new Random(seed)
        var rest = events
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(7)
          mem.addData(rest.take(n)); rest = rest.drop(n)
        }
        q.processAllAvailable()
        val streamed = spark.table(s"prop_stream_$seed").collect()
          .map(r => r.getTimestamp(0).toInstant.getEpochSecond -> r.getLong(2)).toMap
        assert(streamed === tumblingMap(events), s"seed=$seed")
      } finally q.stop()
    }
  }

  test("sliding(3s,1s) register count == sum of the 3 covered 1s-tumbling counts") {
    (1 to 4).foreach { seed =>
      val events = randomEvents(seed)
      val perSec = tumblingMap(events, "1 second").withDefaultValue(0L)
      StreamingWindows.slidingRegistrations(toDf(events)).collect().foreach { r =>
        val start = r.getTimestamp(0).toInstant.getEpochSecond
        val expected = (0 to 2).map(i => perSec(start + i)).sum
        assert(r.getLong(2) === expected, s"seed=$seed window=$start")
      }
    }
  }
}
