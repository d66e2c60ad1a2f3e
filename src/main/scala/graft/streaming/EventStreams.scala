package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Structured-Streaming entry points over the driver `events` table: the
  * same logical plans the batch oracle checks (EventWindows), fed by
  * `readStream` instead of `read`. Schema is taken from the batch reader
  * (streaming parquet reads require an explicit schema) including the
  * nanos→micros event-time normalization.
  *
  * Scale note: file-source streaming paces itself with
  * `maxFilesPerTrigger`; watermarked window aggregations keep state
  * O(open windows) per key and evict on watermark advance — the 100 TB
  * streaming contract.
  */
object EventStreams {

  /** Streaming view of `events` with the same `ts` normalization as the
    * batch reader.
    */
  def readEvents(s: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    val batchSchema =
      graft.sources.Tables.parquetCached(s, s"$dir/events.parquet").schema
    // the streaming file source monitors a DIRECTORY; select the events
    // table out of the shared sf dir with a glob filter
    val raw = s.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // same physical-encoding normalization as Tables.events: nanos-long,
    // TIMESTAMP_NTZ, or already-TZ — all canonicalized to TimestampType
    batchSchema("ts").dataType match {
      case LongType            => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                   => raw
    }
  }

  /** Streaming q20: watermarked hourly tumbling signup counts — identical
    * aggregation to the batch/oracle version.
    */
  def tumblingSignups(s: SparkSession, dir: String,
      watermark: String = "1 hour"): DataFrame =
    tumblingSignupsOn(readEvents(s, dir), watermark)

  /** Same aggregation over an arbitrary prepared event stream (normalized
    * `ts` column) — the bench feeds a pre-sliced multi-batch replay here.
    */
  def tumblingSignupsOn(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(when(col("event_type") === "signup", 1)).as("signups"),
        count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("signups"), col("n_events"))

  /** Stream-static enrichment: every micro-batch joins the CURRENT
    * dimension snapshot (static side re-planned per batch, so a reloaded
    * dim table is picked up without restarting the query). The dimension
    * is broadcast — the unbounded stream side never shuffles for the
    * join, which is the only sustainable shape when the stream is the
    * 100 TB/day side.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Union of two independently-watermarked streams feeding one tumbling
    * aggregate. Spark finalizes a window on the MIN of the inputs'
    * watermarks (default `multipleWatermarkPolicy`): a fast source can
    * never close a window while a lagging source may still deliver rows
    * for it — the multi-input correctness contract, asserted in
    * EventStreamsSpec.
    */
  def unionedTumbling(a: DataFrame, b: DataFrame,
      delay: String = "2 seconds"): DataFrame =
    a.withWatermark("eventTime", delay)
      .unionByName(b.withWatermark("eventTime", delay))
      .groupBy(window(col("eventTime"), "3 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("start"), col("n"))

  /** Stream-stream INTERVAL join — the click-attribution shape: each
    * click joins the impressions of the same user that happened in the
    * preceding `horizon`. Both sides are watermarked and the join
    * condition bounds the event-time gap, so each side's buffered state
    * evicts as the watermark passes the interval — bounded state at
    * unbounded input, the only viable stream-stream join at 100 TB/day
    * (an unbounded-condition stream join would buffer both streams
    * forever).
    *
    * Expects `impressions(impUser, adId, impTime)` and
    * `clicks(clickUser, clickTime)`. `joinType = "leftOuter"` emits
    * never-clicked impressions with null click columns once the
    * watermark proves no click can still arrive — Spark only supports
    * outer stream-stream joins when the condition is time-bounded like
    * this, which the spec pins.
    */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
      delay: String = "10 seconds", horizon: String = "30 seconds",
      joinType: String = "inner"): DataFrame =
    impressions.withWatermark("impTime", delay).join(
      clicks.withWatermark("clickTime", delay),
      expr(s"""impUser = clickUser AND
               clickTime >= impTime AND
               clickTime <= impTime + interval $horizon"""),
      joinType)

  /** NO-equi-key temporal range join, the STREAMING twin of batch q149
    * (`EventWindows.nearbyEventPressure`): each error event paired with
    * every event (any user) within ±`seconds` of it, as a standing
    * stream-stream self-join. Spark's symmetric hash join partitions
    * its state by the join's equality keys — with no natural key, the
    * same synthetic TIME BUCKET that carries the batch shuffle becomes
    * the state partition key: the probe side fans to buckets
    * {b−1, b, b+1}, the join is bucket-equality plus the exact
    * |Δt| ≤ range cut (each pair produced exactly once — a build
    * event's single bucket matches exactly one of the probe's three),
    * and both sides' watermarked event-time range bounds the buffered
    * state to the active horizon per bucket. Emits the raw pairs
    * (`err_id`, `e_id`, both timestamps); downstream aggregation is the
    * consumer's choice (the batch twin counts per error).
    */
  def nearbyPairs(events: DataFrame, seconds: Int = 60,
      delay: String = "10 seconds"): DataFrame = {
    val bucketMs = seconds * 1000L
    val errs = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
      .withColumn("off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("b1", floor(unix_millis(col("err_ts")) / bucketMs)
        + col("off"))
      .drop("off")
      .withWatermark("err_ts", delay)
    val others = events
      .select(col("event_id").as("e_id"), col("ts").as("e_ts"))
      .withColumn("b2", floor(unix_millis(col("e_ts")) / bucketMs))
      .withWatermark("e_ts", delay)
    errs.join(others, expr(
      s"""b1 = b2 AND e_id <> err_id AND
          e_ts >= err_ts - interval $seconds seconds AND
          e_ts <= err_ts + interval $seconds seconds"""))
      .select(col("err_id"), col("e_id"),
        unix_millis(col("err_ts")).as("err_ms"),
        unix_millis(col("e_ts")).as("e_ms"))
  }

  /** Streaming exact dedup on a business key within the watermark horizon
    * (`dropDuplicatesWithinWatermark`): state for a key is dropped once
    * the watermark passes it — bounded state at unbounded input, the
    * streaming counterpart of the batch `dropDuplicates` path (q33).
    */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String],
      delay: String): DataFrame =
    df.withWatermark("eventTime", delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
