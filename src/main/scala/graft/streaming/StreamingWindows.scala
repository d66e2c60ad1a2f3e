package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's windowing surface (SURVEY §2.4 A1–A3/A5, §2.5 F1–F5)
  * as mode-agnostic plans: every function takes a DataFrame with an
  * `eventTime: timestamp` + `activity: string` column pair and returns the
  * same logical plan whether the input is a batch read or `readStream` —
  * Structured Streaming's incremental state management and Catalyst's
  * partial+final aggregation are both automatic.
  *
  * Watermarking: `withWatermark` on a batch DataFrame is a no-op, so the
  * caller applies [[watermarked]] only on streaming inputs (mirroring the
  * reference's bounded-out-of-orderness strategy,
  * FlinkWindowLearning.scala:50-58, default 500 ms). Late data beyond the
  * watermark is dropped on window-state eviction — the same steady-state
  * answers as Flink's per-record drop; transient emissions differ
  * (SURVEY §2.3 W2), which is why tests assert final results.
  */
object StreamingWindows {

  def watermarked(df: DataFrame, delay: String = "500 milliseconds"): DataFrame =
    df.withWatermark("eventTime", delay)

  /** A1/F1: non-keyed tumbling window, conditional registration count. */
  def tumblingRegistrations(df: DataFrame, size: String = "3 seconds"): DataFrame =
    df.groupBy(window(col("eventTime"), size))
      .agg(count(when(col("activity") === "register", 1)).as("registrations"))
      .select(col("window.start").as("start"), col("window.end").as("end"),
        col("registrations"))

  /** A2/F4: keyed tumbling window — event count per (activity, window). */
  def keyedTumblingCounts(df: DataFrame, size: String = "3 seconds"): DataFrame =
    df.groupBy(col("activity"), window(col("eventTime"), size))
      .agg(count(lit(1)).as("events"))
      .select(col("activity"), col("window.start").as("start"),
        col("window.end").as("end"), col("events"))

  /** A3/F5: sliding window registration count. */
  def slidingRegistrations(df: DataFrame, size: String = "3 seconds",
      slide: String = "1 second"): DataFrame =
    df.groupBy(window(col("eventTime"), size, slide))
      .agg(count(when(col("activity") === "register", 1)).as("registrations"))
      .select(col("window.start").as("start"), col("window.end").as("end"),
        col("registrations"))

  /** A5: per-user session windows (the reference's stated-but-unbuilt
    * goal, README.md:33 — built-in in Spark).
    */
  def userSessions(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(col("userId"), session_window(col("eventTime"), gap))
      .agg(count(lit(1)).as("events"))
      .select(col("userId"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("events"))

  /** Stream-stream interval join: each follow-up event matched to the
    * same user's registration within `horizon` after it. Both sides carry
    * watermarks so Spark bounds the join state and evicts rows the
    * interval can no longer match — the state-bounded streaming join
    * design that survives unbounded inputs.
    */
  def registrationFollowups(registrations: DataFrame, followups: DataFrame,
      horizon: String = "10 seconds", delay: String = "5 seconds"): DataFrame = {
    val reg = registrations.withWatermark("eventTime", delay)
      .select(col("userId").as("r_user"), col("eventTime").as("r_time"))
    val fu = followups.withWatermark("eventTime", delay)
      .select(col("userId").as("f_user"), col("eventTime").as("f_time"))
    fu.join(reg,
      col("f_user") === col("r_user") &&
        col("f_time") > col("r_time") &&
        col("f_time") <= col("r_time") + expr(s"INTERVAL $horizon"))
      .select(col("f_user").as("userId"), col("r_time"), col("f_time"))
  }

  /** R6: the reference's formatted report line
    * ("Window [start - end] Registration Count: n",
    * FlinkWindowLearning.scala:83) — formatting stays a presentation
    * concern at the sink, not part of the aggregation.
    */
  def formatReport(df: DataFrame): DataFrame =
    df.select(format_string("Window [%s - %s] Registration Count: %d",
      col("start"), col("end"), col("registrations")).as("report"))
}
