package graft

/** The reference's record type (reference:
  * src/main/scala/generators/useractivity/package.scala:10 — three string
  * fields; event time is the ISO-8601 `timestamp` parsed once at ingest,
  * SURVEY §1.1).
  */
final case class UserActivity(userId: String, activity: String, timestamp: String)

/** One emission of the count-trigger operator (SURVEY §2.4 A4): after
  * every `every`-th element, the cumulative conditional count over ALL
  * elements seen so far (Flink CountTrigger FIREs without purging).
  */
final case class CountFire(fireSeq: Long, totalEvents: Long, registrations: Long)

/** One closed inactivity session from the timer-driven
  * `transformWithState` operator (streaming.SessionTimers): emitted when
  * the event-time watermark passes `lastMs + gap`.
  */
final case class SessionClose(userId: String, events: Long, firstMs: Long, lastMs: Long)
