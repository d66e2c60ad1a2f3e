package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batch text-pipeline operators (operators.Text, q38/q39/q33/q37
  * family) composed as ONE streaming ingest pipeline — the shape a
  * continuously-arriving 100 TB corpus actually runs: parse → quality
  * gate → exact dedup bounded by the watermark → content fingerprint,
  * all inside a single micro-batch plan (no per-stage materialization).
  *
  * State story at scale: the only stateful operator is
  * `dropDuplicatesWithinWatermark` keyed by the 16-byte content hash, so
  * state is O(docs inside the watermark horizon), not O(corpus); the
  * quality gate runs BEFORE dedup so junk never enters the state store;
  * the fingerprint is the codegen'd one-pass `min_gram_hash60`.
  */
object TextStreams {

  /** `df` must carry (doc_id, text, eventTime). Thresholds mirror the
    * oracle-checked batch quality filter (q39: 15 ≤ words ≤ 90,
    * stopword ratio ≤ 0.12).
    */
  def ingestPipeline(df: DataFrame, delay: String = "10 seconds"): DataFrame = {
    val scored = df
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_words", size(col("w")))
      .withColumn("n_stop", size(expr("filter(w, x -> x IN ('the', 'a'))")))
      .filter(col("n_words") >= 15 && col("n_words") <= 90 &&
        round(col("n_stop") / col("n_words"), 6) <= 0.12)
      .withColumn("h", md5(col("text").cast("binary")))
    scored
      .withWatermark("eventTime", delay)
      .dropDuplicatesWithinWatermark("h")
      .select(col("doc_id"), col("eventTime"), col("n_words").cast("long").as("n_words"),
        call_function("min_gram_hash60", col("text")).as("fingerprint"))
  }
}
