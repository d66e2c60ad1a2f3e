package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities — the co-located-join path (SURVEY §7.5:
  * "pre-partitioning for co-located joins"). Writing both join sides
  * bucketed by the join key into the session catalog lets Catalyst plan
  * the join with ZERO shuffle: each bucket pair joins locally. At 100 TB
  * this converts the nightly fact-to-fact join from a full network
  * shuffle into a partition-local merge — the single biggest shuffle
  * saving available to a recurring pipeline.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned without
    * any Exchange (verified in BucketingSpec).
    */
  def bucketedJoin(s: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    s.table(left).join(s.table(right),
      s.table(left)(leftKey) === s.table(right)(rightKey))
}
