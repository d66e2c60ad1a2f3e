package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side utilities: data-lake layouts that make the READ side cheap
  * at 100 TB. Hive-style partition directories mean a query filtering on
  * the partition column never opens irrelevant files (partition pruning —
  * asserted in SinksSpec), and per-partition file sizing is controlled by
  * the upstream shuffle, not the writer.
  */
object Sinks {

  /** Partition a fact table by derived year (coarse, low-cardinality —
    * the right granularity for multi-year scans; day-level comes from
    * parquet row-group stats within each year).
    */
  def writePartitionedByYear(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("year", year(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year")
      .parquet(path)

  /** Plain parquet append sink (used by streaming foreachBatch too). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)
}
