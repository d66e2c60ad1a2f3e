package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the K3 surface the reference declares
  * (reference build.sbt:21, flink-connector-jdbc) but never exercises in
  * code. Re-expressed Spark-first: `spark.read.jdbc` / `df.write.jdbc`
  * with the two knobs that matter at scale set explicitly.
  *
  * Scale notes (100 TB): a JDBC endpoint is never the bulk path — it is
  * the dimension-table / manifest / result-summary path. What matters:
  *
  *  - READ parallelism comes only from `partitionColumn` +
  *    `lowerBound`/`upperBound` + `numPartitions`: without them Spark
  *    issues ONE query over ONE connection and the whole table lands in
  *    a single partition. [[readPartitioned]] makes the stride explicit.
  *  - WRITE parallelism is one connection per upstream partition, each
  *    batching `batchsize` rows per round trip. A 1000-partition
  *    DataFrame would open 1000 connections and melt the endpoint —
  *    [[write]] caps connections by coalescing (a narrow, shuffle-free
  *    repartitioning) before the write.
  */
object Jdbc {

  /** Embedded-Derby url for tests/local runs (in-JVM, zero install). */
  def derbyMemUrl(db: String): String = s"jdbc:derby:memory:$db;create=true"

  /** Write `df` to `table`, capping JDBC connections at `maxConnections`
    * regardless of upstream partitioning and batching rows per round
    * trip. Overwrite drops+recreates the table from the DataFrame
    * schema.
    */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite,
            maxConnections: Int = 8, batchSize: Int = 10000): Unit =
    df.coalesce(math.min(math.max(df.rdd.getNumPartitions, 1), maxConnections))
      .write.mode(mode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, new java.util.Properties())

  /** Single-connection read — fine for small dimension/manifest tables;
    * everything arrives in one partition.
    */
  def read(s: SparkSession, url: String, table: String): DataFrame =
    s.read.jdbc(url, table, new java.util.Properties())

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning one stride of `partitionColumn` in
    * `[lowerBound, upperBound]`. The column should be indexed on the
    * endpoint; rows outside the bounds are still read (into the edge
    * partitions) — bounds shape parallelism, not a filter.
    */
  def readPartitioned(s: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int): DataFrame =
    s.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, new java.util.Properties())
}
