package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Relational query library over the driver star schema.
  *
  * Determinism contract with the DuckDB oracle: floating-point aggregation
  * order differs between engines, so every money aggregate accumulates in
  * exact DECIMAL and only the FINAL value is cast to DOUBLE. The oracle SQL
  * mirrors this: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  *
  * Scale notes (100 TB): all queries are declarative DataFrame plans —
  * Catalyst plans partial+final hash aggregation, pushes filters/pruning to
  * the parquet scan, and AQE handles skew. Dimension tables (region, nation,
  * supplier, customer at typical star-schema ratios) are broadcast
  * explicitly so fact-table joins never shuffle the large side.
  */
object Relational {

  /** Exact-decimal view of a money/ratio column. */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** q1: pricing summary (full-scan partial+final agg; reference F1/F2's
    * conditional-count style generalized — SURVEY §2.5).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec4(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
