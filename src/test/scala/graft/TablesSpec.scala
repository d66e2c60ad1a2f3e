package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Ingest-robustness gate for the `events` table: the driver has shipped
  * `ts` in THREE different physical parquet encodings across testdata
  * regenerations (TIMESTAMP(NANOS) → read as nanos-long under
  * `nanosAsLong`, `timestamp[us]` without tz → TIMESTAMP_NTZ, and
  * `timestamp[us, tz=UTC]` → TimestampType). Round 5 lost 9 oracle
  * queries + 15 specs when a regeneration switched encodings and the
  * reader only normalized the old one. This spec pins the contract:
  * whatever the physical encoding, `Tables.events` surfaces a
  * `TimestampType` column holding the same UTC instant.
  */
class TablesSpec extends SparkSpec {

  // one canonical instant: 2024-03-01T12:34:56.789Z
  private val micros = 1709296496789000L

  private def writeAndRead(encode: org.apache.spark.sql.Column): Timestamp = {
    import spark.implicits._
    val dir = tempDir("graft_tables_spec_").toString
    Seq((1L, micros, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", encode)
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("ts")).head().getTimestamp(0)
  }

  private val expected = new Timestamp(micros / 1000)

  test("events.ts: TIMESTAMP_NTZ parquet encoding normalizes to TimestampType") {
    // session tz is UTC, so the NTZ wall time is the same UTC instant
    val got = writeAndRead(timestamp_micros(col("us")).cast(TimestampNTZType))
    assert(got == expected, s"NTZ instant mismatch: $got vs $expected")
  }

  test("events.ts: UTC-adjusted timestamp parquet encoding passes through") {
    val got = writeAndRead(timestamp_micros(col("us")))
    assert(got == expected, s"TZ instant mismatch: $got vs $expected")
  }

  test("embeddings.embedding: float-array encoding passes through unchanged") {
    import spark.implicits._
    val dir = tempDir("graft_tables_spec_").toString
    Seq((1L, Seq(0.5f, -0.25f), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("embedding").dataType == ArrayType(FloatType))
    assert(df.select(col("embedding")).head().getSeq[Float](0) == Seq(0.5f, -0.25f))
  }

  test("embeddings.embedding: true-double regeneration is preserved EXACTLY") {
    // 0.1 and 1e-200 are not float-representable (0.1f round-trips to a
    // different double; 1e-200 underflows float to 0). Round 6 narrowed
    // these to float at ingest — a silent-precision-loss path that could
    // hash-mismatch 40+ ANN queries against a DuckDB oracle computing on
    // the raw doubles. The contract now: doubles pass through untouched.
    import spark.implicits._
    val dir = tempDir("graft_tables_spec_").toString
    val vals = Seq(0.1d, 1e-200, 1.0 + 1e-15)
    Seq((1L, vals, 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("embedding").dataType == ArrayType(DoubleType),
      s"true doubles must be preserved, got ${df.schema("embedding").dataType}")
    val got = df.select(col("embedding")).head().getSeq[Double](0)
    assert(got == vals, s"double payload must survive bit-exact: $got vs $vals")
    assert(got.head != 0.1f.toDouble, "sentinel: 0.1 must NOT be the float round-trip")
  }

  test("float_dot computes identically on float, double, and mixed-width arrays") {
    // the width-polymorphic dot is what makes the no-narrowing ingest
    // safe: every consumer goes through float_dot, so a double corpus
    // against float literal planes must still analyze and be exact
    val rows = spark.sql(
      """SELECT
        |  float_dot(array(CAST(0.5 AS FLOAT), CAST(-2 AS FLOAT)),
        |            array(CAST(4 AS FLOAT), CAST(3 AS FLOAT))) AS ff,
        |  float_dot(array(0.5D, -2D), array(4D, 3D)) AS dd,
        |  float_dot(array(0.5D, -2D),
        |            array(CAST(4 AS FLOAT), CAST(3 AS FLOAT))) AS df,
        |  float_dot(array(0.1D), array(1D)) AS exact_double
        |""".stripMargin).head()
    assert(rows.getDouble(0) == -4.0)
    assert(rows.getDouble(1) == -4.0)
    assert(rows.getDouble(2) == -4.0)
    // a narrowed 0.1f*1.0 would give 0.10000000149011612, not 0.1
    assert(rows.getDouble(3) == 0.1d,
      s"double inputs must not be narrowed: got ${rows.getDouble(3)}")
  }

  test("events.ts: nanos-as-long encoding converts by floor-division to micros") {
    // TIMESTAMP(NANOS) parquet surfaces to the reader as LongType (Spark 4
    // reads it only under spark.sql.legacy.parquet.nanosAsLong); a BIGINT
    // ts column takes the identical LongType branch in Tables.events.
    val got = writeAndRead((col("us") * lit(1000L) + lit(999L)).cast(LongType))
    assert(got == expected, s"nanos instant mismatch: $got vs $expected")
  }
}
