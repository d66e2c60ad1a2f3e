package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The reference's UDAF surface (SURVEY §2.5 F2): Flink's
  * `AggregateFunction[UserActivity, Int, String]` — createAccumulator /
  * add / merge / getResult (FlinkWindowLearning.scala:95-109) — maps 1:1
  * onto Spark's `Aggregator[IN, BUF, OUT]` (zero / reduce / merge /
  * finish). Catalyst plans it with partial (map-side) + final aggregation
  * automatically, the property the reference hand-picks its incremental
  * API for.
  *
  * For the actual conditional count the built-in `count(when(...))` is
  * preferred (whole-stage codegen); this Aggregator exists to prove the
  * extension surface and for typed `KeyValueGroupedDataset.agg` use.
  */
object Aggregators {

  /** Conditional count over a string column: +1 where value == target. */
  final class CountMatching(target: String) extends Aggregator[String, Long, Long] {
    def zero: Long = 0L
    def reduce(acc: Long, a: String): Long = if (a == target) acc + 1 else acc
    def merge(a: Long, b: Long): Long = a + b
    def finish(acc: Long): Long = acc
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val countRegister: CountMatching = new CountMatching("register")

  /** The literal F2 shape — Aggregator over the full record type, for
    * typed `KeyValueGroupedDataset.agg` (reference takes UserActivity in,
    * FlinkWindowLearning.scala:97).
    */
  object CountRegistrations extends Aggregator[graft.UserActivity, Long, Long] {
    def zero: Long = 0L
    def reduce(acc: Long, a: graft.UserActivity): Long =
      if (a.activity == "register") acc + 1 else acc
    def merge(a: Long, b: Long): Long = a + b
    def finish(acc: Long): Long = acc
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Register SQL-callable UDAFs: `count_register(activity)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("count_register", udaf(countRegister))
}
