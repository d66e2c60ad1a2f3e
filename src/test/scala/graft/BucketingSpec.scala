package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.Bucketing

/** Bucketed tables must join with no shuffle — the co-located-join
  * contract that matters at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key plans ZERO shuffles") {
    val orders = sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    try {
      Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
      Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.length} exchanges")
      // and it is still correct
      val expected = li.join(orders, li("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
