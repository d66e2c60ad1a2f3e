package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** The F2 UDAF surface: a typed Aggregator must agree with the built-in
  * `count(when(...))` it generalizes (SURVEY §2.5).
  */
class AggregatorSpec extends SparkSpec {

  test("Aggregator[String,Long,Long] == count(when(...)) on the fixture") {
    import spark.implicits._
    Aggregators.register(spark)
    val df = fixture
    df.createOrReplaceTempView("ua")
    val viaUdaf = spark.sql("SELECT count_register(activity) FROM ua")
      .collect().head.getLong(0)
    val viaBuiltin = df.agg(count(when(col("activity") === "register", 1)))
      .collect().head.getLong(0)
    assert(viaUdaf === viaBuiltin)
    assert(viaUdaf === 6L)

    // typed path on KeyValueGroupedDataset
    val typed = df.select(col("userId"), col("activity"), col("timestamp"))
      .as[UserActivity]
      .groupByKey(_.userId)
      .agg(Aggregators.CountRegistrations.toColumn.name("regs"))
      .collect().toMap
    assert(typed.values.sum === 6L)
    assert(typed("u1") === 1L)
  }

  test("GraftExtensions registers float_dot as a SQL-callable function") {
    val v = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(v === 9.0)
  }

  test("udaf participates in partial aggregation (multi-partition input)") {
    import spark.implicits._
    val big = (1 to 1000).map(i =>
      UserActivity(s"u$i", if (i % 3 == 0) "register" else "online",
        "2025-08-03T13:00:00Z"))
    val n = big.toDS().repartition(7).map(_.activity)
      .select(Aggregators.countRegister.toColumn)
      .collect().head
    assert(n === 333L)
  }
}
