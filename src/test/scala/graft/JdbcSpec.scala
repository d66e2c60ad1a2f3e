package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{Jdbc, Tables}

/** JDBC sink/source round-trip against embedded Derby (in-JVM, ships
  * with Spark) — the K3 surface, exercised end to end: write with a
  * connection cap, read back single-connection and range-partitioned,
  * and append.
  */
class JdbcSpec extends SparkSpec {

  private val url = Jdbc.derbyMemUrl("grafttest")

  test("write + read round-trips a table through Derby") {
    val nation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    Jdbc.write(nation, url, "nation_rt")

    val back = Jdbc.read(spark, url, "nation_rt")
    assert(back.count() === nation.count())
    val a = nation.orderBy("n_nationkey").collect().map(_.toSeq)
    val b = back.orderBy("N_NATIONKEY").collect().map(_.toSeq)
    assert(a === b)
  }

  test("append mode accumulates rows") {
    val two = Tables.region(spark, sfDir).limit(2)
      .select(col("r_regionkey"), col("r_name"))
    Jdbc.write(two, url, "region_app", mode = SaveMode.Overwrite)
    Jdbc.write(two, url, "region_app", mode = SaveMode.Append)
    assert(Jdbc.read(spark, url, "region_app").count() === 4)
  }

  test("range-partitioned read fans out over numPartitions connections") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
    Jdbc.write(cust, url, "cust_part")

    val n = cust.count()
    val part = Jdbc.readPartitioned(spark, url, "cust_part",
      partitionColumn = "C_CUSTKEY", lowerBound = 1, upperBound = n,
      numPartitions = 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === n)
    // stride partitioning must not drop or duplicate edge rows
    assert(part.agg(sum(col("C_CUSTKEY"))).head.getLong(0)
      === cust.agg(sum(col("c_custkey"))).head.getLong(0))
  }

  test("writer caps connections below upstream partitioning") {
    val wide = spark.range(0, 1000, 1, 32).toDF("id")
    Jdbc.write(wide, url, "wide_cap", maxConnections = 4)
    val back = Jdbc.read(spark, url, "wide_cap")
    assert(back.count() === 1000)
  }
}
