package graft

/** Replicates the driver's contract checks locally so a regression is
  * caught by `sbt test` before the round gate runs them.
  */
class EntrySpec extends SparkSpec {

  test("entry: flagship query returns rows at sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has a DuckDB oracle (no weaker rows-only checks)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"missing oracles: ${q -- o}; orphan oracles: ${o -- q}")
  }

  test("query names never collide across inventory files") {
    val names = Registry.all.map(_.name)
    assert(names.size === names.distinct.size,
      s"duplicate names: ${names.diff(names.distinct)}")
  }
}
