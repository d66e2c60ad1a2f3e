package graft

import org.apache.spark.sql.functions._

/** Pins for the scale-rehearsal corpus generator — SCALING.md's sf1
  * column is only as good as these properties:
  *
  *  - DETERMINISM: two generate() runs (same seed) produce identical
  *    rows for every table — values are pure functions of (id, salt,
  *    seed), independent of partitioning and run order;
  *  - a different seed actually changes the data (the knob is live);
  *  - SCHEMA PARITY: every table's (name, type) set matches the
  *    driver's testdata exactly, so Bench/StreamBench/Tables read the
  *    generated lake unchanged;
  *  - the structural invariants the text/vector stages depend on:
  *    near-dup rate ~5%, unit-norm embeddings, 10 labels, the shared
  *    31-token vocabulary ("dup" included).
  */
class GenCorpusSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def rowFingerprint(dir: String, table: String): (Long, Long) = {
    val df = spark.read.parquet(s"$dir/$table.parquet")
    // order-insensitive content hash: sum + xor of per-row hashes over
    // every column (casting arrays to json for a stable hash input)
    val cols = df.schema.fields.map { f =>
      if (f.dataType.typeName == "array") to_json(col(f.name))
      else col(f.name).cast("string")
    }
    // both aggregates in modular space — a raw SUM of 64-bit hashes
    // overflows under ANSI mode
    val h = df.select(xxhash64(cols: _*).as("h"))
    val r = h.agg(sum(pmod(col("h"), lit(1000003L))),
      sum(pmod(col("h"), lit(999983L)))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("same seed => byte-identical content; different seed => different") {
    val a = tempDir("gen_a").getAbsolutePath
    val b = tempDir("gen_b").getAbsolutePath
    val c = tempDir("gen_c").getAbsolutePath
    tools.GenCorpus.generate(spark, a, 0.004, 42L)
    tools.GenCorpus.generate(spark, b, 0.004, 42L)
    tools.GenCorpus.generate(spark, c, 0.004, 7L)
    tables.foreach { t =>
      assert(rowFingerprint(a, t) === rowFingerprint(b, t),
        s"$t must be identical across runs with the same seed")
    }
    assert(rowFingerprint(a, "documents") !== rowFingerprint(c, "documents"),
      "the seed must actually change the data")
  }

  test("schema parity with the driver lake, and the structural " +
      "invariants the text/vector stages depend on") {
    val g = tempDir("gen_p").getAbsolutePath
    tools.GenCorpus.generate(spark, g, 0.01, 42L)
    tables.foreach { t =>
      val ref = spark.read.parquet(s"/root/testdata/sf0.01/$t.parquet")
        .schema.map(f => (f.name, f.dataType)).toSet
      val gen = spark.read.parquet(s"$g/$t.parquet")
        .schema.map(f => (f.name, f.dataType)).toSet
      assert(gen === ref, s"$t schema must match the driver lake")
    }
    import spark.implicits._
    val docs = spark.read.parquet(s"$g/documents.parquet")
    val n = docs.count()
    val dups = docs.filter(col("text").contains(" dup ")).count()
    assert(dups > n / 50 && dups < n / 10,
      s"near-dup rate must stay ~5% of $n, got $dups")
    val vocab = docs.select(explode(split(col("text"), " ")))
      .distinct().count()
    assert(vocab === 31L, "30 base tokens + the dup marker")
    val emb = spark.read.parquet(s"$g/embeddings.parquet")
    val norms = emb.select(sqrt(aggregate(col("embedding"), lit(0d),
      (acc, x) => acc + x * x)).as("n")).agg(min("n"), max("n")).head()
    assert(math.abs(norms.getDouble(0) - 1d) < 1e-3 &&
      math.abs(norms.getDouble(1) - 1d) < 1e-3, "unit-norm embeddings")
    assert(emb.select(col("label")).distinct().count() === 10L)
  }

  test("--skew concentrates ~30% of fact keys on the hot entities and " +
      "~25% of word draws on the hot tokens; base columns are unchanged") {
    val plain = tempDir("gen_flat").getAbsolutePath
    val skew = tempDir("gen_skew").getAbsolutePath
    tools.GenCorpus.generate(spark, plain, 0.004, 42L)
    tools.GenCorpus.generate(spark, skew, 0.004, 42L, skew = true)

    def hotShare(dir: String, table: String, key: String, nHot: Int): Double = {
      val df = spark.read.parquet(s"$dir/$table.parquet")
      df.filter(col(key) < nHot).count().toDouble / df.count()
    }
    // hot share = 30% routed + the uniform mass the hot ids keep
    assert(hotShare(skew, "orders", "o_custkey", 10) > 0.25)
    assert(hotShare(plain, "orders", "o_custkey", 10) < 0.1)
    assert(hotShare(skew, "lineitem", "l_suppkey", 5) > 0.25)
    assert(hotShare(skew, "lineitem", "l_partkey", 10) > 0.25)
    assert(hotShare(skew, "events", "user_id", 10) > 0.25)

    def hotTokenShare(dir: String): Double = {
      val toks = spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("tok"))
      toks.filter(col("tok").isin("data", "the")).count().toDouble /
        toks.count()
    }
    assert(hotTokenShare(skew) > 0.2, "hot tokens must dominate word draws")
    assert(hotTokenShare(plain) < 0.12, "the flat corpus draws uniformly")

    // skew touches ONLY the intended key/token columns: everything else
    // (row counts, keys, measures) is bit-identical to the flat run
    def agree(table: String, cols: Seq[String]): Unit = {
      val sel = cols.map(col)
      val a = spark.read.parquet(s"$plain/$table.parquet").select(sel: _*)
      val b = spark.read.parquet(s"$skew/$table.parquet").select(sel: _*)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$table ${cols.mkString(",")} must not change under --skew")
    }
    agree("orders", Seq("o_orderkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    agree("lineitem", Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate"))
    agree("events", Seq("event_id", "ts", "event_type", "value"))
    agree("customer", Seq("c_custkey", "c_name", "c_nationkey",
      "c_acctbal", "c_mktsegment"))
    // documents keep their structure (ids, sources, dup mechanics) —
    // only the token draws change
    agree("documents", Seq("doc_id", "source"))
    val dups = spark.read.parquet(s"$skew/documents.parquet")
      .filter(col("text").contains(" dup ")).count()
    assert(dups > 0, "dup mechanics must survive the hot-token rewrite")
  }
}
