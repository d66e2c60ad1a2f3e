package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.{Curation, EventWindows, Text}
import graft.sources.Tables

/** Invariant tests for the curation-extension operators (q54–q59); exact
  * values are covered by the DuckDB oracle gate, so these pin the
  * semantic properties a refactor could silently break.
  */
class CurationSpec extends SparkSpec {

  test("q54 bow dedup: canonicalization only merges — unique counts are monotone") {
    val rows = Curation.bowDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, texts, bags, sets) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(texts <= n, "distinct texts cannot exceed docs")
      assert(bags <= texts, "sorting words can only merge classes, never split")
      assert(sets <= bags, "erasing multiplicity can only merge further")
      assert(r.getLong(5) === texts - bags)
    }
  }

  test("q55 containment: ratios recompute from the shingle sets") {
    val docs = Tables.documents(spark, sfDir)
    val sizes = Text.shinglesOf(docs).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Curation.containmentPairs(spark, sfDir).collect()
    assert(rows.nonEmpty, "sf0.001 corpus has near-dup pairs")
    rows.foreach { r =>
      val (d1, d2, common, c1, c2) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(d1 < d2)
      assert(common <= math.min(sizes(d1), sizes(d2)),
        "intersection cannot exceed either set")
      assert(c1 === math.rint(common.toDouble / sizes(d1) * 1e6) / 1e6)
      assert(c2 === math.rint(common.toDouble / sizes(d2) * 1e6) / 1e6)
      assert(math.max(c1, c2) >= 0.8)
    }
  }

  test("q56 word bigrams: top-k agrees with a brute-force recount") {
    val brute = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ").sliding(2).collect {
        case Array(a, b) => s"$a $b"
      })
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val rows = Curation.wordBigrams(spark, sfDir).collect()
    assert(rows.length === 32)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "must be count-descending")
    rows.foreach { r =>
      assert(r.getLong(1) === brute(r.getString(0)))
      assert(r.getLong(2) <= r.getLong(1), "doc frequency <= occurrence count")
    }
  }

  test("q57 click attribution: window bounds hold and -1 marks unattributed") {
    val rows = EventWindows.clickAttribution(spark, sfDir).collect()
    val nPurchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong === nPurchases, "left join keeps every purchase")
    rows.foreach { r =>
      val (pMs, n, lastMs) = (r.getLong(2), r.getLong(3), r.getLong(4))
      if (n == 0) assert(lastMs === -1L)
      else {
        assert(lastMs <= pMs, "attributed click precedes the purchase")
        assert(lastMs > pMs - 600000L, "attributed click inside the 10 min window")
      }
    }
  }

  test("q57 streaming twin: interval-join pairs match batch on real events") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").cast("string").as("impUser"),
        col("event_id").cast("string").as("adId"), col("ts").as("impTime"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").cast("string").as("clickUser"), col("ts").as("clickTime"))
    // batch reference under the identical inclusive interval condition
    val expected = clicks.join(purchases,
        expr("""impUser = clickUser AND clickTime >= impTime AND
                clickTime <= impTime + interval 10 minutes"""))
      .select(col("adId"), col("clickTime")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSet

    val impS = MemoryStream[(String, String, java.sql.Timestamp)](spark)
    val purS = MemoryStream[(String, java.sql.Timestamp)](spark)
    val q = streaming.EventStreams.clickAttribution(
      impS.toDF().toDF("impUser", "adId", "impTime"),
      purS.toDF().toDF("clickUser", "clickTime"),
      delay = "1 minute", horizon = "10 minutes")
      .writeStream.format("memory").queryName("attr_events")
      .outputMode(OutputMode.Append).start()
    try {
      impS.addData(clicks.collect().map(r =>
        (r.getString(0), r.getString(1), r.getTimestamp(2))).toSeq)
      purS.addData(purchases.collect().map(r =>
        (r.getString(0), r.getTimestamp(1))).toSeq)
      q.processAllAvailable()
      val got = spark.table("attr_events").select(col("adId"), col("clickTime"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
      assert(got === expected,
        s"streaming pairs diverge from batch: ${got.diff(expected).take(3)} / ${expected.diff(got).take(3)}")
    } finally q.stop()
  }

  test("q58 temperature sampling: flattens the source distribution deterministically") {
    val rows = Curation.tempSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, accept, kept) =>
      assert(accept <= 1000000L)
      assert(kept <= nDocs)
    }
    // α=0.5 flattening: a strictly larger source never gets a strictly
    // larger acceptance rate
    for ((_, n1, a1, _) <- rows; (_, n2, a2, _) <- rows if n1 < n2)
      assert(a1 >= a2, s"flattening must favor small sources ($n1→$a1 vs $n2→$a2)")
    // deterministic: a second run returns the identical manifest
    val again = Curation.tempSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.sameElements(again))
  }

  test("q58 acceptance rates: exact at adversarial magnitudes (no BIGINT wrap)") {
    import spark.implicits._
    // 20 sources, one dominating at ~1e9 docs: w_micro·N·1e6 ≈ 3.5e22
    // here — far past Long.MaxValue (9.2e18), where the pre-DECIMAL
    // spelling silently wrapped negative (accept_micro = 0 for every
    // head source while DuckDB raises).
    val counts = (1 to 19).map(i => (s"src$i", i.toLong * 1000L * i)) :+
      ("srcBig", 1100000007L)
    val got = Curation.acceptRates(counts.toDF("source", "n_docs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference recompute with BigInt (exact, unbounded)
    val w = counts.map { case (s, n) =>
      s -> BigInt(math.rint(math.sqrt(n.toDouble) * 1e6).toLong)
    }.toMap
    val totalW = w.values.sum
    val nTotal = BigInt(counts.map(_._2).sum)
    counts.foreach { case (src, n) =>
      val expected = (w(src) * nTotal * 1000000 / (totalW * n)) min 1000000
      assert(got(src) == expected.toLong,
        s"$src: got ${got(src)} expected $expected")
      assert(got(src) >= 0L && got(src) <= 1000000L)
    }
    // the flattening property must survive the magnitudes: the giant
    // source is thinned hardest, tiny sources keep everything
    assert(got("srcBig") < got("src1"))
    assert(got("src1") == 1000000L)
  }

  test("q104 cross-modal retention: conjunction bounds and full coverage") {
    val out = Curation.crossmodalRetention(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val withEmb = Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(Tables.embeddings(spark, sfDir),
        col("doc_id") === col("vec_id")).count()
    assert(out.map(_._2).sum === withEmb,
      "every doc carrying an embedding must be accounted")
    out.foreach { case (lang, n, t, sm, q, f) =>
      assert(t <= n && sm <= n && q <= n, s"$lang: kept counts exceed n_docs")
      assert(f <= math.min(t, math.min(sm, q)),
        s"$lang: conjunction must not exceed any single signal")
    }
    // non-vacuous: at least one signal actually cuts something somewhere
    assert(out.exists { case (_, n, t, sm, q, _) => t < n || sm < n || q < n })
  }

  test("q100 bigram LM: micro-nat surprisal matches a brute-force recount") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val uni = texts.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val v = uni.size.toLong
    val bi = texts.values.flatMap(_.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    def microNats(pair: String): Long = {
      val c1 = uni(pair.split(" ").head)
      BigDecimal(-math.log((bi(pair) + 1).toDouble / (c1 + v)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val rows = Curation.bigramLogprob(spark, sfDir).collect()
    assert(rows.length === texts.count(_._2.size >= 2))
    rows.foreach { r =>
      val pairs = texts(r.getLong(0)).sliding(2).map(_.mkString(" ")).toSeq
      assert(r.getLong(1) === pairs.size.toLong)
      val sum = pairs.map(microNats).sum
      assert(r.getLong(2) === sum, s"doc ${r.getLong(0)} surprisal sum")
      assert(r.getLong(3) === sum / pairs.size)
    }
  }

  test("q101 dataset card: fields agree with the queries they summarize") {
    val card = Curation.datasetCard(spark, sfDir).collect().head
    val docs = Tables.documents(spark, sfDir)
    assert(card.getLong(0) === docs.count())
    val dedup = SparkEntry.queries("q33_exact_dedup")(spark, sfDir).collect()
    assert(card.getLong(5) === dedup.map(_.getLong(3)).sum,
      "exact-dup docs must equal the q33 per-language sum")
    val pairs = Text.minhashLshPairs(spark, sfDir, 0.5)
    assert(card.getLong(7) === pairs.count(),
      "near-dup pair count must equal the q35 pair table")
  }

  test("q59 chunk manifest: closed form matches an explicit chunking") {
    def explicitChunks(n: Long, win: Int, stride: Int): Long =
      if (n <= win) 1L else Iterator.from(0).map(_.toLong * stride)
        .takeWhile(start => start + win < n).size + 1L
    val perDoc = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n")).collect().map(_.getLong(0))
    val expectedChunks = perDoc.map(explicitChunks(_, 64, 48)).sum
    val rows = Curation.chunkManifest(spark, sfDir).collect()
    assert(rows.map(_.getLong(3)).sum === expectedChunks,
      "closed-form chunk count must equal the explicit enumeration")
    rows.foreach { r =>
      assert(r.getLong(4) === (r.getLong(3) - r.getLong(1)) * 16,
        "duplicated tokens = (chunks - docs) * overlap")
    }
  }
}
