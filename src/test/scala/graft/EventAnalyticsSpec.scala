package graft

import org.apache.spark.sql.functions._
import graft.operators.EventWindows

/** Product-analytics operators over `events` (funnel, cohorts,
  * transitions, anomalies): invariants plus exact in-memory replays the
  * DuckDB oracle cannot express as properties.
  */
class EventAnalyticsSpec extends SparkSpec {

  private def events =
    sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("funnel: stages shrink monotonically and match an in-memory replay") {
    val rows = EventWindows.funnel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq("1_view", "2_click", "3_purchase"))
    val byUser = events.groupBy(_._1)
    def stageUsers(prev: Map[Long, Long], etype: String): Map[Long, Long] =
      byUser.flatMap { case (u, es) =>
        prev.get(u).flatMap { t =>
          val after = es.filter(e => e._2 == etype && e._3 > t)
          if (after.isEmpty) None else Some(u -> after.map(_._3).min)
        }
      }
    val s1 = byUser.flatMap { case (u, es) =>
      val v = es.filter(_._2 == "view")
      if (v.isEmpty) None else Some(u -> v.map(_._3).min)
    }
    val s2 = stageUsers(s1, "click")
    val s3 = stageUsers(s2, "purchase")
    assert(rows.map(_._2).toSeq === Seq(s1.size.toLong, s2.size.toLong, s3.size.toLong))
    assert(rows(0)._3 === 1000000L)
    assert(rows(1)._3 === s2.size.toLong * 1000000L / s1.size)
    assert(rows(2)._3 === s3.size.toLong * 1000000L / s2.size)
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2,
      "an ordered funnel can never grow between stages")
  }

  test("cohort retention: offset-0 count is the cohort size, offsets never exceed it") {
    val rows = EventWindows.cohortRetention(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(_._2 >= 0))
    val cohortSize = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (cw, off, n) =>
      assert(n <= cohortSize(cw),
        s"cohort $cw offset $off: $n retained > ${cohortSize(cw)} enrolled")
    }
    // every active user appears in their cohort's offset-0 row
    val nUsers = events.map(_._1).distinct.length.toLong
    assert(cohortSize.values.sum === nUsers)
  }

  test("transitions: rows fan out to exactly the per-type event counts; END once per user") {
    val rows = EventWindows.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byType = events.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.groupBy(_._1).foreach { case (from, rs) =>
      assert(rs.map(_._3).sum === byType(from),
        s"$from rows must sum to its event count")
      val pSum = rs.map(_._4).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"$from probabilities must partition the unit interval up to floor loss")
    }
    val endCount = rows.filter(_._2 == "END").map(_._3).sum
    assert(endCount === events.map(_._1).distinct.length.toLong,
      "each user contributes exactly one terminal transition")
    // deterministic tie-break: identical on a second run
    val again = EventWindows.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === again.toSeq)
  }

  test("gap percentiles: ordered quantiles; totals match a brute-force recount") {
    val out = operators.EventWindows.gapPercentiles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (t, n, p50, p90, p99, mx) =>
      assert(n > 0 && p50 <= p90 && p90 <= p99 && p99 <= mx.toDouble,
        s"$t: quantiles out of order ($p50, $p90, $p99, $mx)")
      assert(p50 >= 0, s"$t: negative gap — ordering bug")
    }
    // brute-force: every event except each user's first contributes a gap
    val evs = events
    val expected = evs.groupBy(_._1).values.map(_.length - 1).sum
    assert(out.map(_._2).sum === expected,
      "every non-first event per user must contribute exactly one gap")
  }

  test("watermark audit: drop rate decreases with delay; bounded by the jitter") {
    val rows = operators.EventWindows.watermarkAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(500L, 1000L, 5000L, 30000L))
    assert(rows.map(_._2).distinct.length === 1, "every delay sees all events")
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "a longer delay can only drop fewer events")
    assert(rows.head._3 > 0,
      "the 10s transit jitter must produce SOME late data at 500ms")
    assert(rows.last._3 === 0,
      "a delay beyond the max jitter can never drop anything")
  }

  test("hourly anomalies: integer z-test matches the float 2-sigma rule") {
    val rows = EventWindows.hourlyAnomalies(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val hourly = events.groupBy(e => (e._2, e._3 / 1000L / 3600000L))
      .view.mapValues(_.length.toLong).toMap
    hourly.keys.map(_._1).toSeq.distinct.foreach { t =>
      val cs = hourly.collect { case ((tt, _), c) if tt == t => c }.toSeq
      val n = cs.length.toLong
      val mean = cs.sum.toDouble / n
      val variance = cs.map(c => (c - mean) * (c - mean)).sum / n
      val nAnom = cs.count(c => (c - mean) * (c - mean) > 4.0 * variance).toLong
      val (_, nHours, meanMicro, flagged) = rows.find(_._1 == t).get
      assert(nHours === n)
      assert(meanMicro === cs.sum * 1000000L / n)
      assert(flagged === nAnom, s"$t: integer test must equal the float 2σ rule")
    }
  }

  test("RFM: two-pass bucket ranks reproduce the naive global-sort segmentation") {
    val rows = EventWindows.rfmSegments(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // independent replay with naive global sorts (the spelling the
    // operator deliberately avoids for scale)
    val purchases = sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mx = purchases.map(_._2).max
    val users = purchases.groupBy(_._1).map { case (u, ps) =>
      val cents = ps.map(p => BigDecimal(p._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).sum.toLongExact
      (u, (mx - ps.map(_._2).max) / 86400000L, ps.length.toLong, cents)
    }.toSeq
    val n = users.length
    def ranks(key: ((Long, Long, Long, Long)) => (Long, Long)): Map[Long, Int] =
      users.sortBy(key).zipWithIndex.map { case (u, i) => u._1 -> (i + 1) }.toMap
    val rr = ranks(u => (u._2, u._1))
    val fr = ranks(u => (-u._3, u._1))
    val mr = ranks(u => (-u._4, u._1))
    def q(rank: Int): Long = 4L * (rank - 1) / n + 1
    val expected = users.groupBy(u => s"R${q(rr(u._1))}F${q(fr(u._1))}M${q(mr(u._1))}")
      .map { case (seg, us) => (seg, us.length.toLong, us.map(_._4).sum) }
      .toSeq.sortBy(_._1)
    assert(rows.toSeq === expected)
  }
}
