package graft

import java.nio.file.Files
import graft.operators.Text

/** Exact substring-level span dedup (q116/q117): golden semantics on a
  * hand-built corpus (including the documented alignment property), plus
  * a pin of the landed span stage against an independent in-memory
  * replay — pure-Scala md5 windows, no Spark expressions — so a future
  * edit to the stage build can't drift both engines in lockstep.
  */
class SpanDedupSpec extends SparkSpec {

  // doc 1/2 share a 90-char prefix: the p=1 and p=31 windows repeat
  // across docs, the p=61 window crosses into their distinct suffixes;
  // doc 3 is one char below a window; doc 4 is exactly one unique window.
  private lazy val dir: String = {
    val d = tempDir("span_src_")
    val prefix = ("the quick brown fox jumps over the lazy dog again and " +
      "again while zebras watch from the hill and more").take(90)
    assert(prefix.length == 90)
    val t1 = prefix + "A" * 30
    val t2 = prefix + "B" * 30
    val t3 = "C" * 59
    val t4 = "D" * 60
    import spark.implicits._
    Seq(
      (1L, t1, "en", "srcA", t1.length.toLong),
      (2L, t2, "en", "srcB", t2.length.toLong),
      (3L, t3, "en", "srcA", t3.length.toLong),
      (4L, t4, "en", "srcB", t4.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d.getAbsolutePath
  }

  test("q116 repeated spans: aligned shared prefix found, suffixes not") {
    val rows = Text.repeatedSpans(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("srcA", 1L, 2L, 2L), ("srcB", 1L, 2L, 2L)))
  }

  test("q117 savings card: occurrence accounting over the same corpus") {
    val r = Text.spanDedupCard(spark, dir).collect().head
    assert(r.getLong(0) == 5)   // {2 shared prefix windows} + 3 unique
    assert(r.getLong(1) == 7)   // 3 + 3 + 0 + 1 windows
    assert(r.getLong(2) == 2)   // one extra occurrence per shared hash
    assert(r.getLong(3) == 120) // 2 × 60-char windows
    assert(r.getLong(4) == 2)   // both shared hashes span ≥2 docs
  }

  test("text_spans stage equals a pure-Scala md5-window replay") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expected = sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .flatMap { r =>
        val (id, src, t) = (r.getLong(0), r.getString(1), r.getString(2))
        (1 to t.length - (Text.SpanW - 1) by Text.SpanStride)
          .map(p => (id, src, h60(t.substring(p - 1, p - 1 + Text.SpanW))))
      }
      .groupBy(identity).view.mapValues(_.length).toMap
    val landed = Text.docSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(landed == expected)
    assert(expected.nonEmpty)
  }

  test("q116/q117 == brute-force replay on seeded corpora with planted dups") {
    import scala.util.Random
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      // random docs + planted whole-doc copies and aligned prefix clones
      val bases = (0 until 10).map(i => (i.toLong, randText(40 + rnd.nextInt(160))))
      val copies = bases.take(3).map { case (id, t) => (100L + id, t) }
      val prefixClones = bases.slice(3, 5).collect {
        case (id, t) if t.length >= 60 => (200L + id, t.take(90.min(t.length)) + randText(45))
      }
      val docs = (bases ++ copies ++ prefixClones).map { case (id, t) =>
        (id, t, "en", s"src${id % 3}", t.length.toLong)
      }
      val d = tempDir(s"span_prop_$seed")
      import spark.implicits._
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

      // brute-force replay of both queries in plain Scala
      val spans = docs.flatMap { case (id, t, _, src, _) =>
        (1 to t.length - 59 by 30).map(p => (id, src, h60(t.substring(p - 1, p + 59))))
      }
      val docsPerHash = spans.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap
      val rep = spans.filter(s => docsPerHash(s._3) >= 2)
      val expected116 = rep.groupBy(_._2).map { case (src, ss) =>
        (src, ss.map(_._1).distinct.size.toLong, ss.map(_._3).distinct.size.toLong, ss.size.toLong)
      }.toSeq.sortBy(_._1)
      val got116 = Text.repeatedSpans(spark, d.getAbsolutePath).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got116 == expected116, s"q116 seed=$seed")

      val occ = spans.groupBy(_._3).view.mapValues(_.size).toMap
      val r117 = Text.spanDedupCard(spark, d.getAbsolutePath).collect().head
      assert(r117.getLong(0) == occ.size.toLong, s"q117 hashes seed=$seed")
      assert(r117.getLong(1) == spans.size.toLong, s"q117 spans seed=$seed")
      assert(r117.getLong(2) == occ.values.map(_ - 1L).sum, s"q117 dups seed=$seed")
      assert(r117.getLong(4) == docsPerHash.values.count(_ >= 2).toLong, s"q117 cross seed=$seed")
    }
  }

  test("codegen span_hashes60 equals the expression-tree spelling it replaced") {
    import org.apache.spark.sql.functions._
    def asBag(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val treeSpelling = expr(
      "CASE WHEN length(text) >= 60 THEN " +
        "transform(sequence(1, length(text) - 59, 30), " +
        "p -> CAST(conv(substr(md5(CAST(substring(text, p, 60) AS BINARY)), " +
        "1, 15), 16, 10) AS BIGINT)) " +
        "ELSE CAST(array() AS ARRAY<BIGINT>) END")
    val docs = sources.Tables.documents(spark, sfDir)
    def bag(c: org.apache.spark.sql.Column) = asBag(
      docs.select(col("doc_id"), explode_outer(c).as("h"))
        .filter(col("h").isNotNull))
    assert(bag(Text.spanHashesExpr("text")) == bag(treeSpelling))
    // and the landed stage is built from the same expression
    assert(bag(Text.spanHashesExpr("text")) ==
      asBag(Text.docSpans(spark, sfDir).select("doc_id", "h")))
  }

  test("span_hashes60 non-ASCII slow path equals the tree spelling and a code-point replay") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // multi-byte corpora exercise the code-point slow path (bytes !=
    // chars): accented Latin, CJK, mixed ASCII/CJK crossing a window
    // boundary, and exact-60 / 59-char (below window) edges
    val cjk = "数据引擎流式处理窗口聚合去重索引检索排序合并扫描广播分区洗牌溢出压缩编码校验哈希分桶布隆过滤采样统计基数估计直方图分位数倾斜盐化" // 64 chars
    val accented = ("résumé café naïve façade coöperate déjà-vu añejo " * 3).trim
    val mixed = ("abc漢字def引擎ghi窗口jkl聚合mno去重pqr索引stu检索vwx" * 3).trim
    val docs = Seq(
      (1L, cjk), (2L, accented), (3L, mixed),
      (4L, cjk.take(60)), (5L, cjk.take(59)), (6L, accented.take(61)))
    docs.foreach { case (id, t) =>
      assert(t.getBytes("UTF-8").length > t.length, s"doc $id must be multi-byte")
    }
    val df = docs.toDF("doc_id", "text")
    val treeSpelling = expr(
      "CASE WHEN length(text) >= 60 THEN " +
        "transform(sequence(1, length(text) - 59, 30), " +
        "p -> CAST(conv(substr(md5(CAST(substring(text, p, 60) AS BINARY)), " +
        "1, 15), 16, 10) AS BIGINT)) " +
        "ELSE CAST(array() AS ARRAY<BIGINT>) END")
    def bag(c: org.apache.spark.sql.Column) = df
      .select(col("doc_id"), explode_outer(c).as("h"))
      .filter(col("h").isNotNull).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = bag(Text.spanHashesExpr("text"))
    assert(got == bag(treeSpelling))
    assert(got.nonEmpty)
    // pure-Scala replay (BMP chars: code points == UTF-16 units here)
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expected = docs.flatMap { case (id, t) =>
      (1 to t.length - 59 by 30).map(p => (id, h60(t.substring(p - 1, p + 59))))
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got == expected)
    assert(expected.exists { case ((id, _), _) => id == 4L }, "exact-60 doc hashes")
    assert(!expected.exists { case ((id, _), _) => id == 5L }, "59-char doc is empty")
  }
}
