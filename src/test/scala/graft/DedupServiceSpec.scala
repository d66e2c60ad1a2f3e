package graft

import org.apache.spark.sql.functions._

/** Pins for the service's restart-scan helpers — the pieces a crash
  * recovery depends on, exercised directly so the failure modes the
  * smoke can't cheaply reach (a kill past cycle 10) are covered:
  *
  *  - work dirs resume in NUMERIC cycle order ("cycle_10" sorts
  *    lexicographically before "cycle_2"; trusting string order would
  *    resume the wrong dir and silently drop the interrupted cycle);
  *  - a cycle's `_manifest.json` is the authoritative claim record
  *    (zero-copy format), with legacy copy-format dirs still honored;
  *  - a manifest+symlink work dir stays readable by both the batch
  *    reader and a streaming source (underscore files are ignored).
  */
class DedupServiceSpec extends SparkSpec {

  private def mkWork(root: java.io.File, cycle: Int,
      names: Seq[String], manifest: Boolean): java.io.File = {
    val d = new java.io.File(root, s"work/cycle_$cycle")
    d.mkdirs()
    if (manifest) {
      val body = names.map(n =>
        s"""{"name":"$n","path":"/lake/$n","size":1,"mtime":2}""")
        .mkString("[", ",", "]")
      java.nio.file.Files.writeString(
        d.toPath.resolve("_manifest.json"), body): Unit
    } else names.foreach { n =>
      java.nio.file.Files.writeString(d.toPath.resolve(n), "x"): Unit
    }
    d
  }

  test("restart scan past cycle 10: work dirs sort numerically, the " +
      "resume target is the true latest cycle, and the next cycle " +
      "number is max+1 — not the dir count") {
    val root = tempDir("svc_scan")
    // 13 cycles, written out of order; cycle_9 is a LEGACY copy dir
    (0 to 12).foreach { c =>
      mkWork(root, c, Seq(s"arrival_$c.parquet"), manifest = c != 9)
    }
    val dirs = DedupService.workDirsOf(root.getAbsolutePath)
    assert(dirs.map(_.getName) ===
      (0 to 12).map(c => s"cycle_$c").toIndexedSeq,
      "numeric order — lexicographic would put cycle_10..12 before cycle_2")
    assert(dirs.last.getName === "cycle_12",
      "the resume target must be the highest-NUMBERED cycle")
    assert(dirs.lastOption.map(DedupService.cycleNum(_) + 1) === Some(13L),
      "next cycle derives from the numeric max, not list position")
    val claimed = DedupService.claimedNames(dirs)
    assert(claimed === (0 to 12).map(c => s"arrival_$c.parquet").toSet,
      "every cycle's files are claimed — manifests AND the legacy dir")
  }

  test("claimByManifest records the input set without copying bytes " +
      "and the work dir stays readable (batch + streaming source)") {
    import spark.implicits._
    val root = tempDir("svc_claim")
    // the stream dir holds plain parquet FILES (the sliceOrdered /
    // arrival-wave shape the service consumes), not directories
    val lake = new java.io.File(root, "lake")
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
      .repartitionByRange(2, col("doc_id"))
      .write.parquet(lake.getAbsolutePath)
    val fresh = lake.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toIndexedSeq
    assert(fresh.size === 2, "fixture: two plain parquet part files")
    val work = new java.io.File(root, "work/cycle_0"); work.mkdirs()
    DedupService.claimByManifest(fresh, work)
    // the claim is zero-copy: links, not duplicated bytes
    fresh.foreach { f =>
      val link = work.toPath.resolve(f.getName)
      assert(java.nio.file.Files.isSymbolicLink(link),
        s"${f.getName} must be linked, not copied")
    }
    assert(DedupService.claimedNames(Seq(work)) ===
      fresh.map(_.getName).toSet)
    // _manifest.json must not break either reader (underscore-ignored)
    val batch = spark.read.parquet(work.getAbsolutePath)
    assert(batch.count() === 3L)
    val q = spark.readStream.schema(batch.schema)
      .parquet(work.getAbsolutePath)
      .writeStream.format("memory").queryName("svc_claim_stream").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("svc_claim_stream").count() === 3L,
      "the streaming source must read the linked work dir")
  }
}
