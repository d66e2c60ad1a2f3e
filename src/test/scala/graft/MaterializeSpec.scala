package graft

import java.nio.file.Files

import graft.operators.{Materialize, Text}

/** Contracts for the shared-stage materializer: the fail-safe stale-dir
  * sweep (never delete a live or unidentifiable dir) and the key
  * discipline (every semantic parameter of a build is encoded in its
  * key, so a parameter change can never serve a stale landed stage).
  */
class MaterializeSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // stale-dir sweep: fail-safe in every ambiguous case
  // ------------------------------------------------------------------

  test("sweep: dir with live owner pid is NOT stale") {
    val proc = Files.createTempDirectory("fake_proc_").toFile
    Files.createDirectory(proc.toPath.resolve("4242"))
    assert(!Materialize.isStale("graft_mat_4242_host_123", proc))
  }

  test("sweep: dir with dead owner pid IS stale") {
    val proc = Files.createTempDirectory("fake_proc_").toFile
    assert(Materialize.isStale("graft_mat_4242_host_123", proc))
  }

  test("sweep: unparseable pid prefix is kept (fail safe), not deleted") {
    val proc = Files.createTempDirectory("fake_proc_").toFile
    assert(!Materialize.isStale("graft_mat_nopid_host_123", proc))
    assert(!Materialize.isStale("graft_mat_", proc))
  }

  test("sweep: missing /proc (non-Linux) keeps every dir") {
    val gone = new java.io.File("/definitely/not/proc")
    assert(!Materialize.isStale("graft_mat_4242_host_123", gone))
  }

  test("sweep: non-graft names are never candidates") {
    val proc = Files.createTempDirectory("fake_proc_").toFile
    assert(!Materialize.isStale("other_scratch_4242", proc))
  }

  // ------------------------------------------------------------------
  // key discipline
  // ------------------------------------------------------------------

  test("keys encode semantic parameters: distinct thresholds land distinct stages") {
    // two different thresholds on the same corpus must build two
    // different landed tables — if the key dropped the threshold, the
    // second call would silently serve the first call's pairs
    Text.minhashLshPairs(spark, sfDir, threshold = 0.5).count()
    Text.minhashLshPairs(spark, sfDir, threshold = 0.7).count()
    val keys = Materialize.buildSeconds.keySet.filter(_.startsWith("text_pairs_"))
    assert(keys.exists(_.endsWith("_0_5")) && keys.exists(_.endsWith("_0_7")),
      s"threshold must be part of the stage key; built: $keys")
  }

  test("landed stage is built once and re-served: second call adds no build") {
    Text.minhashLshPairs(spark, sfDir, threshold = 0.5).count()
    val before = Materialize.buildSeconds
    Text.minhashLshPairs(spark, sfDir, threshold = 0.5).count()
    assert(Materialize.buildSeconds == before,
      "a second call with identical parameters must read the landed table")
  }

  test("every Materialize.table key template is dir-scoped and stage-unique") {
    // static source scan: each call site's key literal must interpolate
    // the source dir (two corpora can never share a landed stage) and
    // carry a distinct stage prefix (two stages can never collide)
    import scala.jdk.CollectionConverters._
    val srcRoot = java.nio.file.Paths.get("src/main/scala/graft")
    val keyRe = """Materialize\.table\(s,\s*s"([^"]+)"""".r
    val keys = Files.walk(srcRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap(p => keyRe.findAllMatchIn(Files.readString(p)).map(_.group(1)))
      .toList
    assert(keys.nonEmpty, "expected Materialize.table call sites in src/main")
    keys.foreach { k =>
      assert(k.contains("$dir") || k.contains("${dir}"),
        s"key template '$k' must scope by source dir")
    }
    val prefixes = keys.map(_.takeWhile(_ != '$'))
    assert(prefixes.distinct.size == prefixes.size,
      s"stage prefixes must be unique across call sites: $prefixes")
  }
}
