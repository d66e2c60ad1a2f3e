package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream→landed-index COMPACTION: the batch job that closes the dedup
  * service's lifecycle loop. A continuously-running near-dup service is
  * two operators plus this handoff:
  *
  *  - [[TextStreams.nearDupGate]] drops arrivals colliding with the
  *    LANDED corpus (stateless stream-static anti-joins on this index);
  *  - [[TextStreams.streamingLshCollisions]] flags arrivals colliding
  *    with EARLIER ARRIVALS (first-arrival bucket ownership in the
  *    state store, TTL'd to the compaction interval);
  *  - this job, run per compaction interval, folds the docs that have
  *    LANDED in the lake since the last run into the gate's index — at
  *    which point the gate owns their buckets and the stream's TTL can
  *    forget them. Drop-set equality across the handoff (an arrival
  *    drops iff it shares a band signature with the landed corpus OR an
  *    earlier arrival — the batch q123 rule) is spec-pinned in
  *    CompactionSpec: the service drops the SAME docs immediately
  *    before and after a compaction.
  *
  * Index layout (one root dir = one gate index):
  * {{{
  *   root/epoch_00000000/bands/   (band INT, sig STRING)   parquet
  *   root/epoch_00000000/hashes/  (h STRING)               parquet
  *   root/epoch_00000001/...                               (delta)
  * }}}
  *
  * Spark-first scale story: a MINOR compaction appends a delta epoch
  * holding ONLY the newly-landed docs' bands/hashes — O(new docs), not
  * O(corpus), per interval. Readers union all published epochs; the
  * gate's left-anti joins are insensitive to duplicate rows across
  * epochs, so deltas never need dedup against history. A MAJOR
  * compaction (run rarely, when the segment count hurts scan planning)
  * folds every epoch into one distinct segment. At 100 TB the index is
  * O(4·docs) 8-byte-signature rows — lake-table-sized metadata, not
  * corpus-sized data — and every operation here is a scan + distinct,
  * no joins.
  *
  * Publish is ATOMIC per epoch (temp dir + rename, the
  * [[graft.operators.Materialize]] contract): a gate constructed
  * mid-compaction reads the old epoch set; the next gate restart reads
  * the new one. A crashed compaction leaves only a `.tmp_` dir that the
  * next run sweeps.
  */
object IndexCompaction {

  private def epochName(n: Long) = f"epoch_$n%08d"

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Published epoch numbers under `root`, ascending. A dir counts only
    * once fully renamed into place (atomic publish), so a reader never
    * sees a half-written epoch.
    */
  def epochs(root: String): Seq[Long] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("epoch_") &&
        !f.getName.contains(".tmp_"))
      .flatMap(f => f.getName.stripPrefix("epoch_").toLongOption)
      .sorted.toSeq

  /** Write `(bands, hashes)` as epoch `n` under `root`, atomically. */
  private def publish(root: String, n: Long, bands: DataFrame,
      hashes: DataFrame): Unit = {
    val rootF = new java.io.File(root)
    rootF.mkdirs()
    // sweep temp dirs from crashed compactions (same fail-safe contract
    // as Materialize: only our own naming pattern, never a published epoch)
    Option(rootF.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains(".tmp_"))
      .foreach(deleteRecursively)
    val pid = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.takeWhile(_ != '@')
    val tmp = new java.io.File(rootF, s"${epochName(n)}.tmp_$pid")
    bands.write.mode("overwrite").parquet(s"$tmp/bands")
    hashes.write.mode("overwrite").parquet(s"$tmp/hashes")
    try java.nio.file.Files.move(tmp.toPath,
      new java.io.File(rootF, epochName(n)).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // lost a publish race for this epoch number: the winner landed the
      // same deterministic content — discard ours
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException |
           _: java.nio.file.FileSystemException
          if new java.io.File(rootF, epochName(n)).isDirectory =>
        deleteRecursively(tmp)
    }
  }

  private def bandsOf(docs: DataFrame): DataFrame =
    graft.operators.Text.bandIndexOf(docs)

  private def hashesOf(docs: DataFrame): DataFrame =
    docs.select(md5(col("text").cast("binary")).as("h")).distinct()

  /** Initialize the index at `root` as epoch 0 over the base `corpus`
    * (doc_id, text). No-op if the index already has epochs.
    */
  def init(spark: SparkSession, root: String, corpus: DataFrame): Unit =
    if (epochs(root).isEmpty)
      publish(root, 0L, bandsOf(corpus), hashesOf(corpus))

  /** MINOR compaction: fold `landedDocs` (doc_id, text — the docs that
    * landed in the lake since the last compaction) into the index as a
    * new delta epoch. Returns the published epoch number. O(new docs).
    */
  def compact(spark: SparkSession, root: String, landedDocs: DataFrame): Long = {
    val next = epochs(root).lastOption.getOrElse(-1L) + 1L
    publish(spark, root, next, landedDocs)
    next
  }

  private def publish(spark: SparkSession, root: String, n: Long,
      docs: DataFrame): Unit =
    publish(root, n, bandsOf(docs), hashesOf(docs))

  /** MAJOR compaction: merge every published epoch into one distinct
    * segment (published as the next epoch number) and drop the merged
    * ones. Run when the delta count hurts scan planning; the gate's
    * anti-joins never require it for correctness.
    */
  def merge(spark: SparkSession, root: String): Long = {
    val es = epochs(root)
    require(es.nonEmpty, s"no index at $root to merge")
    val next = es.last + 1L
    publish(root, next, bands(spark, root).distinct(), hashes(spark, root).distinct())
    es.foreach(e => deleteRecursively(new java.io.File(root, epochName(e))))
    next
  }

  private def union(spark: SparkSession, root: String, sub: String): DataFrame = {
    val paths = epochs(root).map(e => s"$root/${epochName(e)}/$sub")
    require(paths.nonEmpty, s"no index at $root")
    spark.read.parquet(paths: _*)
  }

  /** The index's (band, sig) table — union of all published epochs (may
    * carry cross-epoch duplicates; the gate's anti-join doesn't care).
    */
  def bands(spark: SparkSession, root: String): DataFrame =
    union(spark, root, "bands")

  /** The index's content-hash table (column `h`). */
  def hashes(spark: SparkSession, root: String): DataFrame =
    union(spark, root, "hashes")

  /** [[TextStreams.nearDupGate]] against this landed index: the gate a
    * continuously-running service constructs after each compaction
    * (and after every restart — O(read), no derivation).
    */
  def gate(spark: SparkSession, root: String, stream: DataFrame): DataFrame =
    TextStreams.nearDupGateOn(stream,
      bands(spark, root).localCheckpoint(true),
      hashes(spark, root).localCheckpoint(true))
}
