package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.util.matching.Regex

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.UserActivity

/** Replay source (SURVEY §2.1 S1–S5): the reference's only custom
  * component is a SourceFunction that reads a whole JSON-array file,
  * regex-parses each object, skips malformed records, and emits events
  * one-by-one with a wall-clock delay to simulate a live stream
  * (reference: src/main/scala/generators/useractivity/package.scala:14-75).
  *
  * Spark-first redesign as a DataSource V2 `MicroBatchStream`: event time
  * is decoupled from arrival time, so correctness needs no sleeping —
  * pacing is expressed as `eventsPerBatch` (offset-range growth per
  * micro-batch) plus the query's trigger interval, giving deterministic,
  * replayable batches with exactly-once offset tracking instead of a
  * non-replayable push loop.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("user-activity-replay")
  *     .option("path", fileOrDir).option("eventsPerBatch", 5).load()
  * }}}
  * Also supports one-shot batch reads (all segments).
  *
  * `path` may be a DIRECTORY of segment files replayed in name order:
  * offsets are global indices over the concatenation, the driver plans
  * per-file ranges (counting each file's events lazily, count-only),
  * and EXECUTORS parse their own segment — so the source scales with
  * segment count instead of one driver-read file. Segment files must be
  * on storage all executors can reach (as with any file source).
  *
  * Scale note: still a dev/test-shaped source (the reference's is a
  * single-file push loop); production ingestion is the built-in
  * file/kafka sources. Nothing here shuffles or holds executor state.
  */
class UserActivityReplayProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "user-activity-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UserActivityReplay.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new UserActivityReplayTable(
      properties.get("path"),
      Option(properties.get("eventsPerBatch")).map(_.toInt).getOrElse(5))
}

object UserActivityReplay {
  val schema: StructType = StructType(Seq(
    StructField("userId", StringType),
    StructField("activity", StringType),
    StructField("timestamp", StringType)))

  // Same skip-and-report parse policy as the reference (package.scala:19-36):
  // per-field regex extraction; any missing field -> record dropped.
  private val userIdR: Regex = "\"userId\"\\s*:\\s*\"([^\"]+)\"".r
  private val activityR: Regex = "\"activity\"\\s*:\\s*\"([^\"]+)\"".r
  private val timestampR: Regex = "\"timestamp\"\\s*:\\s*\"([^\"]+)\"".r

  def parse(obj: String): Option[UserActivity] =
    for {
      u <- userIdR.findFirstMatchIn(obj).map(_.group(1))
      a <- activityR.findFirstMatchIn(obj).map(_.group(1))
      t <- timestampR.findFirstMatchIn(obj).map(_.group(1))
    } yield UserActivity(u, a, t)

  /** Load + parse one JSON-array file; malformed objects are skipped. */
  def load(path: String): IndexedSeq[UserActivity] = {
    val text = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    text.split("\\}\\s*,\\s*\\{").toIndexedSeq.flatMap(parse)
  }

  /** Resolve `path` to the ordered segment list: a directory replays its
    * `*.json`/`*.jsonl` files in NAME order (the producer's naming —
    * e.g. zero-padded sequence numbers — defines replay order, like
    * Kafka segment files); a plain file is a one-segment replay.
    */
  def segments(path: String): IndexedSeq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles((_, n) => n.endsWith(".json") || n.endsWith(".jsonl"))
        .map(_.getPath).sorted.toIndexedSeq
    else IndexedSeq(path)
  }

  /** Map a global offset range [s, e) over per-segment event counts to
    * (segmentIndex, localStart, localEnd) slices — the offset arithmetic
    * of the multi-file replay, extracted pure so the property spec can
    * pin it: the slices partition [s, e) exactly, in segment order, each
    * within its segment's bounds. Counts past the range are never
    * consulted (callers count lazily).
    */
  def sliceRanges(counts: IndexedSeq[Long], s: Long,
      e: Long): Seq[(Int, Long, Long)] = {
    val out = Seq.newBuilder[(Int, Long, Long)]
    var acc = 0L
    var i = 0
    while (acc < e && i < counts.length) {
      val n = counts(i)
      val lo = math.max(s - acc, 0L)
      val hi = math.min(e - acc, n)
      if (lo < hi) out += ((i, lo, hi))
      acc += n
      i += 1
    }
    out.result()
  }
}

final case class ReplayOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** One file's slice of the replay: the EXECUTOR re-reads and parses
  * `path` and emits local indices [start, end) — the driver plans
  * ranges, it never ships event data. `end = Int.MaxValue` means
  * "through end of file" (lets a batch read plan without driver-side
  * counting).
  */
final case class ReplayFileSlice(path: String, start: Int, end: Int)
    extends InputPartition

class UserActivityReplayTable(path: String, eventsPerBatch: Int)
    extends Table with SupportsRead {

  override def name(): String = s"user-activity-replay($path)"
  override def schema(): StructType = UserActivityReplay.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      /** Ordered segment files (one for a plain-file path). The driver
        * plans offset RANGES over the concatenated sequence; per-file
        * event counts are computed lazily and count-only — the driver
        * retains no event data, and only parses a file once the replay
        * frontier reaches it, so a directory of many segments costs the
        * driver one file at a time, not the whole corpus up front.
        */
      private lazy val files = UserActivityReplay.segments(path)
      private val counts =
        new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
      private def countOf(f: String): Long =
        counts.computeIfAbsent(f, p => UserActivityReplay.load(p).length.toLong)

      /** Total events across segments, counting only until `atLeast` is
        * covered (or every segment is counted).
        */
      private def totalUpTo(atLeast: Long): Long = {
        var tot = 0L
        val it = files.iterator
        while (tot < atLeast && it.hasNext) tot += countOf(it.next())
        tot
      }

      /** Map a global [s, e) range to one partition per overlapping
        * file — a multi-file micro-batch reads its files in parallel,
        * each executor parsing only its own segment. The offset math is
        * [[UserActivityReplay.sliceRanges]] (property-pinned); only the
        * files the range reaches are counted.
        */
      private def fileSlices(s: Long, e: Long): Array[InputPartition] = {
        val reached = scala.collection.mutable.ArrayBuffer.empty[Long]
        var acc = 0L
        val it = files.iterator
        while (acc < e && it.hasNext) {
          val n = countOf(it.next()); reached += n; acc += n
        }
        UserActivityReplay.sliceRanges(reached.toIndexedSeq, s, e)
          .map { case (i, lo, hi) =>
            ReplayFileSlice(files(i), lo.toInt, hi.toInt): InputPartition
          }.toArray
      }

      override def build(): Scan = this
      override def readSchema(): StructType = UserActivityReplay.schema
      override def toBatch: Batch = this

      // batch read: one whole-file partition per segment, no driver parse
      override def planInputPartitions(): Array[InputPartition] =
        files.map(f => ReplayFileSlice(f, 0, Int.MaxValue): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        ReplayReaderFactory

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream with SupportsAdmissionControl {
          override def initialOffset(): Offset = ReplayOffset(0L)

          /** Replay pacing via admission control, the DSv2 rate-limit
            * surface (what Kafka's maxOffsetsPerTrigger uses): each
            * trigger the engine hands in the restored/committed start
            * offset and the read limit, and the stream admits the next
            * `eventsPerBatch` events after it. Stateless — a plain
            * `latestOffset()` pace counter starts at 0 on checkpoint
            * restart and regresses below the committed offset (observed:
            * a (10, 5) batch re-delivering rows 5-10 under a new batch
            * id), which admission control makes impossible by
            * construction. Offsets are GLOBAL indices over the segment
            * concatenation, so a single-file checkpoint stays valid when
            * its file later becomes segment 0 of a directory.
            */
          override def getDefaultReadLimit: ReadLimit =
            ReadLimit.maxRows(eventsPerBatch.toLong)

          override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
            val s = start.asInstanceOf[ReplayOffset].index
            // Only the limits this source can honor are matched; anything
            // else (a future engine-side limit kind) fails loudly instead
            // of silently reading all-available.
            def step(l: ReadLimit): Long = l match {
              case m: ReadMaxRows      => m.maxRows()
              case _: ReadAllAvailable => Long.MaxValue
              case c: CompositeReadLimit =>
                // honor the tightest component we understand; a composite
                // of only min-rows-style limits means "no cap"
                val steps = c.getReadLimits.toSeq.collect {
                  case m: ReadMaxRows => m.maxRows()
                }
                if (steps.nonEmpty) steps.min else Long.MaxValue
              case other =>
                throw new UnsupportedOperationException(
                  s"user-activity-replay does not support read limit $other")
            }
            val target =
              if (step(limit) >= Long.MaxValue - s) Long.MaxValue
              else s + step(limit)
            // counts segments only up to the admitted frontier
            ReplayOffset(math.min(totalUpTo(target), target))
          }

          override def latestOffset(): Offset =
            throw new UnsupportedOperationException(
              "paced replay uses latestOffset(start, limit)")

          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
            fileSlices(start.asInstanceOf[ReplayOffset].index,
              end.asInstanceOf[ReplayOffset].index)

          override def createReaderFactory(): PartitionReaderFactory =
            ReplayReaderFactory
          override def deserializeOffset(json: String): Offset =
            ReplayOffset(json.toLong)
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
}

object ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val slice = partition.asInstanceOf[ReplayFileSlice]
      private val it = UserActivityReplay.load(slice.path)
        .slice(slice.start, slice.end).iterator
      private var current: UserActivity = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(current.userId),
        UTF8String.fromString(current.activity),
        UTF8String.fromString(current.timestamp)))
      override def close(): Unit = ()
    }
}
