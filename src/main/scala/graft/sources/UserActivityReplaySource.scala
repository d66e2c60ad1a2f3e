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
  *     .option("path", file).option("eventsPerBatch", 5).load()
  * }}}
  * Also supports one-shot batch reads (whole file).
  *
  * Scale note: this is a dev/test source (single small file on the
  * driver, like the reference's). Production ingestion is the built-in
  * file/kafka sources; nothing here shuffles or holds executor state.
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

  /** Load + parse the JSON-array file; malformed objects are skipped. */
  def load(path: String): IndexedSeq[UserActivity] = {
    val text = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    text.split("\\}\\s*,\\s*\\{").toIndexedSeq.flatMap(parse)
  }
}

final case class ReplayOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

final case class ReplaySlice(events: Seq[UserActivity]) extends InputPartition

class UserActivityReplayTable(path: String, eventsPerBatch: Int)
    extends Table with SupportsRead {

  override def name(): String = s"user-activity-replay($path)"
  override def schema(): StructType = UserActivityReplay.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private lazy val events = UserActivityReplay.load(path)

      override def build(): Scan = this
      override def readSchema(): StructType = UserActivityReplay.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] =
        Array(ReplaySlice(events))
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
            * construction.
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
              case _: ReadAllAvailable => events.length.toLong
              case c: CompositeReadLimit =>
                // honor the tightest component we understand; a composite
                // of only min-rows-style limits means "no cap"
                val steps = c.getReadLimits.toSeq.collect {
                  case m: ReadMaxRows => m.maxRows()
                }
                if (steps.nonEmpty) steps.min else events.length.toLong
              case other =>
                throw new UnsupportedOperationException(
                  s"user-activity-replay does not support read limit $other")
            }
            ReplayOffset(math.min(events.length.toLong, s + step(limit)))
          }

          override def latestOffset(): Offset =
            throw new UnsupportedOperationException(
              "paced replay uses latestOffset(start, limit)")

          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
            val s = start.asInstanceOf[ReplayOffset].index.toInt
            val e = end.asInstanceOf[ReplayOffset].index.toInt
            Array(ReplaySlice(events.slice(s, e)))
          }

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
      private val it = partition.asInstanceOf[ReplaySlice].events.iterator
      private var current: UserActivity = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(current.userId),
        UTF8String.fromString(current.activity),
        UTF8String.fromString(current.timestamp)))
      override def close(): Unit = ()
    }
}
