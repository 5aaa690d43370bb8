package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source generating the `events` fixture shape
  * deterministically from the row id — a file-less load generator for
  * correctness and scale tests at ANY size:
  *
  * {{{
  * spark.read.format("graft.sources.SyntheticEventsProvider")
  *   .option("rows", "1000000").option("partitions", "64").load()
  * }}}
  *
  * Each input partition owns a contiguous id range, so generation is
  * embarrassingly parallel and repeatable: row i is a pure function of
  * i (splitmix64), independent of partitioning — the property that
  * lets a 1000-executor cluster generate petabytes with no shuffle,
  * no driver involvement, and stable results.
  */
class SyntheticEventsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(4)
    new SyntheticEventsTable(rows, parts)
  }
}

object SyntheticEvents {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  private val types = Array("click", "error", "purchase", "signup", "view")
  private val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Row i as a pure function of i. */
  def row(i: Long): (Long, Long, Long, String, Double, String) = {
    val h = splitmix64(i)
    val tsMicros = baseMicros + java.lang.Math.floorMod(h, 30L * 86400) * 1000000L
    val user = java.lang.Math.floorMod(h >>> 8, 1000L)
    val tpe = types(java.lang.Math.floorMod(h >>> 16, types.length.toLong).toInt)
    val value = java.lang.Math.floorMod(h >>> 24, 30000L) / 100.0
    val k = java.lang.Math.floorMod(h >>> 40, 100L)
    (i, tsMicros, user, tpe, value, s"""{"k": $k}""")
  }

  /** One field of row i, by schema index — the pruned-scan path
    * generates (and allocates) only the requested fields.
    */
  def field(i: Long, idx: Int): Any = {
    val h = splitmix64(i)
    idx match {
      case 0 => i
      case 1 => baseMicros + java.lang.Math.floorMod(h, 30L * 86400) * 1000000L
      case 2 => java.lang.Math.floorMod(h >>> 8, 1000L)
      case 3 => UTF8String.fromString(
        types(java.lang.Math.floorMod(h >>> 16, types.length.toLong).toInt))
      case 4 => java.lang.Math.floorMod(h >>> 24, 30000L) / 100.0
      case 5 => UTF8String.fromString(
        s"""{"k": ${java.lang.Math.floorMod(h >>> 40, 100L)}}""")
    }
  }
}

class SyntheticEventsTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic_events($rows)"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      // Column pruning pushed into the source: Catalyst hands the
      // required schema down and only those fields are generated —
      // the DSv2 analog of parquet ReadSchema pruning.
      private var required: StructType = SyntheticEvents.schema

      override def pruneColumns(requiredSchema: StructType): Unit =
        if (requiredSchema.nonEmpty) required = requiredSchema

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + parts - 1) / parts)
        (0L until rows by per)
          .map(start => IdRange(start, math.min(start + per, rows)))
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val fieldIdx = required.fieldNames
          .map(SyntheticEvents.schema.fieldIndex).toArray
        (partition: InputPartition) => {
          val IdRange(start, end) = partition.asInstanceOf[IdRange]
          new PartitionReader[InternalRow] {
            private var i = start - 1
            override def next(): Boolean = { i += 1; i < end }
            override def get(): InternalRow =
              InternalRow.fromSeq(fieldIdx.toSeq.map(SyntheticEvents.field(i, _)))
            override def close(): Unit = ()
          }
        }
      }
    }
}

case class IdRange(start: Long, end: Long) extends InputPartition
