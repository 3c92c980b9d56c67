package graft.sources.seq

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-seq` — a deterministic BATCH DataSource V2 table, the batch
  * sibling of the streaming WebSocket source: the full DSv2 read
  * contract on one page, with all three scan-narrowing surfaces
  * implemented for real:
  *
  *  - **filter pushdown** (`SupportsPushDownFilters`): `id` bounds are
  *    accepted into the scan (reported as `PushedFilters` in the plan)
  *    and evaluated inside the reader — Spark never sees a filtered-out
  *    row;
  *  - **partition pruning**: `planInputPartitions` intersects each
  *    slice's `[start, end)` id range with the pushed bounds and SKIPS
  *    non-overlapping slices entirely — the DSv2 analogue of parquet
  *    row-group pruning (a `SeqSourceSpec` asserts the planned
  *    partition count actually shrinks);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): the
  *    reader materializes only the projected fields.
  *
  * Rows are pure integer arithmetic on `id` (bucket = id mod 97, h =
  * id·2654435761 mod 2³¹ — Knuth's multiplicative hash), so any SQL
  * engine can state the same table blindly (`range(n)` in the oracle)
  * and the driver gate certifies the whole read path end-to-end.
  *
  * Options: `rows` (table size, default 1e6), `slices` (partition
  * count, default 64). Scale: the generator is embarrassingly
  * parallel; pushdown + pruning mean a selective query reads O(result)
  * not O(table) — the property the spec pins.
  */
class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqTable.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(64))
}

object SeqTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))
}

class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

class SeqScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows // exclusive
  private var accepted = Array.empty[Filter]
  private var required: StructType = SeqTable.schema

  // Catalyst may hand the bound as java.lang.Long or Integer depending
  // on how the literal was written; accept only integral Numbers — a
  // fractional bound (e.g. LessThan(id, 5.5), reachable if Spark ever
  // stops cast-unwrapping comparisons against a long column) would be
  // truncated by longValue and claimed fully-pushed while applied
  // incorrectly. Non-integral filters stay in the residual set.
  private def isIntegral(v: Any): Boolean = v match {
    case _: java.lang.Long | _: java.lang.Integer |
         _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }
  private def isOurs(f: Filter): Boolean = f match {
    case GreaterThan("id", v)        => isIntegral(v)
    case GreaterThanOrEqual("id", v) => isIntegral(v)
    case LessThan("id", v)           => isIntegral(v)
    case LessThanOrEqual("id", v)    => isIntegral(v)
    case EqualTo("id", v)            => isIntegral(v)
    case _                           => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(isOurs)
    ours.foreach {
      case GreaterThan("id", v: Number)        => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("id", v: Number)           => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("id", v: Number)    => hi = math.min(hi, v.longValue + 1)
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    accepted = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeqScan(rows, slices, lo, hi, required)
}

case class SeqInputPartition(start: Long, end: Long) extends InputPartition

class SeqScan(rows: Long, slices: Int, lo: Long, hi: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq rows=$rows slices=$slices pushed=[$lo, $hi)"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map { i =>
        val s = i * per
        val e = math.min(rows, s + per)
        // intersect the slice with the pushed id bounds — a slice with
        // no overlap is PRUNED at planning, never scheduled
        (math.max(s, lo), math.min(e, hi))
      }
      .filter { case (s, e) => s < e }
      .map { case (s, e) => SeqInputPartition(s, e): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fieldNames = required.fieldNames
    new SeqReaderFactory(fieldNames)
  }
}

class SeqReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqInputPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        val vals = fields.map {
          case "id"     => id
          case "bucket" => id % 97L
          case "h"      => (id * 2654435761L) % 2147483648L
          case other    => throw new IllegalArgumentException(s"unknown column $other")
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
