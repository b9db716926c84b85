package graft.sources

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Socrata-style permit payloads (S1,
  * SURVEY.md §2.1/§4.3): the reference pushes `$where` date filters,
  * column selection and limits to the portal
  * (chicago/permit_cleaning.py:539-554); this source owns the same
  * pushdown surface inside Spark — `SupportsPushDownFilters` (evaluated at
  * the reader, honest row-skipping) and `SupportsPushDownRequiredColumns`
  * (only requested fields are materialized).
  *
  * Format: JSON Lines, all fields read as strings (leading-zero PINs must
  * never infer numeric — same stance as [[Sources.permitsRawSchema]]).
  * One InputPartition per file; a production version would add byte-range
  * splits and `SupportsPushDownLimit`, same shape.
  *
  * Usage: `spark.read.format("graft.sources.PermitsJsonSource")
  *   .option("path", dir).schema(s).load()`.
  */
class PermitsJsonSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Sources.permitsRawSchema

  // accept a user-pinned schema (must still be all-string fields)
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table =
    new PermitsJsonTable(schema, properties.get("path"))
}

final class PermitsJsonTable(schema: StructType, path: String) extends Table with SupportsRead {
  require(path != null, "path option is required")
  override def name(): String = s"permits_json($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PermitsJsonScanBuilder(schema, path)
}

final class PermitsJsonScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** Accept the filter shapes a Socrata `$where` clause supports on string
    * fields: null checks, equality and lexicographic ranges (ISO dates sort
    * correctly as strings). Everything else stays a Spark-side residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case _: IsNotNull | _: IsNull => true
      case EqualTo(_, _: String) => true
      case GreaterThan(_, _: String) => true
      case GreaterThanOrEqual(_, _: String) => true
      case LessThan(_, _: String) => true
      case LessThanOrEqual(_, _: String) => true
      case StringStartsWith(_, _) => true
      case _ => false
    }
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PermitsJsonScan(required, path, pushed)
}

final class PermitsJsonScan(schema: StructType, path: String, filters: Array[Filter])
    extends Scan
    with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"PermitsJsonScan(path=$path, pushed=[${filters.mkString(", ")}], cols=[${schema.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        dir.listFiles().filter(f => f.getName.endsWith(".json") || f.getName.endsWith(".txt"))
      else Array(dir)
    files.sortBy(_.getName).map(f => PermitsJsonInputPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PermitsJsonReaderFactory(schema, filters)
}

final case class PermitsJsonInputPartition(file: String) extends InputPartition

final class PermitsJsonReaderFactory(schema: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PermitsJsonPartitionReader(
      partition.asInstanceOf[PermitsJsonInputPartition].file,
      schema,
      filters
    )
}

/** Streams one JSON-lines file: parse → evaluate pushed filters → project
  * required columns. Rows failing a pushed filter never leave the reader —
  * that is the "honest" part of the pushdown.
  */
final class PermitsJsonPartitionReader(
    file: String,
    schema: StructType,
    filters: Array[Filter]
) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val source = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = source.getLines()
  private var current: InternalRow = _

  private def fieldValue(obj: com.fasterxml.jackson.databind.JsonNode, name: String): String = {
    val n = obj.get(name)
    if (n == null || n.isNull) null else n.asText()
  }

  private def passes(get: String => String): Boolean = filters.forall {
    case IsNotNull(a)              => get(a) != null
    case IsNull(a)                 => get(a) == null
    case EqualTo(a, v: String)     => get(a) != null && get(a) == v
    case GreaterThan(a, v: String) => get(a) != null && get(a) > v
    case GreaterThanOrEqual(a, v: String) => get(a) != null && get(a) >= v
    case LessThan(a, v: String)    => get(a) != null && get(a) < v
    case LessThanOrEqual(a, v: String) => get(a) != null && get(a) <= v
    case StringStartsWith(a, v)    => get(a) != null && get(a).startsWith(v)
    case _                         => true
  }

  override def next(): Boolean = {
    current = null
    while (current == null && lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        val obj = mapper.readTree(line)
        val get = (name: String) => fieldValue(obj, name)
        if (passes(get)) {
          val values = schema.fieldNames.map { f =>
            val v = get(f)
            if (v == null) null else UTF8String.fromString(v)
          }
          current = InternalRow.fromSeq(values.toIndexedSeq)
        }
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}
