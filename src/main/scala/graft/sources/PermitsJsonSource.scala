package graft.sources

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Socrata-style permit payloads (S1,
  * SURVEY.md §2.1/§4.3): the reference pushes `$where` date filters,
  * column selection, `$order` and `$limit` to the portal
  * (chicago/permit_cleaning.py:539-554 and :546-547); this source owns the
  * same pushdown surface inside Spark — `SupportsPushDownFilters`
  * (evaluated at the reader, honest row-skipping),
  * `SupportsPushDownRequiredColumns` (only requested fields are
  * materialized), `SupportsPushDownLimit` (each reader stops after `limit`
  * surviving rows) and `SupportsPushDownTopN` (each reader keeps only its
  * bounded local top-N under the pushed `$order`). Limit/TopN report
  * PARTIALLY pushed: the source is multi-file, so every partition bounds
  * its own output and Spark's residual Sort/Limit produces the exact
  * global answer — the same division of labor as paging a portal.
  *
  * Format: JSON Lines, all fields read as strings (leading-zero PINs must
  * never infer numeric — same stance as [[Sources.permitsRawSchema]]).
  * Files larger than `splitBytes` (option, default 32 MiB) are split into
  * byte ranges with Hadoop text-input semantics: a split owns exactly the
  * lines whose FIRST byte falls inside it, a reader landing mid-line skips
  * to the next newline (that partial line belongs to the previous split),
  * and the last owned line may run past the range end. One large portal
  * dump therefore fans out across the cluster instead of pinning one task.
  * Gzipped members (`.json.gz`/`.txt.gz`) are read too — undecodable
  * mid-stream, so each is one unsplit partition (standard Hadoop
  * text-input behavior): a gzipped dump parallelizes across files.
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
  ): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // capture the session's Hadoop conf ONCE, here on the driver where a
    // session is guaranteed active — planning and reader creation may later
    // run on threads with no active session (SparkSession.active throws)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new PermitsJsonTable(
      schema,
      opts.get("path"),
      opts.getLong("splitBytes", 32L * 1024 * 1024),
      conf
    )
  }
}

final class PermitsJsonTable(
    schema: StructType,
    path: String,
    splitBytes: Long,
    conf: org.apache.spark.util.SerializableConfiguration
) extends Table
    with SupportsRead {
  require(path != null, "path option is required")
  override def name(): String = s"permits_json($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PermitsJsonScanBuilder(schema, path, splitBytes, conf)
}

final class PermitsJsonScanBuilder(
    fullSchema: StructType,
    path: String,
    splitBytes: Long,
    conf: org.apache.spark.util.SerializableConfiguration
) extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Int = -1
  private var orders: Array[PushedOrder] = Array.empty
  private var aggs: Array[PushedAgg] = Array.empty

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

  /** `$limit`: every partition stops after `l` surviving rows. */
  override def pushLimit(l: Int): Boolean = {
    if (aggs.nonEmpty) return false // the agg row set is already minimal
    limit = l
    true
  }

  /** `$select=count(*),min(c),max(c)` — the SoQL aggregate form. PARTIAL
    * pushdown only (`supportCompletePushDown` stays false): the source is
    * multi-file, so each reader returns ONE row of partition-local
    * partials (count / min / max over its surviving lines) and Spark's
    * residual aggregate merges them (sum of counts, min of mins) — the
    * same division of labor as the partially-pushed TopN. The scan's
    * output is the aggregate columns in the aggregation's order (the
    * DSv2 positional contract): LongType for COUNT(*), the field's own
    * type (all-string schema) for MIN/MAX. Accepted only for ungrouped
    * aggregates over plain top-level columns; anything else stays a
    * Spark-side aggregate over the row scan.
    */
  override def pushAggregation(a: aggregate.Aggregation): Boolean = {
    if (a.groupByExpressions.nonEmpty || limit >= 0 || orders.nonEmpty) return false
    def fieldOf(e: expressions.Expression): String = e match {
      case r: expressions.NamedReference
          if r.fieldNames.length == 1 && fullSchema.fieldNames.contains(r.fieldNames()(0)) =>
        r.fieldNames()(0)
      case _ => null
    }
    val compact: Array[PushedAgg] = a.aggregateExpressions.map {
      case _: aggregate.CountStar => PushedAgg("count", null)
      case m: aggregate.Min =>
        val f = fieldOf(m.column); if (f == null) null else PushedAgg("min", f)
      case m: aggregate.Max =>
        val f = fieldOf(m.column); if (f == null) null else PushedAgg("max", f)
      case _ => null
    }
    if (compact.isEmpty || compact.contains(null)) false
    else {
      aggs = compact
      true
    }
  }

  /** `$order … $limit`: accepted only when every sort key is a plain
    * top-level column of the pinned schema (all strings, so binary UTF-8
    * order — what Spark uses for StringType — is well-defined at the
    * reader).
    */
  override def pushTopN(topNOrders: Array[expressions.SortOrder], l: Int): Boolean = {
    if (aggs.nonEmpty) return false
    val compact = topNOrders.map { o =>
      o.expression() match {
        case ref: expressions.NamedReference if ref.fieldNames().length == 1 &&
            fullSchema.fieldNames.contains(ref.fieldNames()(0)) =>
          PushedOrder(
            ref.fieldNames()(0),
            o.direction() == expressions.SortDirection.DESCENDING,
            o.nullOrdering() == expressions.NullOrdering.NULLS_FIRST
          )
        case _ => null
      }
    }
    if (compact.contains(null)) false
    else {
      orders = compact
      limit = l
      true
    }
  }

  /** Multi-file source: each partition bounds its own output; Spark keeps
    * the residual Sort/Limit for the exact global answer.
    */
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    new PermitsJsonScan(required, path, pushed, limit, orders, aggs, splitBytes, conf)
}

/** Serializable sort-key spec shipped to readers: `nullsFirst` is the
  * FINAL output position of nulls (SortOrder.nullOrdering), independent of
  * direction.
  */
final case class PushedOrder(field: String, descending: Boolean, nullsFirst: Boolean)

/** Serializable pushed-aggregate spec: `kind` ∈ count/min/max, `field`
  * null for COUNT(*).
  */
final case class PushedAgg(kind: String, field: String)

final class PermitsJsonScan(
    schema: StructType,
    path: String,
    filters: Array[Filter],
    limit: Int,
    orders: Array[PushedOrder],
    aggs: Array[PushedAgg],
    splitBytes: Long,
    conf: org.apache.spark.util.SerializableConfiguration
) extends Scan
    with Batch {
  // aggregate pushdown replaces the row schema with the aggregate columns
  // in aggregation order (positional DSv2 contract); all source fields are
  // strings, so MIN/MAX carry StringType and COUNT(*) LongType
  override def readSchema(): StructType =
    if (aggs.isEmpty) schema
    else
      StructType(aggs.map { a =>
        if (a.kind == "count")
          org.apache.spark.sql.types.StructField("count(*)", org.apache.spark.sql.types.LongType, nullable = false)
        else org.apache.spark.sql.types.StructField(s"${a.kind}(${a.field})", StringType)
      })
  override def toBatch: Batch = this
  override def description(): String = {
    val lim = if (limit >= 0) s", pushedLimit=$limit" else ""
    val ord =
      if (orders.nonEmpty)
        s", pushedTopN=[${orders.map(o => o.field + (if (o.descending) " DESC" else " ASC")).mkString(", ")}]"
      else ""
    val agg =
      if (aggs.nonEmpty)
        s", PushedAggregates=[${aggs.map(a => s"${a.kind.toUpperCase}(${if (a.field == null) "*" else a.field})").mkString(", ")}]"
      else ""
    s"PermitsJsonScan(path=$path, pushed=[${filters.mkString(", ")}], cols=[${readSchema().fieldNames.mkString(",")}]$lim$ord$agg)"
  }

  /** Listing goes through the Hadoop FileSystem API (not `java.io.File`),
    * so the portal-dump directory can live on any warehouse scheme —
    * `file:`, `hdfs:`, `s3a:` — exactly like the parquet memo and bucketed
    * tables. At 100 TB the dump directory IS an object-store prefix.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf.value)
    val rootStatus =
      try fs.getFileStatus(root)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalArgumentException(
            s"PermitsJsonSource: path does not exist: $path (scheme ${root.toUri.getScheme})")
      }
    val files =
      if (rootStatus.isDirectory)
        fs.listStatus(root).filter { s =>
          val n = s.getPath.getName
          s.isFile && (n.endsWith(".json") || n.endsWith(".txt") ||
            n.endsWith(".json.gz") || n.endsWith(".txt.gz"))
        }
      else Array(rootStatus)
    files.sortBy(_.getPath.getName).flatMap { st =>
      val len = st.getLen
      val uri = st.getPath.toString
      // gzip is not splittable (standard Hadoop text-input behavior): one
      // reader per .gz member, whatever its size — a gzipped portal dump
      // parallelizes across FILES, not byte ranges
      if (splitBytes <= 0 || len <= splitBytes || uri.endsWith(".gz"))
        Seq(PermitsJsonInputPartition(uri, 0L, len): InputPartition)
      else
        (0L until len by splitBytes).map { s0 =>
          PermitsJsonInputPartition(uri, s0, math.min(s0 + splitBytes, len)): InputPartition
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PermitsJsonReaderFactory(schema, filters, limit, orders, aggs, conf)
}

final case class PermitsJsonInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

final class PermitsJsonReaderFactory(
    schema: StructType,
    filters: Array[Filter],
    limit: Int,
    orders: Array[PushedOrder],
    aggs: Array[PushedAgg],
    conf: org.apache.spark.util.SerializableConfiguration
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PermitsJsonInputPartition]
    new PermitsJsonPartitionReader(p.file, p.start, p.end, schema, filters, limit, orders, aggs, conf)
  }
}

/** Streams one JSON-lines file: parse → evaluate pushed filters → project
  * required columns. Rows failing a pushed filter never leave the reader —
  * that is the "honest" part of the pushdown. A pushed limit stops the
  * reader after `limit` surviving rows; a pushed TopN keeps a bounded
  * buffer of the partition's local top `limit` rows under the pushed
  * orders (UTF8String binary comparison — the same ordering Spark applies
  * to StringType in its residual Sort, so the local winners are exactly
  * the rows the global sort could still pick).
  */
final class PermitsJsonPartitionReader(
    file: String,
    start: Long,
    end: Long,
    schema: StructType,
    filters: Array[Filter],
    limit: Int,
    orders: Array[PushedOrder],
    aggs: Array[PushedAgg],
    conf: org.apache.spark.util.SerializableConfiguration
) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val gzip = file.endsWith(".gz")
  // `end` is a COMPRESSED offset for a .gz member while `pos` counts
  // decompressed bytes — a gz reader owns the whole member, so it reads to
  // stream EOF instead
  private val effEnd: Long = if (gzip) Long.MaxValue else end
  // open through the Hadoop FileSystem (any warehouse scheme); a byte-range
  // split seeks directly to start-1 instead of skipping from offset 0
  private val in: java.io.InputStream = {
    val p = new org.apache.hadoop.fs.Path(file)
    val raw = p.getFileSystem(conf.value).open(p)
    if (gzip) {
      require(start == 0, s"gzip member $file cannot start mid-stream at $start")
      new java.io.BufferedInputStream(new java.util.zip.GZIPInputStream(raw, 1 << 16), 1 << 16)
    } else {
      if (start > 0) raw.seek(start - 1)
      new java.io.BufferedInputStream(raw, 1 << 16)
    }
  }
  // byte offset of the NEXT unread byte
  private var pos: Long = 0L
  private var current: InternalRow = _
  private var emitted: Int = 0
  // TopN path state: built lazily on first next()
  private var topNRows: Iterator[InternalRow] = _

  // Position to the split start with Hadoop LineRecordReader semantics:
  // the stream is already seeked to `start-1`; discard the line CONTAINING
  // that byte. If byte start-1 is a newline, the line beginning exactly at
  // `start` survives (it is this split's first owned line — the previous
  // reader stops before reading a line whose first byte is ≥ its end); if
  // start-1 is mid-line, that partial line belongs to the previous split
  // and is skipped. Every line is read exactly once across splits.
  locally {
    if (start > 0) {
      pos = start - 1
      var b = in.read()
      while (b != -1 && b != '\n') { pos += 1; b = in.read() }
      if (b == '\n') pos += 1
    }
  }

  private val lineBuf = new java.io.ByteArrayOutputStream(1024)

  /** Next line whose first byte lies inside [start, end); null when the
    * split is exhausted. The line itself may extend past `end`.
    */
  private def nextLine(): String = {
    if (pos >= effEnd) return null
    var b = in.read()
    if (b == -1) return null
    lineBuf.reset()
    while (b != -1 && b != '\n') { lineBuf.write(b); pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    new String(lineBuf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

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

  /** Output-order comparator over the pushed sort keys: nulls placed by
    * `nullsFirst`, non-null strings by UTF8String binary order (Spark's
    * StringType ordering), inverted for DESC.
    */
  private def keyCompare(a: Array[UTF8String], b: Array[UTF8String]): Int = {
    var i = 0
    while (i < orders.length) {
      val o = orders(i)
      val c =
        if (a(i) == null && b(i) == null) 0
        else if (a(i) == null) { if (o.nullsFirst) -1 else 1 }
        else if (b(i) == null) { if (o.nullsFirst) 1 else -1 }
        else {
          val raw = a(i).compareTo(b(i))
          if (o.descending) -raw else raw
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Single pass building the partition's local top-`limit`: a max-heap on
    * the OUTPUT-LAST element, so the buffer holds the `limit` best rows
    * seen and eviction is O(log limit). Memory is bounded by the pushed
    * limit, never the file.
    */
  private def buildTopN(): Iterator[InternalRow] = {
    val heap = mutable.PriorityQueue.empty[(Array[UTF8String], InternalRow)](
      Ordering.fromLessThan[(Array[UTF8String], InternalRow)]((x, y) => keyCompare(x._1, y._1) < 0)
    )
    var raw = nextLine()
    while (raw != null) {
      val line = raw.trim
      if (line.nonEmpty) {
        val obj = mapper.readTree(line)
        val get = (name: String) => fieldValue(obj, name)
        if (passes(get)) {
          val keys = orders.map { o =>
            val v = get(o.field)
            if (v == null) null else UTF8String.fromString(v)
          }
          if (heap.size < limit) heap.enqueue((keys, project(get)))
          else if (limit > 0 && keyCompare(keys, heap.head._1) < 0) {
            heap.dequeue()
            heap.enqueue((keys, project(get)))
          }
        }
      }
      raw = nextLine()
    }
    // emission order is irrelevant: the TopN is PARTIALLY pushed, so
    // Spark's residual Sort re-orders the union of partition buffers
    heap.iterator.map(t => t._2)
  }

  private def project(get: String => String): InternalRow = {
    val values = schema.fieldNames.map { f =>
      val v = get(f)
      if (v == null) null else UTF8String.fromString(v)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  /** Pushed-aggregate path: one pass over the split's surviving lines,
    * one emitted row of partition-local partials — count of survivors,
    * min/max per requested field in UTF8String binary order (the same
    * ordering Spark's residual merge applies to StringType, so the local
    * partials are exactly what the global aggregate needs). An empty
    * split contributes (0, null, null) — absorbed by SUM/MIN/MAX.
    */
  private def buildAggRow(): InternalRow = {
    var cnt = 0L
    val mins = new Array[UTF8String](aggs.length)
    val maxs = new Array[UTF8String](aggs.length)
    var raw = nextLine()
    while (raw != null) {
      val line = raw.trim
      if (line.nonEmpty) {
        val obj = mapper.readTree(line)
        val get = (name: String) => fieldValue(obj, name)
        if (passes(get)) {
          cnt += 1
          var i = 0
          while (i < aggs.length) {
            val a = aggs(i)
            if (a.field != null) {
              val v = get(a.field)
              if (v != null) {
                val u = UTF8String.fromString(v)
                if (a.kind == "min" && (mins(i) == null || u.compareTo(mins(i)) < 0)) mins(i) = u
                if (a.kind == "max" && (maxs(i) == null || u.compareTo(maxs(i)) > 0)) maxs(i) = u
              }
            }
            i += 1
          }
        }
      }
      raw = nextLine()
    }
    InternalRow.fromSeq(aggs.zipWithIndex.map { case (a, i) =>
      a.kind match {
        case "count" => cnt
        case "min" => mins(i)
        case "max" => maxs(i)
      }
    }.toIndexedSeq)
  }

  private var aggEmitted = false

  override def next(): Boolean = {
    if (aggs.nonEmpty) {
      if (aggEmitted) { current = null; false }
      else {
        current = buildAggRow()
        aggEmitted = true
        true
      }
    } else if (orders.nonEmpty) {
      if (topNRows == null) topNRows = buildTopN()
      if (topNRows.hasNext) { current = topNRows.next(); true }
      else { current = null; false }
    } else if (limit >= 0 && emitted >= limit) {
      current = null
      false
    } else {
      current = null
      var raw = nextLine()
      while (current == null && raw != null) {
        val line = raw.trim
        if (line.nonEmpty) {
          val obj = mapper.readTree(line)
          val get = (name: String) => fieldValue(obj, name)
          if (passes(get)) current = project(get)
        }
        if (current == null) raw = nextLine()
      }
      if (current != null) emitted += 1
      current != null
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
