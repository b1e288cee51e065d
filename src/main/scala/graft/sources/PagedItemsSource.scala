package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 for a paged item-listing service (SURVEY §2.1 S4-S7, F10).
  *
  * The reference walks SharePoint/Graph list items page by page
  * (/root/reference/jobs/sharepoint_graph_client.py:177-227) pushing `$filter`
  * / `$select` server-side. This source models that shape natively in Spark:
  * one InputPartition per page range (pages fetch in parallel across
  * executors), `SupportsPushDownFilters` forwards site/modified predicates to
  * the "service", and `SupportsPushDownRequiredColumns` prunes the projection
  * (the `$select` analog). The backing service is a deterministic synthetic
  * generator so tests are hermetic; a real HTTP pager plugs in behind
  * [[PagedItemsService.fetchPage]] without touching the planner integration.
  *
  * Usage: spark.read.format("graft.sources.PagedItemsSource")
  *   .option("pages", 8).option("pageSize", 200).load()
  */
class PagedItemsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedItemsService.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedItemsTable(
      properties.getOrDefault("pages", "4").toInt,
      properties.getOrDefault("pageSize", "100").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

/** Deterministic "remote service": splitmix64 rows keyed by (page, slot). */
object PagedItemsService {
  val schema: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("site", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("modified_ms", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  final case class Item(itemId: Long, site: String, title: String,
      modifiedMs: Long, sizeBytes: Long)

  /** One page of items; filters applied "server-side" like OData `$filter`. */
  def fetchPage(page: Int, pageSize: Int, filters: Seq[Filter]): Iterator[Item] = {
    val rows = Iterator.tabulate(pageSize) { slot =>
      val id = page.toLong * pageSize + slot
      val h = mix(id)
      Item(
        itemId = id,
        site = s"site${(h & 0x7fffffff) % 7}",
        title = s"Item $id rev ${(h >>> 33) % 10}",
        modifiedMs = 1700000000000L + (math.abs(h) % 90L) * 86400000L,
        sizeBytes = math.abs(mix(h)) % 1000000L)
    }
    rows.filter(item => filters.forall(accepts(item, _)))
  }

  def accepts(item: Item, f: Filter): Boolean = f match {
    case EqualTo("site", v) => item.site == v
    case GreaterThan("modified_ms", v: Long) => item.modifiedMs > v
    case GreaterThanOrEqual("modified_ms", v: Long) => item.modifiedMs >= v
    case _ => true
  }

  /** Predicates the service can evaluate remotely (the rest stay in Spark). */
  def isPushable(f: Filter): Boolean = f match {
    case EqualTo("site", _) => true
    case GreaterThan("modified_ms", _) => true
    case GreaterThanOrEqual("modified_ms", _) => true
    case _ => false
  }
}

class PagedItemsTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"paged_items($pages x $pageSize)"
  override def schema(): StructType = PagedItemsService.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedItemsScanBuilder(pages, pageSize)
}

class PagedItemsScanBuilder(pages: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedItemsService.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushable, rest) = filters.partition(PagedItemsService.isPushable)
    pushed = pushable
    rest // Spark re-evaluates these
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PagedItemsScan(pages, pageSize, pushed, required)
}

class PagedItemsScan(pages: Int, pageSize: Int, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedItemsScan pages=$pages pushed=[${pushed.mkString(",")}] cols=[${required.fieldNames.mkString(",")}]"
  // one partition per page — the paged protocol parallelized across tasks
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages).map(p => PageInputPartition(p, pageSize): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(pushed, required)
}

case class PageInputPartition(page: Int, pageSize: Int) extends InputPartition

class PagedReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PageInputPartition]
    new PartitionReader[InternalRow] {
      private val it = PagedItemsService.fetchPage(p.page, p.pageSize, pushed.toSeq)
      private var cur: PagedItemsService.Item = _
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "item_id" => cur.itemId
          case "site" => UTF8String.fromString(cur.site)
          case "title" => UTF8String.fromString(cur.title)
          case "modified_ms" => cur.modifiedMs
          case "size_bytes" => cur.sizeBytes
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
