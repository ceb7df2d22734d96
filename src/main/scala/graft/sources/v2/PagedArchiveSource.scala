package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** One record of a paginated archive listing — the shape the
  * reference's discovery scan consumes (bvid, title, pubdate per
  * video, reference `bilibili/video.py:83-97`).
  */
case class ArchiveRecord(bvid: String, title: String, pubdate: Long)

/** The pluggable page iterator behind [[PagedArchiveSource]] (S4).
  *
  * Implementations wrap whatever actually serves pages — an HTTP
  * client with retry/backoff in production, a synthetic generator in
  * tests. Instantiated REFLECTIVELY ON THE EXECUTOR from the
  * `fetcher` option (a class name with a no-arg constructor), so no
  * connection state is serialized from the driver — the per-executor
  * construction boundary that an HTTP session/auth token needs.
  */
trait PageFetcher {
  /** All scan keys (e.g. creator mids) this fetcher can list. */
  def keys(): Seq[Long]
  /** Page `pn` (1-based) for `key`: up to `pageSize` records, sorted
    * by pubdate DESCENDING — the order the early-stop contract needs.
    */
  def fetch(key: Long, pn: Int, pageSize: Int): Seq[ArchiveRecord]
}

/** DataSource V2 for the reference's paginated REST listings (S4):
  *
  * {{{
  * spark.read.format("paged-archives")
  *   .option("fetcher", classOf[MyHttpFetcher].getName)
  *   .option("pageSize", 30)
  *   .option("anchors", "101:1700000000,102:1690000000")  // mid:pubdate
  *   .load()
  * }}}
  *
  * Spark-native execution shape: pagination is inherently sequential
  * PER KEY (page n+1 is only needed if page n didn't stop), so the
  * parallel axis is the KEY dimension — one input partition per scan
  * key, each walking its own page sequence inside the partition
  * reader. The reference iterates creators serially
  * (`bilibililocal.py:47-75`); here a 1000-executor cluster walks
  * 1000 creators concurrently while preserving each walk's
  * early-stop semantics:
  *
  *  - '''watermark early-stop''' (`bilibili/video.py:84-100`): pages
  *    arrive sorted by pubdate desc; at the first record with
  *    `pubdate <= anchor(key)` the reader drops it and stops fetching
  *    — already-ingested history is never re-paged. The emitted rows
  *    are exactly the S5 anchor-filter semantics (oracle-checked as
  *    `incr_anchor_scan`), minus the pages never fetched.
  *  - '''short-page termination''' (`bilibililocal.py:92-102`): a
  *    page with fewer than `pageSize` records is the last one.
  *
  * Column pruning is pushed into the reader like the transcript
  * source; rate limiting/retry (reference X2/X3) lives inside the
  * fetcher implementation, where the HTTP client is.
  */
class PagedArchiveSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "paged-archives"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedArchiveSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(schema == PagedArchiveSource.schema,
      s"paged-archives has a fixed schema ${PagedArchiveSource.schema.simpleString}; got ${schema.simpleString}")
    new PagedArchiveTable(new CaseInsensitiveStringMap(properties))
  }
}

object PagedArchiveSource {
  val schema: StructType = StructType(Seq(
    StructField("mid", LongType),
    StructField("bvid", StringType),
    StructField("title", StringType),
    StructField("pubdate", LongType)))

  def instantiate(className: String): PageFetcher =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[PageFetcher]

  /** `"101:17,102:16"` → `Map(101L -> 17L, 102L -> 16L)` */
  def parseAnchors(s: String): Map[Long, Long] =
    s.split(",").iterator.filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.toLong -> v.trim.toLong
    }.toMap
}

class PagedArchiveTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"paged-archives(${options.get("fetcher")})"
  override def schema(): StructType = PagedArchiveSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagedArchiveScanBuilder(o)
}

class PagedArchiveScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedArchiveSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PagedArchiveScan(
    options.get("fetcher"),
    options.getInt("pageSize", 30),
    Option(options.get("anchors")).map(PagedArchiveSource.parseAnchors)
      .getOrElse(Map.empty),
    required)
}

class PagedArchiveScan(fetcherClass: String, pageSize: Int,
    anchors: Map[Long, Long], required: StructType) extends Scan with Batch {
  require(fetcherClass != null, "option 'fetcher' (PageFetcher class name) is required")
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedArchiveScan(fetcher=$fetcherClass, pageSize=$pageSize)"

  /** One partition per scan key — the key list comes from a
    * driver-side fetcher instance (metadata-sized), the page walks run
    * on executors.
    */
  override def planInputPartitions(): Array[InputPartition] =
    PagedArchiveSource.instantiate(fetcherClass).keys().map { k =>
      PagedKeyPartition(k, anchors.getOrElse(k, Long.MinValue)): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(fetcherClass, pageSize, required)
}

case class PagedKeyPartition(key: Long, anchor: Long) extends InputPartition

class PagedReaderFactory(fetcherClass: String, pageSize: Int,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[PagedKeyPartition]
    new PagedPartitionReader(
      PagedArchiveSource.instantiate(fetcherClass),
      kp.key, kp.anchor, pageSize, required)
  }
}

/** Walks one key's page sequence with the two stop rules. Pages are
  * pulled lazily — a key whose newest record is already behind the
  * anchor costs exactly one page fetch.
  */
class PagedPartitionReader(fetcher: PageFetcher, key: Long, anchor: Long,
    pageSize: Int, required: StructType) extends PartitionReader[InternalRow] {

  private val idx = PagedArchiveSource.schema.fieldNames
    .map(n => n -> required.fieldNames.indexOf(n)).toMap

  private var pn = 0
  private var page: Seq[ArchiveRecord] = Nil
  private var pos = 0
  private var lastPage = false
  private var current: ArchiveRecord = _

  override def next(): Boolean = {
    while (true) {
      if (pos < page.length) {
        val rec = page(pos)
        pos += 1
        if (rec.pubdate <= anchor) return false // watermark early-stop
        current = rec
        return true
      }
      if (lastPage) return false
      pn += 1
      page = fetcher.fetch(key, pn, pageSize)
      pos = 0
      lastPage = page.length < pageSize // short-page termination
    }
    false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    if (idx("mid") >= 0) row.setLong(idx("mid"), key)
    if (idx("bvid") >= 0) row.update(idx("bvid"), UTF8String.fromString(current.bvid))
    if (idx("title") >= 0) row.update(idx("title"), UTF8String.fromString(current.title))
    if (idx("pubdate") >= 0) row.setLong(idx("pubdate"), current.pubdate)
    row
  }

  override def close(): Unit = ()
}
