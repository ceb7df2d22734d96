package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** One record of a paginated archive listing — the shape the
  * reference's discovery scan consumes (bvid, title, pubdate per
  * video, reference `bilibili/video.py:83-97`).
  */
case class ArchiveRecord(bvid: String, title: String, pubdate: Long,
    pic: String = "")

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
    StructField("pubdate", LongType),
    StructField("pic", StringType)))

  def instantiate(className: String): PageFetcher =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[PageFetcher]

  /** `"101:17,102:16"` → `Map(101L -> 17L, 102L -> 16L)` */
  def parseAnchors(s: String): Map[Long, Long] =
    s.split(",").iterator.filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.toLong -> v.trim.toLong
    }.toMap

  /** `"101:17:9,..."` → `Map(101L -> (after 17, before 9))` — the
    * two-sided backfill window per key.
    */
  def parseBounds(s: String): Map[Long, (Long, Long)] =
    s.split(",").iterator.filter(_.nonEmpty).map { kv =>
      val Array(k, a, b) = kv.split(":")
      k.trim.toLong -> (a.trim.toLong, b.trim.toLong)
    }.toMap
}

class PagedArchiveTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"paged-archives(${options.get("fetcher")})"
  override def schema(): StructType = PagedArchiveSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagedArchiveScanBuilder(o)
}

/** Filter pushdown (the Spark-native spelling of the reference's
  * anchor-driven early-stop, `bilibili/video.py:84-100`):
  *
  *  - `pubdate > x` / `pubdate >= x` becomes a GLOBAL anchor, merged
  *    (max) with any per-key `anchors` option — the reader stops
  *    paging at the anchor, so the predicate prunes page FETCHES, not
  *    just rows. Exact under the source's pubdate-descending page
  *    contract, so the filter is consumed (no residual re-filter).
  *  - `mid = k` / `mid IN (…)` prunes scan KEYS — unlisted keys get
  *    no input partition and no fetch at all.
  *
  * Anything else stays a residual for Spark to evaluate post-scan.
  */
class PagedArchiveScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = PagedArchiveSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAnchor: Option[Long] = None
  private var pushedKeys: Option[Set[Long]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // In two-sided backfill mode the reader WANTS old records and
    // ignores anchors entirely — consuming a pubdate filter there
    // would silently drop it. Leave pubdate predicates as residuals
    // and push only key pruning.
    val twoSided = options.get("bounds") != null
    val (accepted, residual) = filters.partition {
      case GreaterThan("pubdate", v) if !twoSided => asLong(v).exists { x =>
        pushedAnchor = Some(pushedAnchor.fold(x)(math.max(_, x))); true
      }
      case GreaterThanOrEqual("pubdate", v) if !twoSided => asLong(v).exists { x =>
        // pubdate >= x  <=>  pubdate > x-1 on longs; x = MinValue
        // would wrap, so leave that (vacuous) filter as a residual
        x > Long.MinValue && {
          pushedAnchor = Some(pushedAnchor.fold(x - 1)(math.max(_, x - 1))); true
        }
      }
      case EqualTo("mid", v) => asLong(v).exists { k =>
        pushedKeys = Some(pushedKeys.fold(Set(k))(_ intersect Set(k))); true
      }
      case In("mid", vs) => {
        val ks = vs.flatMap(asLong).toSet
        if (ks.size == vs.length) {
          pushedKeys = Some(pushedKeys.fold(ks)(_ intersect ks)); true
        } else false
      }
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val optionAnchors = Option(options.get("anchors"))
      .map(PagedArchiveSource.parseAnchors).getOrElse(Map.empty)
    new PagedArchiveScan(
      options.get("fetcher"),
      options.getInt("pageSize", 30),
      optionAnchors,
      pushedAnchor,
      pushedKeys,
      Option(options.get("keys"))
        .map(_.split(",").iterator.filter(_.nonEmpty).map(_.trim.toLong).toSeq),
      Option(options.get("bounds"))
        .map(PagedArchiveSource.parseBounds).getOrElse(Map.empty),
      options.getInt("limitPerKey", Int.MaxValue),
      required)
  }
}

class PagedArchiveScan(fetcherClass: String, pageSize: Int,
    anchors: Map[Long, Long], pushedAnchor: Option[Long],
    pushedKeys: Option[Set[Long]], keysOption: Option[Seq[Long]],
    bounds: Map[Long, (Long, Long)], limitPerKey: Int,
    required: StructType) extends Scan with Batch {
  require(fetcherClass != null, "option 'fetcher' (PageFetcher class name) is required")
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedArchiveScan(fetcher=$fetcherClass, pageSize=$pageSize" +
      pushedAnchor.map(a => s", pushedAnchor=$a").getOrElse("") +
      pushedKeys.map(ks => s", pushedKeys=${ks.toSeq.sorted.mkString("[", ",", "]")}")
        .getOrElse("") + ")"

  /** One partition per scan key. The key list comes from the `keys`
    * option when given (capping the driver-side fetcher call for
    * fetchers whose own key list is huge), else from a driver-side
    * fetcher instance (metadata-sized). A pushed `mid` predicate
    * prunes keys before any partition is planned; each key's anchor is
    * the max of its per-key option anchor and the pushed global one.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val allKeys = keysOption.getOrElse(
      PagedArchiveSource.instantiate(fetcherClass).keys())
    val keys = pushedKeys.fold(allKeys)(ks => allKeys.filter(ks.contains))
    keys.map { k =>
      val anchor = math.max(anchors.getOrElse(k, Long.MinValue),
        pushedAnchor.getOrElse(Long.MinValue))
      PagedKeyPartition(k, anchor, bounds.get(k), limitPerKey): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(fetcherClass, pageSize, required)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // backfill is a batch concept: a stream with a skip-window would
    // re-deliver the declared-ingested range on its first batch
    require(bounds.isEmpty && limitPerKey == Int.MaxValue,
      "bounds/limitPerKey are batch-only options; a streaming read tracks " +
        "its position in the checkpointed per-key anchors instead")
    // honor pushed filters exactly like the batch path: a consumed
    // predicate must shape the stream too, or it would silently drop
    val keys = keysOption.map(ks => pushedKeys.fold(ks)(p => ks.filter(p.contains)))
      .orElse(pushedKeys.map(_.toSeq.sorted))
    new PagedArchiveMicroBatchStream(
      fetcherClass, pageSize, anchors, pushedAnchor, keys, required)
  }
}

/** Stream offset: the per-key pubdate watermarks themselves —
  * serialized in the same `key:pubdate` syntax as the batch
  * `anchors` option, so a checkpoint IS a resumable anchor set.
  */
case class ArchiveOffset(anchors: Map[Long, Long]) extends Offset {
  override def json(): String =
    anchors.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")
}

/** The paged listing as a Structured Streaming source (§2.11): each
  * micro-batch covers, per key, the records in `(startAnchor,
  * endAnchor]` — `latestOffset` probes one newest-record page per key
  * (driver-side, metadata-sized), and the executors walk only the
  * pages above the start anchor, exactly the batch source's
  * early-stop. The checkpointed offset replaces the reference's
  * cron + anchor-table state (`db/song.py:19-26`): a restarted query
  * resumes from its last committed anchors and never re-pages
  * ingested history. Records uploaded between the probe and the read
  * fall past `maxPubdate` into the next batch, keeping each batch's
  * range deterministic under task retries.
  *
  * Offsets only move FORWARD: the probed newest pubdate is floored at
  * the committed start anchor (a transiently empty listing must not
  * regress a key to the beginning), and keys absent from the current
  * key list carry their committed anchor through unchanged.
  *
  * Granularity caveat: offsets are epoch-second pubdates, so two
  * uploads in the same second with the probe landing between them can
  * drop the later one — the identical boundary as the reference's
  * `pubdate > anchor` filter (`bilibili/video.py:84-100`). Deployments
  * needing strictness reconcile with a periodic two-sided batch
  * backfill ([[graft.api.Vcut.discoverNewRecordingsIncremental]]).
  */
class PagedArchiveMicroBatchStream(fetcherClass: String, pageSize: Int,
    initialAnchors: Map[Long, Long], pushedAnchor: Option[Long],
    keysOption: Option[Seq[Long]], required: StructType)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private lazy val driverFetcher = PagedArchiveSource.instantiate(fetcherClass)
  private lazy val keys: Seq[Long] =
    keysOption.getOrElse(driverFetcher.keys())
  private var availableNowPinned = false
  private var availableNowTarget: Option[ArchiveOffset] = None

  private def floorAnchor(k: Long): Long =
    math.max(initialAnchors.getOrElse(k, Long.MinValue),
      pushedAnchor.getOrElse(Long.MinValue))

  /** Probe each current key's newest pubdate, floored at its anchor in
    * `start`; anchors of keys not currently listed carry forward.
    */
  private def probeNewest(start: Map[Long, Long]): ArchiveOffset = ArchiveOffset(
    start ++ keys.map { k =>
      val committed = math.max(start.getOrElse(k, Long.MinValue), floorAnchor(k))
      k -> math.max(committed,
        driverFetcher.fetch(k, 1, 1).headOption
          .map(_.pubdate).getOrElse(Long.MinValue))
    }.toMap)

  override def initialOffset(): Offset =
    ArchiveOffset(keys.map(k => k -> floorAnchor(k)).toMap)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  // Trigger.AvailableNow: pin the target offsets at the first probe
  // of the run, drain to them
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowPinned = true
    availableNowTarget = None
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ArchiveOffset].anchors
    if (!availableNowPinned) probeNewest(s)
    else {
      if (availableNowTarget.isEmpty) availableNowTarget = Some(probeNewest(s))
      availableNowTarget.get
    }
  }

  override def deserializeOffset(json: String): Offset = ArchiveOffset(
    if (json.isEmpty) Map.empty else PagedArchiveSource.parseAnchors(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ArchiveOffset].anchors
    val e = end.asInstanceOf[ArchiveOffset].anchors
    keys.flatMap { k =>
      val from = s.getOrElse(k, Long.MinValue)
      val to = e.getOrElse(k, Long.MinValue)
      if (to > from)
        Some(PagedKeyPartition(k, from, maxPubdate = to): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(fetcherClass, pageSize, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class PagedKeyPartition(key: Long, anchor: Long,
    bounds: Option[(Long, Long)] = None,
    limit: Int = Int.MaxValue,
    maxPubdate: Long = Long.MaxValue) extends InputPartition

class PagedReaderFactory(fetcherClass: String, pageSize: Int,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[PagedKeyPartition]
    new PagedPartitionReader(
      PagedArchiveSource.instantiate(fetcherClass),
      kp.key, kp.anchor, kp.bounds, kp.limit, kp.maxPubdate, pageSize, required)
  }
}

/** Walks one key's page sequence with the stop rules. Pages are
  * pulled lazily — a key whose newest record is already behind the
  * anchor costs exactly one page fetch.
  *
  * Two modes, matching the reference:
  *  - '''anchor''' (no bounds): records arrive pubdate-descending; the
  *    first record at or below the anchor ends the walk
  *    (`bilibili/video.py:84-100`).
  *  - '''two-sided backfill''' (bounds = (after, before)): records
  *    inside the closed window `[before, after]` are skipped (already
  *    ingested), everything outside is emitted — old history is WANTED
  *    here, so the walk cannot anchor-stop; it ends at `limit` emitted
  *    records or the short page, exactly the reference's loop
  *    (`bilibili/series.py:100-117`).
  */
class PagedPartitionReader(fetcher: PageFetcher, key: Long, anchor: Long,
    bounds: Option[(Long, Long)], limit: Int, maxPubdate: Long,
    pageSize: Int, required: StructType) extends PartitionReader[InternalRow] {

  private val idx = PagedArchiveSource.schema.fieldNames
    .map(n => n -> required.fieldNames.indexOf(n)).toMap

  private var pn = 0
  private var page: Seq[ArchiveRecord] = Nil
  private var pos = 0
  private var lastPage = false
  private var emitted = 0
  private var current: ArchiveRecord = _

  override def next(): Boolean = {
    if (emitted >= limit) return false // per-key fetch budget
    while (true) {
      if (pos < page.length) {
        val rec = page(pos)
        pos += 1
        bounds match {
          case None =>
            if (rec.pubdate <= anchor) return false // watermark early-stop
            // records newer than the batch's end offset (uploaded
            // after the stream's probe) belong to the NEXT micro-batch
            if (rec.pubdate <= maxPubdate) {
              emitted += 1; current = rec
              return true
            }
          case Some((after, before)) =>
            // skip only the already-ingested closed window; keep paging
            if (!(rec.pubdate <= after && rec.pubdate >= before)) {
              // Only BELOW-window (backfill) records count toward the
              // limit. The reference counts both sides
              // (`bilibili/series.py:108-110`), but that silently
              // loses new uploads forever when more than `limit`
              // arrive between runs: the truncated ones land inside
              // the next run's skip window AND behind its anchor.
              // Above-window records are bounded by upload rate since
              // the last run — emit them all, cap only the unbounded
              // dig into history.
              if (rec.pubdate < before) emitted += 1
              current = rec
              return true
            }
        }
      } else {
        if (lastPage) return false
        pn += 1
        page = fetcher.fetch(key, pn, pageSize)
        pos = 0
        lastPage = page.length < pageSize // short-page termination
      }
    }
    false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    if (idx("mid") >= 0) row.setLong(idx("mid"), key)
    if (idx("bvid") >= 0) row.update(idx("bvid"), UTF8String.fromString(current.bvid))
    if (idx("title") >= 0) row.update(idx("title"), UTF8String.fromString(current.title))
    if (idx("pubdate") >= 0) row.setLong(idx("pubdate"), current.pubdate)
    if (idx("pic") >= 0) row.update(idx("pic"), UTF8String.fromString(current.pic))
    row
  }

  override def close(): Unit = ()
}
