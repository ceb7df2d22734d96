package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the reference's transcript documents (S2):
  * `spark.read.format("transcript").load(globOfJsonFiles)` exposes the
  * FLAT segment relation `(bvid, page, seg_idx, start, text)` directly
  * — the nested `array<array<{start,text}>>` shape never materializes.
  *
  * Spark-native behaviors implemented:
  *  - one input partition per transcript file → parallelism scales
  *    with the file count, like the built-in file sources;
  *  - column pruning pushed into the reader
  *    (`SupportsPushDownRequiredColumns`): a `select("bvid","page")`
  *    never allocates segment text strings;
  *  - streaming JSON tokenizer (Jackson, which Spark ships) — no
  *    whole-document tree, so arbitrarily long transcripts stream
  *    through in constant memory.
  *
  * This is the custom-source extension point the reference's REST
  * scans would use (SURVEY.md §2.1 S4): swap the file iterator for a
  * paginated HTTP iterator and the plumbing is identical.
  */
class TranscriptDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "transcript"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TranscriptDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TranscriptTable(properties.get("path"))
}

object TranscriptDataSource {
  val schema: StructType = StructType(Seq(
    StructField("bvid", StringType),
    StructField("page", IntegerType),
    StructField("seg_idx", IntegerType),
    StructField("start", DoubleType),
    StructField("text", StringType)))
}

class TranscriptTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"transcript($path)"
  override def schema(): StructType = TranscriptDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TranscriptScanBuilder(
      Option(path).getOrElse(options.get("path")))
}

class TranscriptScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TranscriptDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TranscriptScan(path, required)
}

class TranscriptScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TranscriptScan(path=$path, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val statuses = Option(fs.globStatus(hPath)).getOrElse(Array.empty)
    statuses.filter(_.isFile)
      .map(s => TranscriptFilePartition(s.getPath.toUri.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TranscriptReaderFactory(required)
}

case class TranscriptFilePartition(file: String) extends InputPartition

class TranscriptReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TranscriptPartitionReader(
      partition.asInstanceOf[TranscriptFilePartition].file, required)
}

/** Streams one transcript file's `[[{start,text}, …], …]` as flat
  * rows with a pull-based Jackson tokenizer.
  */
class TranscriptPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val hPath = new Path(file)
  private val in = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    .open(hPath)
  private val parser = new JsonFactory().createParser(in: java.io.InputStream)

  private val bvid = UTF8String.fromString(
    hPath.getName.stripSuffix(".json"))
  // column positions in the pruned output row, -1 = pruned away
  private val idx = TranscriptDataSource.schema.fieldNames
    .map(n => n -> required.fieldNames.indexOf(n)).toMap

  private var page = -1
  private var segIdx = -1
  private var start = 0.0
  private var text: UTF8String = _
  private var finished = false

  // expect start of outer array
  if (parser.nextToken() != JsonToken.START_ARRAY) finished = true

  override def next(): Boolean = {
    if (finished) return false
    while (true) {
      val tok = parser.nextToken()
      if (tok == null) { finished = true; return false }
      tok match {
        case JsonToken.START_ARRAY => // new page
          page += 1
          segIdx = -1
        case JsonToken.END_ARRAY =>
          if (parser.getParsingContext.inRoot()) { finished = true; return false }
        case JsonToken.START_OBJECT => // one segment
          segIdx += 1
          start = 0.0
          text = null
          var t = parser.nextToken()
          while (t != JsonToken.END_OBJECT) {
            val field = parser.currentName()
            parser.nextToken()
            field match {
              case "start" => start = parser.getDoubleValue
              case "text" => text = UTF8String.fromString(parser.getText)
              case _ => parser.skipChildren()
            }
            t = parser.nextToken()
          }
          return true
        case _ => // tolerate scalars we don't expect
      }
    }
    false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    if (idx("bvid") >= 0) row.update(idx("bvid"), bvid)
    if (idx("page") >= 0) row.setInt(idx("page"), page)
    if (idx("seg_idx") >= 0) row.setInt(idx("seg_idx"), segIdx)
    if (idx("start") >= 0) row.setDouble(idx("start"), start)
    if (idx("text") >= 0) row.update(idx("text"), text)
    row
  }

  override def close(): Unit = {
    parser.close()
    in.close()
  }
}
