package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.connect.{HttpRequest, MiniJson, Transport}

/** S1 at scale — DataSource V2 for page-addressable REST APIs: ONE
  * InputPartition per page, so 1000 executors fetch 1000 pages in parallel
  * (the cursor-chained variant stays driver-side in
  * [[graft.connect.PaginatedRestSource]] because `next` links are inherently
  * sequential; SURVEY.md S1).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.RestPageDataSource")
  *   .option("urlTemplate", "https://api/records?page={page}")
  *   .option("pages", "100")
  *   .option("transportClass", classOf[JavaNetTransport].getName)
  *   .load()                                // → (page INT, record STRING)
  * }}}
  * Each row is one element of the page envelope's `results` array,
  * re-serialized as a JSON string — apply `from_json` with your schema.
  * The transport is instantiated per partition ON THE EXECUTOR (no driver
  * session is shipped); auth headers can be baked into a Transport subclass.
  */
class RestPageDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestPageDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestPageTable(properties.get("urlTemplate"),
      Option(properties.get("pages")).map(_.toInt).getOrElse(1),
      properties.get("transportClass"))
}

object RestPageDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("record", StringType, nullable = false)))
}

final class RestPageTable(urlTemplate: String, pages: Int,
                          transportClass: String)
  extends Table with SupportsRead {
  require(urlTemplate != null, "urlTemplate option is required")
  require(transportClass != null, "transportClass option is required")

  override def name(): String = s"rest($urlTemplate)"
  override def schema(): StructType = RestPageDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = RestPageDataSource.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        (0 until pages).map(p => RestPagePartition(p): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        RestPageReaderFactory(urlTemplate, transportClass)
    }
}

final case class RestPagePartition(page: Int) extends InputPartition

final case class RestPageReaderFactory(urlTemplate: String,
                                       transportClass: String)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[RestPagePartition].page
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[InternalRow] = {
        val transport = Class.forName(transportClass)
          .getDeclaredConstructor().newInstance().asInstanceOf[Transport]
        val url = urlTemplate.replace("{page}", page.toString)
        val resp = transport.send(HttpRequest("GET", url))
        require(resp.isSuccess, s"HTTP ${resp.status} for $url")
        val envelope = MiniJson.parse(resp.bodyString).asInstanceOf[MiniJson.JObj]
        val results = envelope.fields.get("results") match {
          case Some(MiniJson.JArr(items)) => items
          case _ => Vector.empty
        }
        results.iterator.map(r => InternalRow(page,
          UTF8String.fromString(MiniJson.render(r))))
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
