package graft.sources.tar

import java.io.ByteArrayOutputStream
import java.util
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.SerializableHadoopConf

/** DataSourceV2 reader for tar shard archives:
  * `spark.read.format("tar").load(dir)` yields one row per archive
  * member — (archive, member, size, content) — with one input
  * partition per tar file (a tar has no index, so the natural split
  * is the archive: each task streams one archive once, the same
  * shard-at-a-time discipline as the reference's IterableDataset,
  * DPF/dataloaders/shards_dataset.py:86-131).
  *
  * Column pruning is pushed into the reader: when `content` is not
  * projected (e.g. the validators' member-listing pass), the reader
  * skips the byte copy entirely and streams headers only — listing a
  * 100 TB shard corpus reads metadata, not payloads.
  *
  * This complements (not replaces) the mapPartitions payload path in
  * [[graft.sources.PayloadLoader]]: the DSv2 source is the right tool
  * when the QUERY is over members themselves; the loader is right
  * when enriching an existing metadata table.
  */
class TarDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tar"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("tar source needs a path"))
    new TarTable(path)
  }
}

object TarTable {
  val Schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Expand a path/glob/directory into concrete tar file paths. */
  def resolvePaths(path: String): Seq[String] = {
    val spark = SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses =
      if (fs.isDirectory(p))
        fs.listStatus(p).filter(s =>
          s.isFile && s.getPath.getName.endsWith(".tar"))
      else fs.globStatus(p) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case gs => gs.filter(_.isFile)
      }
    statuses.map(_.getPath.toString).sorted.toSeq
  }
}

class TarTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tar($path)"
  override def schema(): StructType = TarTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(path)
}

class TarScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TarTable.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TarScan(path, required)
}

class TarScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"TarScan(path=$path, columns=${required.fieldNames.mkString(",")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    TarTable.resolvePaths(path).map(TarInputPartition(_): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    TarReaderFactory(required, conf)
  }
}

case class TarInputPartition(archivePath: String) extends InputPartition

case class TarReaderFactory(required: StructType,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new TarPartitionReader(
      partition.asInstanceOf[TarInputPartition].archivePath, required, conf)
}

class TarPartitionReader(archivePath: String, required: StructType,
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {

  private val needContent = required.fieldNames.contains("content")
  private val fieldOrder = required.fieldNames.toSeq

  private lazy val in: TarArchiveInputStream = {
    val p = new Path(archivePath)
    new TarArchiveInputStream(p.getFileSystem(conf.get()).open(p))
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    var entry = in.getNextEntry
    while (entry != null && entry.isDirectory) entry = in.getNextEntry
    if (entry == null) { current = null; return false }
    val content: Array[Byte] =
      if (!needContent) null
      else {
        val out = new ByteArrayOutputStream(
          math.max(entry.getSize.toInt, 64))
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      }
    val values = fieldOrder.map {
      case "archive" => UTF8String.fromString(archivePath)
      case "member" => UTF8String.fromString(entry.getName)
      case "size" => entry.getSize
      case "content" => content
    }
    current = InternalRow.fromSeq(values)
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()
}
