package graft.sources

import java.io.BufferedOutputStream
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.{Processor, SerializableHadoopConf}

/** Dataset export: rewrite a dataset as shard pairs — `K.tar`+`K.csv`
  * (shards layout) or `K/`+`K.csv` (sharded-files layout) — mirroring
  * the reference's writers (DPF/processors/writers/shards_writer.py:
  * 17-181, sharded_files_writer.py:15-160) as `foreachPartition`
  * sinks.
  *
  * Deliberate re-spec (SURVEY.md §7.4 risk 2): the reference numbers
  * shards with one global counter and supports resuming into an
  * existing directory — both anti-distributed. Here shard names are
  * `<partitionId>_<localIndex>`, every task writes independently, and
  * output is idempotent-overwrite. Payload bytes stream tar→tar /
  * file→tar per partition; nothing is collected to the driver.
  */
object ShardWriters {

  /** Number of rows per output shard (reference default 1000,
    * processor.py:381). */
  val DefaultMaxFilesInShard = 1000

  /** Export to `K.tar` + `K.csv` pairs readable by
    * [[DatasetReader.readShards]]. Returns the output ShardsConfig. */
  def saveToShards(p: Processor, outDir: String,
      maxFilesInShard: Int = DefaultMaxFilesInShard,
      columnsToSave: Seq[String] = Nil,
      partitionsOverride: Option[Int] = None): ShardsConfig = {
    write(p, outDir, maxFilesInShard, columnsToSave, asTar = true,
      partitionsOverride)
    ShardsConfig(outDir, outputPayloads(p.config))
  }

  /** Export to `K/` + `K.csv` pairs readable by
    * [[DatasetReader.readShardedFiles]]. */
  def saveToShardedFiles(p: Processor, outDir: String,
      maxFilesInShard: Int = DefaultMaxFilesInShard,
      columnsToSave: Seq[String] = Nil,
      partitionsOverride: Option[Int] = None): ShardedFilesConfig = {
    write(p, outDir, maxFilesInShard, columnsToSave, asTar = false,
      partitionsOverride)
    ShardedFilesConfig(outDir, outputPayloads(p.config))
  }

  /** Rewrite ONLY the per-shard metadata CSVs of an existing sharded
    * dataset — the reference's persisted column update
    * (DPF/processors/sharded_processor.py:58-82, helper
    * dataframe_helper.py:95-153): group rows by `split_name`, write
    * `<split>.csv`, leave archives untouched. One task per group of
    * shards; nothing is collected to the driver.
    *
    * The reference validates per-shard that the updated frame has the
    * same keys as the csv being replaced; here the whole-table
    * invariant is the same thing (we rewrite from the full table), so
    * the check is that `split_name` exists and rows are non-empty per
    * shard. */
  def rewriteMetadata(p: Processor, columnsToSave: Seq[String] = Nil): Unit = {
    val dir = p.config.path
    require(p.columns.contains("split_name"),
      "rewriteMetadata needs a sharded dataset (split_name column)")
    val hadoopConf = new SerializableHadoopConf(
      p.df.sparkSession.sparkContext.hadoopConfiguration)
    val pathCols = p.config.payloads.collect {
      case graft.core.FilePayload(m, _) => m.pathColumn
      case graft.core.ShardedPayload(m, _) => m.pathColumn
    }
    val metaCols =
      (if (columnsToSave.nonEmpty) columnsToSave
       else p.columns.filterNot(pathCols.contains).filterNot(_ == "split_name"))
    p.df.select((("split_name" +: metaCols).distinct).map(col): _*)
      .repartition(col("split_name"))
      .sortWithinPartitions(col("split_name"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new Path(dir).getFileSystem(hadoopConf.get())
        var current: String = null
        var out: java.io.Writer = null
        def open(split: String): Unit = {
          out = new java.io.OutputStreamWriter(
            fs.create(new Path(dir, s"$split.csv"), true), "UTF-8")
          out.write(metaCols.map(csvEscape).mkString(",") + "\n")
          current = split
        }
        it.foreach { row =>
          val split = row.getAs[String]("split_name")
          if (split != current) {
            if (out != null) out.close()
            open(split)
          }
          out.write(metaCols.map(c =>
            csvEscape(Option(row.getAs[Any](c)).map(_.toString)
              .getOrElse(""))).mkString(",") + "\n")
        }
        if (out != null) out.close()
      }
  }

  /** Persist the metadata table alone (Connector.save_dataframe,
    * DPF/connectors/connector.py:92-114). */
  def saveMetadata(p: Processor, path: String, format: String = "parquet")
      : Unit = format match {
    case "parquet" => p.df.write.mode("overwrite").parquet(path)
    case "csv" => p.df.write.mode("overwrite")
      .option("header", "true").csv(path)
    // keep null fields explicit: the default (ignoreNullFields=true)
    // drops keys for null values and loses all-null columns on
    // roundtrip, unlike the csv/parquet paths
    case "jsonl" => p.df.write.mode("overwrite")
      .option("ignoreNullFields", "false").json(path)
    case other => throw new IllegalArgumentException(
      s"unsupported metadata format: $other")
  }

  /** Persist the metadata table hive-partitioned on the given columns
    * (`dir/col=value/part-*.parquet`). The at-scale layout for event
    * logs and date-keyed corpora: a reader filtering on a partition
    * column scans only the matching directories (partition pruning —
    * no file of any other partition is opened), and each partition
    * can be written/backfilled independently. Choose low-cardinality,
    * always-filtered columns (day, source, lang); high-cardinality
    * keys belong in bucketing, not partitioning. */
  def saveMetadataPartitioned(p: Processor, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    p.df.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** The written dataset addresses payloads by basename again. */
  private def outputPayloads(config: DatasetConfig): Seq[PayloadType] =
    config.payloads.map {
      case FilePayload(m, _) => ShardedPayload(m, m.nameColumn)
      case p => p
    }

  private def write(p: Processor, outDir: String, maxFilesInShard: Int,
      columnsToSave: Seq[String], asTar: Boolean,
      partitionsOverride: Option[Int] = None): Unit = {
    val spark = p.df.sparkSession
    val hadoopConf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)

    // payload path columns to stream bytes from; name columns keep the
    // member basename inside the new shard
    val payloadPathCols = p.config.payloads.collect {
      case FilePayload(m, _) => m.pathColumn -> m.nameColumn
      case ShardedPayload(m, _) => m.pathColumn -> m.nameColumn
    }
    // ensure a basename column exists for file layouts
    val withNames = payloadPathCols.foldLeft(p.df) {
      case (d, (pathCol, nameCol)) =>
        if (d.columns.contains(nameCol)) d
        else d.withColumn(nameCol,
          element_at(split(col(pathCol), "/"), -1))
    }
    val metaCols =
      (if (columnsToSave.nonEmpty) columnsToSave
       else withNames.columns.toSeq
         .filterNot(payloadPathCols.map(_._1).contains)
         .filterNot(_ == "split_name"))
    val allCols = (metaCols ++ payloadPathCols.map(_._1)).distinct
    val nPayload = payloadPathCols.size

    // size partitions to the shard size so most tasks emit one shard
    // (tasks receiving more than maxFilesInShard rows roll to a new
    // `<pid>_<k>` shard; partitionsOverride exercises that path and
    // lets callers trade task count for shard count)
    val total = withNames.count()
    val parts = partitionsOverride.getOrElse(math.max(1, math.ceil(
      total.toDouble / maxFilesInShard).toInt))

    val outPath = new Path(outDir)
    val fsSetup = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsSetup.mkdirs(outPath)

    withNames.select(allCols.map(col): _*)
      .repartition(parts)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val conf = hadoopConf.get()
        val loader = new PayloadLoader(conf)
        val fs = new Path(outDir).getFileSystem(conf)
        val pid = TaskContext.getPartitionId()
        var shardIdx = 0
        var rowsInShard = 0
        var tar: TarArchiveOutputStream = null
        var csv: java.io.Writer = null
        var shardName: String = null

        def openShard(): Unit = {
          shardName = s"${pid}_$shardIdx"
          if (asTar) {
            tar = new TarArchiveOutputStream(new BufferedOutputStream(
              fs.create(new Path(outDir, s"$shardName.tar"), true)))
            tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          } else fs.mkdirs(new Path(outDir, shardName))
          csv = new java.io.OutputStreamWriter(
            fs.create(new Path(outDir, s"$shardName.csv"), true), "UTF-8")
          csv.write(metaCols.map(csvEscape).mkString(",") + "\n")
          rowsInShard = 0
        }
        def closeShard(): Unit = {
          if (tar != null) { tar.finish(); tar.close(); tar = null }
          if (csv != null) { csv.close(); csv = null }
        }
        def writePayload(name: String, bytes: Array[Byte]): Unit =
          if (asTar) {
            val e = new TarArchiveEntry(name)
            e.setSize(bytes.length.toLong)
            tar.putArchiveEntry(e)
            tar.write(bytes)
            tar.closeArchiveEntry()
          } else {
            val out = fs.create(new Path(outDir, s"$shardName/$name"), true)
            try out.write(bytes) finally out.close()
          }

        // materialize the partition (≈ one shard's rows) so each
        // source tar is scanned once, not once per member
        val rows = it.toSeq
        val tarWants = rows.iterator.flatMap { r =>
          payloadPathCols.iterator.flatMap { case (pathCol, _) =>
            Option(r.getAs[String](pathCol))
              .flatMap(PayloadLoader.splitTarPath)
          }
        }.toSeq.groupBy(_._1).map { case (a, ms) => a -> ms.map(_._2).toSet }
        val tarBytes: Map[(String, String), Array[Byte]] = tarWants.flatMap {
          case (archive, members) =>
            loader.loadTarMembers(archive, members).map {
              case (m, b) => (archive, m) -> b
            }
        }

        rows.foreach { row =>
          if (csv == null) openShard()
          var i = 0
          while (i < nPayload) {
            val (pathCol, nameCol) = payloadPathCols(i)
            val src = row.getAs[String](pathCol)
            if (src != null) {
              val bytes = PayloadLoader.splitTarPath(src) match {
                case Some((a, m)) => tarBytes.getOrElse((a, m),
                  throw new java.io.IOException(s"member $m missing in $a"))
                case None => loader.loadFile(src)
              }
              writePayload(row.getAs[String](nameCol), bytes)
            }
            i += 1
          }
          csv.write(metaCols.map(c =>
            csvEscape(Option(row.getAs[Any](c)).map(_.toString)
              .getOrElse(""))).mkString(",") + "\n")
          rowsInShard += 1
          if (rowsInShard >= maxFilesInShard) {
            closeShard()
            shardIdx += 1
          }
        }
        closeShard()
      }
  }

  private def csvEscape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
