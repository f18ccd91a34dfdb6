package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.Processor

/** Dataset ingestion: `DatasetConfig => Processor` builders mirroring
  * the reference's reader (DPF/dataset_reader.py:148-325) as one lazy
  * Spark plan per dataset.
  *
  * The reference reads shard CSVs in a process pool and concatenates
  * pandas frames (dataset_reader.py:58-69,125-130); here the listing +
  * pairing validation stay driver-side (cheap Hadoop FS metadata
  * calls) while parsing, `split_name` derivation, renaming, and path
  * materialization are all deferred into the plan — Spark's file-scan
  * parallelism replaces the pool, and nothing is materialized until an
  * action runs.
  *
  * Scale: a directory of N shards becomes one multi-file csv scan
  * (one task per split); schema agreement is validated from the csv
  * headers only (driver reads the first line of each file, not the
  * data).
  */
object DatasetReader {

  /** Read a files-layout dataset: one metadata CSV/Parquet, media paths
    * relative to the table's directory
    * (DPF/dataset_reader.py:256-295). */
  def readFiles(spark: SparkSession, config: FilesConfig): Processor = {
    val raw = config.format match {
      case "csv" => spark.read.option("header", "true")
        .option("inferSchema", "true").csv(config.path)
      case "parquet" => spark.read.parquet(config.path)
      // one JSON object per line — the interchange format most text
      // corpora ship as; Spark's json source splits and schema-infers
      // it like any other line-delimited scan
      case "jsonl" => spark.read.json(config.path)
      case other => throw new IllegalArgumentException(
        s"unsupported metadata format: $other")
    }
    val renamed = renameToCanonical(raw, config)
    val baseDir = new Path(config.path).getParent.toString
    // resolve relative media paths against the table directory
    val withPaths = config.payloads.foldLeft(renamed) {
      case (df, FilePayload(m, _)) =>
        df.withColumn(m.pathColumn,
          when(col(m.pathColumn).startsWith("/"), col(m.pathColumn))
            .otherwise(concat_ws("/", lit(baseDir), col(m.pathColumn))))
      case (df, _) => df
    }
    Processor(reorderModalityFirst(withPaths, config), config)
  }

  /** Read a shards-layout dataset: directory of `N.csv` + `N.tar`
    * pairs (DPF/dataset_reader.py:148-203). Validates pairing and
    * cross-shard column agreement, derives `split_name` from the
    * source file of each row, and rewrites basename columns into
    * member-path columns. */
  def readShards(spark: SparkSession, config: ShardsConfig,
      validateColumns: Boolean = true): Processor = {
    val pairs = listPairs(spark, config.path,
      config.datafilesExt, config.archivesExt, archiveIsDir = false)
    if (validateColumns) validateHeaderAgreement(spark, pairs.map(_._1))
    val df = readShardCsvs(spark, pairs.map(_._1))
    Processor(shardedCanonical(df, config, config.payloads), config)
  }

  /** Read a sharded-files-layout dataset: `N.csv` + directory `N/`
    * pairs (DPF/dataset_reader.py:205-254). */
  def readShardedFiles(spark: SparkSession, config: ShardedFilesConfig,
      validateColumns: Boolean = true): Processor = {
    val pairs = listPairs(spark, config.path,
      config.datafilesExt, "", archiveIsDir = true)
    if (validateColumns) validateHeaderAgreement(spark, pairs.map(_._1))
    val df = readShardCsvs(spark, pairs.map(_._1))
    Processor(shardedCanonical(df, config, config.payloads), config)
  }

  /** Wrap an existing DataFrame + config
    * (DPF/dataset_reader.py:327-356). */
  def fromDataFrame(df: DataFrame, config: DatasetConfig): Processor =
    Processor(renameToCanonical(df, config), config)

  /** Member-level scan of a shards dataset's ARCHIVES through the tar
    * DSv2 source — the query-over-members path ([[readShards]] reads
    * the metadata CSVs; this reads the payloads themselves), with the
    * huge-member policy taken from the CONFIG so pipeline users never
    * touch reader options: `config.hugeMemberMode = "chunks"` (+
    * optional `config.chunkBytes`) reads mixed archives — normal and
    * multi-GiB members — in one scan, huge members arriving as inline
    * content-range rows. Shard pairing is validated exactly as
    * [[readShards]] does, so a stray unpaired archive fails here too.
    * Returns (archive, member, size, offset, content) rows. */
  def readShardMembers(spark: SparkSession,
      config: ShardsConfig): DataFrame = {
    // the tar source reads tar-family archives only; any other
    // declared extension would pass the pairing check and then scan
    // ZERO files silently
    require(Set("tar", "tar.gz", "tgz").contains(config.archivesExt),
      s"readShardMembers reads tar-family archives; archivesExt " +
        s"'${config.archivesExt}' is not one of tar / tar.gz / tgz")
    // same driver-side pairing contract as the metadata path
    listPairs(spark, config.path,
      config.datafilesExt, config.archivesExt, archiveIsDir = false)
    val reader = spark.read.format("tar")
      .option("hugeMemberMode", config.hugeMemberMode)
    config.chunkBytes.fold(reader)(b =>
        reader.option("chunkBytes", b.toString))
      // glob on the DECLARED extension, so the scan covers exactly
      // the archive set the pairing check validated (a directory
      // load would also read e.g. stray .tar files a .tgz-configured
      // pairing never saw)
      .load(s"${config.path}/*.${config.archivesExt}")
  }

  // ------------------------------------------------------------------

  /** Driver-side shard pairing: every `N.csv` must have its `N.tar`
    * (or `N/` directory) and vice versa
    * (dataset_reader.py:183-191). */
  private def listPairs(spark: SparkSession, dir: String,
      dataExt: String, archiveExt: String,
      archiveIsDir: Boolean): Seq[(String, String)] = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new Path(dir))
    val csvs = entries.filter(e =>
      e.isFile && e.getPath.getName.endsWith(s".$dataExt"))
      .map(e => stem(e.getPath.getName) -> e.getPath.toString).toMap
    val archives =
      if (archiveIsDir)
        entries.filter(_.isDirectory)
          .map(e => e.getPath.getName -> e.getPath.toString).toMap
      else
        entries.filter(e =>
          e.isFile && e.getPath.getName.endsWith(s".$archiveExt"))
          .map(e => stem(e.getPath.getName) -> e.getPath.toString).toMap
    val unpairedCsv = csvs.keySet.diff(archives.keySet)
    val unpairedArc = archives.keySet.diff(csvs.keySet)
    require(unpairedCsv.isEmpty && unpairedArc.isEmpty,
      s"unpaired shards in $dir: csv-without-archive=" +
        s"${unpairedCsv.toSeq.sorted.take(5).mkString(",")} " +
        s"archive-without-csv=${unpairedArc.toSeq.sorted.take(5).mkString(",")}")
    csvs.toSeq.sortBy(_._1).map { case (k, c) => (c, archives(k)) }
  }

  private def stem(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i < 0) name else name.substring(0, i)
  }

  /** Cross-shard schema agreement: compare csv header lines only —
    * O(#shards) tiny reads on the driver, never the data
    * (dataset_reader.py:71-87 re-specced for scale). */
  private def validateHeaderAgreement(spark: SparkSession,
      csvPaths: Seq[String]): Unit = {
    val fs = new Path(csvPaths.head).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def header(p: String): Seq[String] = {
      val in = fs.open(new Path(p))
      try {
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        Option(reader.readLine()).getOrElse("").split(",").toSeq
      } finally in.close()
    }
    val first = header(csvPaths.head)
    csvPaths.tail.foreach { p =>
      val h = header(p)
      require(h == first,
        s"shard $p columns $h differ from ${csvPaths.head} columns $first")
    }
  }

  /** One multi-file csv scan; `split_name` = source shard stem derived
    * per row from input_file_name (the lazy equivalent of the
    * reference's per-shard concat + split_name insert,
    * dataset_reader.py:125-130). */
  private def readShardCsvs(spark: SparkSession,
      csvPaths: Seq[String]): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(csvPaths: _*)
      .withColumn("split_name",
        regexp_extract(input_file_name(), "([^/]+)\\.[^./]+$", 1))

  /** user→canonical renames (dataset_reader.py:140-142). */
  private def renameToCanonical(df: DataFrame,
      config: DatasetConfig): DataFrame =
    config.columnMapping.foldLeft(df) { case (d, (user, canonical)) =>
      if (user == canonical || !d.columns.contains(user)) d
      else d.withColumnRenamed(user, canonical)
    }

  /** For sharded layouts: rename to canonical, then add per-modality
    * member-path columns `<m>_path` = `<dir>/<split_name>(.tar!)/name`
    * (dataset_reader.py:89-106). The tar member path uses the `!`
    * separator understood by [[PayloadLoader]]. */
  private def shardedCanonical(df: DataFrame, config: DatasetConfig,
      payloads: Seq[PayloadType]): DataFrame = {
    val renamed = renameToCanonical(df, config)
    val withPaths = payloads.foldLeft(renamed) {
      case (d, ShardedPayload(m, _)) =>
        val archive = config match {
          case s: ShardsConfig =>
            concat(lit(config.path + "/"), col("split_name"),
              lit("." + s.archivesExt + "!"))
          case _ =>
            concat(lit(config.path + "/"), col("split_name"), lit("/"))
        }
        d.withColumn(m.pathColumn, concat(archive, col(m.nameColumn)))
      case (d, _) => d
    }
    reorderModalityFirst(withPaths, config)
  }

  /** Modality columns first, metadata after
    * (dataset_reader.py:108-123). */
  private def reorderModalityFirst(df: DataFrame,
      config: DatasetConfig): DataFrame = {
    val canonical = config.payloads.flatMap {
      case ColumnPayload(m, _) => m.inlineColumn.toSeq
      case FilePayload(m, _) => Seq(m.pathColumn)
      case ShardedPayload(m, _) => Seq(m.nameColumn, m.pathColumn)
    }.distinct.filter(df.columns.contains)
    val rest = df.columns.filterNot(canonical.contains)
    df.select((canonical ++ rest).map(col): _*)
  }
}
