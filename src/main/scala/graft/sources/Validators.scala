package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.{Processor, SerializableHadoopConf}

/** Structural + referential integrity checks between the metadata
  * table and the payload storage — the reference's validator family
  * (DPF/validators/format_validators) as Spark jobs.
  *
  * All whole-table checks (duplicate keys, member↔row diffs) run as
  * aggregations/joins, not driver loops; only directory pairing is a
  * driver-side metadata listing. Error rows are capped per check —
  * at 100 TB a validator must never collect an unbounded error list.
  */
object Validators {

  val MaxExamples = 20

  /** Dispatch on the dataset's layout. */
  def validate(p: Processor): ValidationResult = p.config match {
    case c: FilesConfig => validateFiles(p, c)
    case c: ShardsConfig => validateShards(p, c)
    case c: ShardedFilesConfig => validateShardedFiles(p, c)
  }

  /** Required canonical columns present
    * (sharded_validator.py:57-66). */
  private def requiredColumns(p: Processor): ValidationResult = {
    val needed = p.config.payloads.flatMap {
      case ColumnPayload(m, _) => m.inlineColumn.toSeq
      case FilePayload(m, _) => Seq(m.pathColumn)
      case ShardedPayload(m, _) => Seq(m.nameColumn)
    }
    val missing = needed.filterNot(p.columns.contains)
    if (missing.isEmpty) ValidationResult.empty
    else ValidationResult(Seq(MissedColumnsError(p.config.path, missing)))
  }

  /** Key uniqueness per payload column: groupBy(key).count > 1
    * (sharded_validator.py:37-47; utils.py:6-9). */
  private def duplicateKeys(p: Processor): ValidationResult = {
    val keyCols = p.config.payloads.collect {
      case FilePayload(m, _) => m.pathColumn
      case ShardedPayload(m, _) => m.nameColumn
    }.filter(p.columns.contains)
    val errs = keyCols.flatMap { k =>
      val dups = p.df.groupBy(col(k)).count()
        .filter(col("count") > 1)
        .limit(MaxExamples)
        .collect().map(_.getString(0)).toSeq
      if (dups.isEmpty) None
      else Some(DuplicatedValuesError(p.config.path, k, dups))
    }
    ValidationResult(errs)
  }

  /** Null keys (MissingValueError). */
  private def nullKeys(p: Processor): ValidationResult = {
    val keyCols = p.config.payloads.collect {
      case FilePayload(m, _) => m.pathColumn
      case ShardedPayload(m, _) => m.nameColumn
    }.filter(p.columns.contains)
    val errs = keyCols.flatMap { k =>
      if (p.df.filter(col(k).isNull).isEmpty) None
      else Some(MissingValueError(p.config.path, k))
    }
    ValidationResult(errs)
  }

  /** Files layout: every referenced file must exist
    * (files_validator.py:16-80). Existence checks run inside tasks. */
  def validateFiles(p: Processor, c: FilesConfig): ValidationResult = {
    val base = requiredColumns(p) ++ duplicateKeys(p) ++ nullKeys(p)
    val pathCols = c.payloads.collect { case FilePayload(m, _) => m.pathColumn }
      .filter(p.columns.contains)
    val hadoopConf = new SerializableHadoopConf(
      p.df.sparkSession.sparkContext.hadoopConfiguration)
    val missing = pathCols.flatMap { pc =>
      p.df.select(col(pc)).na.drop()
        .mapPartitions { it =>
          val loader = new PayloadLoader(hadoopConf.get())
          it.map(_.getString(0)).filterNot(loader.exists)
        }(org.apache.spark.sql.Encoders.STRING)
        .limit(MaxExamples).collect().toSeq
    }
    base ++ ValidationResult(missing.map(NoSuchFileError(_)))
  }

  /** Shards layout: csv↔tar pairing, then tar members vs table rows in
    * both directions (shards_validator.py:29-87). Member listing is a
    * distributed job over shards; the diffs are joins. */
  def validateShards(p: Processor, c: ShardsConfig): ValidationResult = {
    val base = requiredColumns(p) ++ duplicateKeys(p) ++ nullKeys(p)
    val spark = p.df.sparkSession
    import spark.implicits._

    val pairing = checkPairing(p, c.path, c.datafilesExt,
      Some(c.archivesExt))
    if (!p.columns.contains("split_name")) return base ++ pairing

    // distributed member listing via the pruned tar source: content
    // is not projected, so readers stream headers only (one task per
    // archive) — no payload bytes move for a validation pass
    val members = spark.read.format("tar")
      .load(c.path)
      .select(
        regexp_extract(col("archive"),
          s"([^/]+)\\.${c.archivesExt}$$", 1).as("split_name"),
        col("member"))

    val nameCols = c.payloads.collect {
      case ShardedPayload(m, _) => m.nameColumn
    }.filter(p.columns.contains)
    val errs = nameCols.flatMap { nc =>
      val tableNames = p.df.select(col("split_name"), col(nc).as("member"))
      val inTableNotTar = tableNames.join(members,
        Seq("split_name", "member"), "left_anti")
        .limit(MaxExamples).collect()
        .map(r => NoSuchFileError(s"${r.getString(0)}!${r.getString(1)}"))
      val inTarNotTable = members.join(tableNames,
        Seq("split_name", "member"), "left_anti")
        .limit(MaxExamples).collect()
        .map(r => FileNotInDataError(s"${r.getString(0)}!${r.getString(1)}"))
      inTableNotTar ++ inTarNotTable
    }
    base ++ pairing ++ ValidationResult(errs)
  }

  /** Sharded-files layout: csv↔dir pairing + folder contents vs rows
    * (sharded_files_validator.py:17-80). */
  def validateShardedFiles(p: Processor,
      c: ShardedFilesConfig): ValidationResult = {
    val base = requiredColumns(p) ++ duplicateKeys(p) ++ nullKeys(p)
    val spark = p.df.sparkSession
    import spark.implicits._

    val pairing = checkPairing(p, c.path, c.datafilesExt, None)
    if (!p.columns.contains("split_name")) return base ++ pairing

    val hadoopConf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val dir = c.path
    val shardNames = p.df.select(col("split_name")).distinct()
      .as[String].collect().toSeq
    val members = spark.createDataset(shardNames)
      .mapPartitions { it =>
        val conf = hadoopConf.get()
        it.flatMap { s =>
          val sp = new Path(s"$dir/$s")
          val fs = sp.getFileSystem(conf)
          if (!fs.exists(sp)) Iterator.empty
          else fs.listStatus(sp).iterator
            .filter(_.isFile).map(f => (s, f.getPath.getName))
        }
      }.toDF("split_name", "member")

    val nameCols = c.payloads.collect {
      case ShardedPayload(m, _) => m.nameColumn
    }.filter(p.columns.contains)
    val errs = nameCols.flatMap { nc =>
      val tableNames = p.df.select(col("split_name"), col(nc).as("member"))
      val missing = tableNames.join(members,
        Seq("split_name", "member"), "left_anti")
        .limit(MaxExamples).collect()
        .map(r => NoSuchFileError(s"${r.getString(0)}/${r.getString(1)}"))
      val extra = members.join(tableNames,
        Seq("split_name", "member"), "left_anti")
        .limit(MaxExamples).collect()
        .map(r => FileNotInDataError(s"${r.getString(0)}/${r.getString(1)}"))
      missing ++ extra
    }
    base ++ pairing ++ ValidationResult(errs)
  }

  /** Driver-side pairing check (shards_validator.py:29-45): every
    * data file needs its archive/dir and vice versa. */
  private def checkPairing(p: Processor, dir: String, dataExt: String,
      archiveExt: Option[String]): ValidationResult = {
    val fs = new Path(dir).getFileSystem(
      p.df.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) return ValidationResult.empty
    val entries = fs.listStatus(new Path(dir))
    def stem(n: String) = n.substring(0, n.lastIndexOf('.').max(0))
    val csvs = entries.filter(e =>
      e.isFile && e.getPath.getName.endsWith(s".$dataExt"))
      .map(e => stem(e.getPath.getName)).toSet
    val archives = archiveExt match {
      case Some(ext) => entries.filter(e =>
        e.isFile && e.getPath.getName.endsWith(s".$ext"))
        .map(e => stem(e.getPath.getName)).toSet
      case None => entries.filter(_.isDirectory)
        .map(_.getPath.getName).toSet
    }
    val errs =
      csvs.diff(archives).toSeq.sorted.take(MaxExamples)
        .map(s => NoSuchFileError(s"$dir/$s.<archive>")) ++
        archives.diff(csvs).toSeq.sorted.take(MaxExamples)
          .map(s => FileNotInDataError(s"$dir/$s.$dataExt missing"))
    ValidationResult(errs)
  }
}
