package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.core._
import graft.sources.PayloadLoader

/** Immutable dataset wrapper: a `DataFrame` (the metadata table) + its
  * [[DatasetConfig]]. Every operation returns a new Processor — the
  * reference mutates a shared `_df` in place
  * (DPF/processors/processor.py:30-64); immutability is the Spark-
  * idiomatic re-spec (SURVEY.md §7.4 risk 5).
  *
  * The relational surface (filter/rename/drop/dedup/sample/summary)
  * is pure plan construction — nothing here triggers a job except the
  * explicitly-action methods (`count`, `summary`, validated merges).
  */
final case class Processor(df: DataFrame, config: DatasetConfig) {

  def columns: Seq[String] = df.columns.toSeq

  def count(): Long = df.count()

  /** Predicate filter (processor.filter_df, processor.py:322-333). */
  def filterRows(cond: Column): Processor = copy(df = df.filter(cond))

  /** Arbitrary rewrite stage (pipelines/pipeline_stages.py:37-47). */
  def transform(f: DataFrame => DataFrame): Processor = copy(df = f(df))

  /** Column setter (processor.py:60-64). */
  def withColumnSet(name: String, value: Column): Processor =
    copy(df = df.withColumn(name, value))

  /** In-memory rename with the reference's validations
    * (files_processor.py:31-40): old must exist, new must not. */
  def renameColumn(oldName: String, newName: String): Processor = {
    require(df.columns.contains(oldName), s"no such column: $oldName")
    require(!df.columns.contains(newName), s"column exists: $newName")
    copy(df = df.withColumnRenamed(oldName, newName))
  }

  /** Drop with the reference's guard: required modality columns are
    * protected (files_processor.py:42-50). */
  def dropColumn(name: String): Processor = {
    val protectedCols = config.payloads.flatMap {
      case ColumnPayload(m, _) => m.inlineColumn.toSeq
      case FilePayload(m, _) => Seq(m.pathColumn)
      case ShardedPayload(m, _) => Seq(m.nameColumn, m.pathColumn)
    }.toSet
    require(!protectedCols.contains(name),
      s"cannot drop required modality column $name")
    require(df.columns.contains(name), s"no such column: $name")
    copy(df = df.drop(name))
  }

  /** Keep-first dedup (pipelines/pipeline_stages.py:50-60). Spark's
    * dropDuplicates keeps an arbitrary row; pass `orderBy` for the
    * deterministic keep-first variant (row_number window). */
  def dedup(cols: Seq[String], orderBy: Seq[Column] = Nil): Processor =
    if (orderBy.isEmpty) copy(df = df.dropDuplicates(cols))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(cols.map(col): _*).orderBy(orderBy: _*)
      copy(df = df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
    }

  /** Exact top-k rows per group — the pipeline-facing form of
    * [[GroupTopK]]. A pipeline author reaching for `row_number()
    * OVER (PARTITION BY …) <= k` gets the scale-safe plan without
    * knowing the window trap exists: bounded per-partition heaps,
    * exchange carries at most groups·k rows per task, nothing
    * corpus-sized is sorted. `sortCols` are (column, descending)
    * pairs compared in order; append a unique tiebreak column for
    * deterministic ranks (same obligation the window idiom has).
    * Adds `rankCol` (1-based, == row_number). */
  def topKPerGroup(groupCols: Seq[String],
      sortCols: Seq[(String, Boolean)], k: Int,
      rankCol: String = "rk"): Processor =
    copy(df = GroupTopK.topK(df, groupCols, sortCols, k, rankCol))

  /** Global 1-based rank over a total order — the pipeline-facing
    * form of [[GlobalRank]]. `row_number() OVER (ORDER BY …)` plans
    * as a single-reducer window (every row through ONE task); this
    * computes identical ranks with range partitioning + two-pass
    * prefix offsets. The sort key must be total (append a unique
    * tiebreak). Adds `rankCol`. */
  def globalRank(sortCols: Seq[Column],
      rankCol: String = "ord"): Processor =
    copy(df = GlobalRank.rank(df, sortCols, rankCol))

  /** Persist the current dataset as version 0 of a
    * [[graft.queries.TableLog]] versioned table at `dir` — the
    * pipeline-facing entry to the lakehouse tier (time travel, COW
    * MERGE, OPTIMIZE, vacuum, exactly-once streaming append) without
    * learning its internals. `statsKey` (an integral merge-key
    * column) enables manifest key stats so later [[mergeInto]]
    * touch-scans prune to the genuinely-overlapping files. The
    * returned Processor reads the COMMITTED snapshot: downstream
    * stages see exactly the bytes the table serves, and the write is
    * the atomic manifest commit, not a half-written directory. */
  def snapshotTo(dir: String,
      statsKey: Option[String] = None): Processor = {
    graft.queries.TableLog.writeBase(df.sparkSession, df, dir, statsKey)
    copy(df = graft.queries.TableLog.readVersion(df.sparkSession, dir))
  }

  /** MERGE the current dataset into the versioned table at `dir`
    * (same-`key` rows replaced, unmatched rows inserted — the COW
    * upsert with its stats-pruned touch-scan), then continue the
    * pipeline on the table's new committed snapshot. */
  def mergeInto(dir: String, key: String,
      allowSchemaEvolution: Boolean = false): Processor = {
    graft.queries.TableLog.upsert(df.sparkSession, dir, df, key,
      allowSchemaEvolution)
    copy(df = graft.queries.TableLog.readVersion(df.sparkSession, dir))
  }

  /** Retract rows of the versioned table at `dir` whose `key`
    * appears in the current dataset (decontamination hits,
    * takedowns), then continue on the table's new snapshot. */
  def deleteFrom(dir: String, key: String): Processor = {
    graft.queries.TableLog.delete(df.sparkSession, dir,
      df.select(col(key)), key)
    copy(df = graft.queries.TableLog.readVersion(df.sparkSession, dir))
  }

  /** Keep the materialized aggregate view at `viewDir` current with
    * the versioned table at `srcDir` (incremental: only the change
    * feed since the last maintain is read, only touched groups
    * upsert — [[graft.queries.MaterializedAgg]]), then continue the
    * pipeline ON THE VIEW — one row per dims tuple with `n_rows` and
    * `sum_<c>` columns. Exactly-once per source version; a pipeline
    * re-run maintains nothing and just reads the view. */
  def maintainAggView(srcDir: String, srcKey: String, viewDir: String,
      dims: Seq[String], measures: Seq[String]): Processor = {
    graft.queries.MaterializedAgg.maintain(df.sparkSession, srcDir,
      srcKey, viewDir, dims, measures)
    copy(df = graft.queries.MaterializedAgg.readView(df.sparkSession,
      viewDir))
  }

  /** Seeded shuffle (pipeline_stages.py:27-34; seed-threaded per
    * SURVEY.md §7.4 risk 7). */
  def shuffle(seed: Long): Processor =
    copy(df = df.orderBy(rand(seed)))

  /** Seeded random sample of n rows, optional predicate first
    * (processor.py:295-320). */
  def randomSample(n: Int, seed: Long,
      predicate: Option[Column] = None): Processor = {
    val base = predicate.map(df.filter).getOrElse(df)
    copy(df = base.orderBy(rand(seed)).limit(n))
  }

  /** describe()-style stats of the given numeric columns
    * (processor.print_summary, processor.py:66-99). One job. */
  def summary(numericCols: Seq[String]): DataFrame =
    df.select(numericCols.map(col): _*).summary(
      "count", "mean", "stddev", "min", "25%", "50%", "75%", "max")

  /** Enrichment-merge: left join of filter results on the key column
    * with the reference's 1:1 validation (processor.py:190-197) —
    * result keys must be unique; with `requireComplete` the key sets
    * must match exactly (the `return_none_on_error=False` mode). */
  def mergeResult(result: DataFrame, key: String,
      requireComplete: Boolean = false): Processor = {
    val dups = result.groupBy(col(key)).count().filter(col("count") > 1)
    require(dups.isEmpty, s"filter result has duplicate keys on $key")
    if (requireComplete) {
      val missing = df.select(key).join(result.select(key), Seq(key), "left_anti")
      require(missing.isEmpty,
        s"filter result is missing keys present in the dataset ($key)")
    }
    // the enrichment side is usually much smaller after row drops —
    // let AQE/broadcast thresholds pick the join strategy
    copy(df = df.join(result, Seq(key), "left"))
  }

  /** Metadata-only enrichment (processor.apply_column_filter,
    * processor.py:224-243): pure column expressions, no shuffle, no
    * join — stays inside whole-stage codegen. */
  def applyColumnFilter(f: ColumnFilter): Processor = {
    val missing = f.requiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"${f.name} requires missing columns: ${missing.mkString(",")}")
    // filters may use graft's native expressions (idempotent, cheap)
    graft.functions.GraftFunctions.register(df.sparkSession)
    copy(df = f.resultColumns.foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    })
  }

  /** Payload-reading enrichment (processor.apply_data_filter,
    * processor.py:166-197): select only what the filter needs, batch
    * inside each partition (tar shards read once per archive), left
    * join the results back on the key column.
    *
    * Scale: the payload bytes never enter the join — only the key +
    * result columns shuffle. Partition-local batching is the GPU/
    * native batching boundary (DataLoader workers ≙ tasks,
    * SURVEY.md §3.2).
    */
  def applyDataFilter(f: DataFilter,
      requireComplete: Boolean = false): Processor = {
    val key = keyColumnFor(f)
    val payloadCols: Seq[(String, String, Boolean)] = f.modalities.map { m =>
      config.payloads.find(_.modality == m) match {
        case Some(ColumnPayload(_, _)) =>
          (m.name, m.inlineColumn.get, true) // inline text payload
        case Some(_) => (m.name, m.pathColumn, false)
        case None => throw new IllegalArgumentException(
          s"dataset has no ${m.name} payload for filter ${f.name}")
      }
    }
    val selectCols = (Seq(key) ++ payloadCols.map(_._2) ++
      f.metadataColumns).distinct
    val metaCols = f.metadataColumns
    val outSchema = StructType(
      StructField(key, StringType, nullable = false) +: f.resultSchema.fields)
    val batchSize = f.batchSize
    val hadoopConf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)

    val selected = df.select(selectCols.map(col): _*)
    val resultDf = selected.mapPartitions { it =>
      val loader = new PayloadLoader(hadoopConf.get())
      val rows = it.toSeq
      // one pass per tar archive: gather every member this partition needs
      val tarWants = rows.iterator.flatMap { r =>
        payloadCols.iterator.collect { case (_, c, false) =>
          Option(r.getAs[String](c)).flatMap(PayloadLoader.splitTarPath)
        }.flatten
      }.toSeq.groupBy(_._1).map { case (a, ms) => a -> ms.map(_._2).toSet }
      val tarBytes: Map[(String, String), Array[Byte]] = tarWants.flatMap {
        case (archive, members) =>
          loader.loadTarMembers(archive, members).map {
            case (m, b) => (archive, m) -> b
          }
      }
      def bytesFor(path: String): Option[Array[Byte]] =
        PayloadLoader.splitTarPath(path) match {
          case Some((a, m)) => tarBytes.get((a, m))
          case None => try Some(loader.loadFile(path)) catch {
            case _: Exception => None
          }
        }
      rows.grouped(batchSize).flatMap { batch =>
        val inputs = batch.map { r =>
          val payloads = payloadCols.flatMap {
            case (mod, c, true) =>
              Option(r.getAs[String](c)).map(s =>
                mod -> s.getBytes("UTF-8"))
            case (mod, c, false) =>
              Option(r.getAs[String](c)).flatMap(bytesFor).map(mod -> _)
          }.toMap
          FilterInput(r.getAs[String](key), payloads,
            metaCols.map(c => c -> r.getAs[Any](c)).toMap)
        }
        f.processBatch(inputs).zip(inputs).collect {
          case (Some(values), in) => Row.fromSeq(in.key +: values)
        }
      }
    }(Encoders.row(outSchema))

    mergeResult(resultDf, key, requireComplete)
  }

  /** The filter's join key: its first modality's canonical column
    * (path column for file/shard payloads, inline column for text) —
    * DPF img_filter.py:16-18 / audios/audio_filter.py:17. */
  def keyColumnFor(f: DataFilter): String = {
    val m = f.modalities.head
    config.payloads.find(_.modality == m) match {
      case Some(ColumnPayload(_, _)) => m.inlineColumn.get
      case _ => m.pathColumn
    }
  }
}

/** Minimal serializable wrapper for the Hadoop configuration (the
  * Spark-internal SerializableConfiguration is private to spark). */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def get(): Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

object SerializableHadoopConf {
  /** Capture the active session's Hadoop conf DRIVER-side at filter
    * construction so spark.hadoop.* settings (s3a credentials,
    * endpoints, custom fs impls) reach the executor that opens model
    * files; a bare executor-side Configuration would see only
    * classpath defaults. Falls back when constructed outside a
    * session (plain unit tests). */
  def capture(): SerializableHadoopConf =
    new SerializableHadoopConf(
      scala.util.Try(org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration)
        .getOrElse(new Configuration()))
}
