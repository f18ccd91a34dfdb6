package graft.core

/** Dataset configuration: where the dataset lives, which physical
  * layout it uses, which user columns map to which modalities.
  *
  * Mirrors the reference's config hierarchy
  * (DPF/configs/dataset_config.py:7-41 and subclasses): a path plus
  * datatypes plus a user→canonical column mapping.
  */
sealed trait DatasetConfig {
  def path: String
  def payloads: Seq[PayloadType]

  /** user column → canonical column rename map
    * (mirrors configs/dataset_config.py:35-41). */
  def columnMapping: Map[String, String] = payloads.map {
    case ColumnPayload(m, user)  => user -> m.inlineColumn.get
    case FilePayload(m, user)    => user -> m.pathColumn
    case ShardedPayload(m, user) => user -> m.nameColumn
  }.toMap

  def modalities: Seq[Modality] = payloads.map(_.modality)
}

/** One metadata CSV/Parquet + loose files; media paths relative to the
  * table's directory (DPF/configs/files_config.py:10). */
final case class FilesConfig(
    path: String, // path to the metadata table file
    payloads: Seq[PayloadType],
    format: String = "csv", // csv | parquet | jsonl
) extends DatasetConfig

/** Directory of N.csv + N.tar shard pairs
  * (DPF/configs/shards_config.py:9).
  *
  * `hugeMemberMode` / `chunkBytes` configure the member-level archive
  * scan ([[graft.sources.DatasetReader.readShardMembers]]) without
  * touching the tar source API: `"error"` (default) fails loudly on a
  * member larger than one row should carry; `"chunks"` emits such
  * members as multiple inline content-range rows (`offset` column
  * gives each chunk's absolute archive position), so mixed archives
  * read in ONE scan. */
final case class ShardsConfig(
    path: String, // directory containing the shards
    payloads: Seq[PayloadType],
    datafilesExt: String = "csv",
    archivesExt: String = "tar",
    hugeMemberMode: String = "error",
    chunkBytes: Option[Long] = None,
) extends DatasetConfig {
  require(hugeMemberMode == "error" || hugeMemberMode == "chunks",
    s"hugeMemberMode must be 'error' or 'chunks', got $hugeMemberMode")
}

/** Directory of N.csv + N/ folder pairs
  * (DPF/configs/sharded_files_config.py:9). */
final case class ShardedFilesConfig(
    path: String,
    payloads: Seq[PayloadType],
    datafilesExt: String = "csv",
) extends DatasetConfig

object DatasetConfig {
  /** Convenience builders mirroring the reference's
    * `*Config.from_path_and_columns` idiom. */
  def filesImageText(tablePath: String, imagePathCol: String = "image_path",
      textCol: String = "caption"): FilesConfig =
    FilesConfig(tablePath, Seq(
      FilePayload(Modality.Image, imagePathCol),
      ColumnPayload(Modality.Text, textCol)))

  def shardsImageText(dir: String, imageNameCol: String = "image_name",
      textCol: String = "caption"): ShardsConfig =
    ShardsConfig(dir, Seq(
      ShardedPayload(Modality.Image, imageNameCol),
      ColumnPayload(Modality.Text, textCol)))

  def shardedFilesImageText(dir: String, imageNameCol: String = "image_name",
      textCol: String = "caption"): ShardedFilesConfig =
    ShardedFilesConfig(dir, Seq(
      ShardedPayload(Modality.Image, imageNameCol),
      ColumnPayload(Modality.Text, textCol)))
}
