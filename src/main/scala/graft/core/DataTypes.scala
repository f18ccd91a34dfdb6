package graft.core

/** Storage strategy for one modality's payload — modality × storage.
  *
  * Mirrors the reference's datatype ADT (DPF/datatypes.py:6-101):
  *  - ColumnDataType: payload inline in a table column (text only)
  *  - FileDataType:   payload at a path on the filesystem
  *  - ShardedDataType: payload is a member of the row's shard
  *    (tar archive or directory), addressed by basename.
  *
  * After load, all three normalize to either a StringType column or
  * a (path StringType, optionally payload BinaryType) column pair.
  */
sealed trait PayloadType {
  def modality: Modality
  /** user-facing column this datatype binds in the raw metadata table */
  def userColumn: String
}

final case class ColumnPayload(modality: Modality, userColumn: String)
    extends PayloadType {
  require(modality.canBeColumn, s"${modality.name} cannot be a column payload")
}

final case class FilePayload(modality: Modality, userColumn: String)
    extends PayloadType

final case class ShardedPayload(modality: Modality, userColumn: String)
    extends PayloadType
