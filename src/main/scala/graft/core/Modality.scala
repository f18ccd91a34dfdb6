package graft.core

/** Modalities and their canonical column names.
  *
  * Mirrors the reference's modality registry
  * (DPF/modalities.py:4-58): each modality has a canonical payload
  * path column (`image_path`, ...), a basename column (`image_name`),
  * and — for text only — an inline payload column (`text`).
  */
sealed abstract class Modality(val name: String) {
  /** canonical column holding the resolved payload path (file formats) */
  def pathColumn: String = s"${name}_path"
  /** canonical column holding the payload basename (sharded formats) */
  def nameColumn: String = s"${name}_name"
  /** column holding the payload inline, if the modality supports it */
  def inlineColumn: Option[String] = None
  /** can the payload live inside a table column? (only text) */
  def canBeColumn: Boolean = inlineColumn.isDefined
  /** can the payload live in a file / shard member? */
  def canBeFile: Boolean = true
}

object Modality {
  case object Image extends Modality("image")
  case object Video extends Modality("video")
  case object Audio extends Modality("audio")
  case object Text extends Modality("text") {
    override def inlineColumn: Option[String] = Some("text")
  }

  val all: Seq[Modality] = Seq(Image, Video, Audio, Text)

  def fromName(n: String): Modality =
    all.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown modality: $n"))
}
