package graft.core

/** Validation error taxonomy — sealed ADT mirroring the reference's
  * error classes (DPF/validators/errors.py:13-77). */
sealed trait ValidationError {
  def describe: String
}

final case class MissedColumnsError(location: String, columns: Seq[String])
    extends ValidationError {
  def describe = s"$location: missing required columns ${columns.mkString(",")}"
}

final case class DuplicatedValuesError(location: String, column: String,
    values: Seq[String]) extends ValidationError {
  def describe =
    s"$location: duplicated values in $column: ${values.take(5).mkString(",")}"
}

final case class MissingValueError(location: String, column: String)
    extends ValidationError {
  def describe = s"$location: null/missing values in $column"
}

final case class NoSuchFileError(path: String) extends ValidationError {
  def describe = s"file referenced by table but absent on storage: $path"
}

final case class FileNotInDataError(path: String) extends ValidationError {
  def describe = s"file on storage but absent from table: $path"
}

final case class IsNotKeyError(location: String, column: String)
    extends ValidationError {
  def describe = s"$location: column $column is not a key (has duplicates)"
}

/** Error container (DPF/validators/validator.py:7-29). */
final case class ValidationResult(errors: Seq[ValidationError]) {
  def totalErrors: Int = errors.size
  def isValid: Boolean = errors.isEmpty
  def ++(other: ValidationResult): ValidationResult =
    ValidationResult(errors ++ other.errors)
}

object ValidationResult {
  val empty: ValidationResult = ValidationResult(Seq.empty)
}
