package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.StructType
import graft.core.Modality

/** One sample handed to a [[DataFilter]]: the join key, raw payload
  * bytes per modality, and any requested metadata values.
  * (Mirrors ModalityToDataMapping + metadata, DPF/types.py:5 and
  * DPF/filters/data_filter.py:63-84.) */
final case class FilterInput(
    key: String,
    payloads: Map[String, Array[Byte]],
    metadata: Map[String, Any])

/** Payload-reading enrichment UDF contract — the Spark re-expression
  * of the reference's DataFilter (DPF/filters/data_filter.py:15-146).
  *
  * Execution model: Processor.applyDataFilter selects only the key,
  * the needed payload columns, and [[metadataColumns]]; inside each
  * partition, rows are batched [[batchSize]] at a time (tar shards
  * are read once per archive first), [[processBatch]] runs on the
  * task thread (GPU/native batching lives here), and per-row results
  * come back as `Some(values)` aligned with [[resultSchema]] or
  * `None` to drop the row — DPF's `return_none_on_error=True`
  * semantics, which the validated left join then surfaces as nulls
  * (processor.py:180-197).
  */
trait DataFilter extends Serializable {
  def name: String = getClass.getSimpleName.stripSuffix("$")

  /** modalities whose payloads this filter needs; the first one's
    * path column is the join key (DPF img_filter.py:16-18). */
  def modalities: Seq[Modality]

  /** metadata columns forwarded into [[FilterInput.metadata]]
    * (the CRAFT→OCR column-dependency mechanism,
    * DPF/filters/images/ocr_filter.py:78-82). */
  def metadataColumns: Seq[String] = Nil

  /** schema of the produced columns (key column excluded). */
  def resultSchema: StructType

  def batchSize: Int = 64

  /** Process one batch; result aligns 1:1 with the input batch. */
  def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]]
}

/** Metadata-only map UDF contract — the reference's ColumnFilter
  * (DPF/filters/column_filter.py:8-68), re-expressed as named column
  * expressions so the work stays inside Catalyst/codegen instead of a
  * row-at-a-time Python map. */
trait ColumnFilter {
  def name: String = getClass.getSimpleName.stripSuffix("$")

  /** columns the expressions read (DPF columns_to_process). */
  def requiredColumns: Seq[String]

  /** produced columns, applied in order (DPF result_columns). */
  def resultColumns: Seq[(String, Column)]
}
