package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Distinct-value enrichment harness — the shape of the reference's
  * GoogleTranslateFilter (DPF/filters/texts/google_translate_filter
  * .py:43-118): an expensive per-value function (external API call,
  * model inference) runs once per DISTINCT value of a column, in
  * size-capped batches, and the results join back to every row.
  *
  * Scale: `dropDuplicates` collapses the value space before the
  * expensive step (the reference's `set(df[text])`), batches bound
  * the per-call payload (`maxBatchChars` ≙ the reference's ≤3000-char
  * API batches), and the broadcast-friendly result table joins back
  * without shuffling the full dataset when small.
  */
object DistinctValueFilter {

  /** Apply `fn` (batch of distinct values → results, aligned 1:1) and
    * attach the result as `outputColumn`. */
  def apply(p: Processor, column: String, outputColumn: String,
      maxBatchChars: Int = 3000)(
      fn: Seq[String] => Seq[String]): Processor = {
    require(p.columns.contains(column), s"no such column: $column")
    val outSchema = StructType(Seq(
      StructField(column, StringType, nullable = false),
      StructField(outputColumn, StringType, nullable = true)))
    val results = p.df.select(col(column)).na.drop().distinct()
      .mapPartitions { it =>
        // greedy size-capped batching (google_translate_filter.py:12-40)
        val values = it.map(_.getString(0))
        new Iterator[Seq[String]] {
          private var nextBatch: Seq[String] = fetch()
          private def fetch(): Seq[String] = {
            val buf = Seq.newBuilder[String]
            var chars = 0
            var n = 0
            while (values.hasNext && (n == 0 || chars < maxBatchChars)) {
              val v = values.next()
              buf += v
              chars += v.length
              n += 1
            }
            val b = buf.result()
            if (b.isEmpty) null else b
          }
          def hasNext: Boolean = nextBatch != null
          def next(): Seq[String] = {
            val b = nextBatch; nextBatch = fetch(); b
          }
        }.flatMap { batch =>
          val out = fn(batch)
          require(out.length == batch.length,
            s"distinct-value fn returned ${out.length} results for " +
              s"${batch.length} inputs")
          batch.zip(out).map { case (v, r) => Row(v, r) }
        }
      }(Encoders.row(outSchema))
    p.mergeResult(results, column)
  }
}
