package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` surface over the documents table — the
  * case-class-Encoder API for call sites where compile-time safety
  * beats raw expression throughput (driver-side orchestration,
  * small/medium derived tables, business logic with many fields).
  *
  * Deliberate division of labor: hot per-row analytics stay in the
  * expression/codegen world (`TextFunctions`); typed lambdas
  * serialize through Encoders and fence codegen, so they are the
  * right tool only when the logic is branchy and the data is not the
  * 100 TB fact table. `toStats` is the typed twin of the
  * `q_text_stats` projection for exactly such call sites.
  */
object Typed {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  final case class DocStats(doc_id: Long, lang: String, nTokens: Int,
      nChars: Long)

  /** compiled once — String.split would Pattern.compile per row */
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def docs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    graft.queries.Tables.t(spark, sfDir, "documents").as[Doc]
  }

  /** Typed row map (Encoder round trip, branchy logic allowed). */
  def toStats(ds: Dataset[Doc]): Dataset[DocStats] = {
    import ds.sparkSession.implicits._
    ds.map { d =>
      DocStats(d.doc_id, d.lang,
        Ws.split(d.text).count(_.nonEmpty), d.n_chars)
    }
  }

  /** Typed grouped reduction: the longest document per language
    * (groupByKey + reduceGroups — partial aggregation still applies). */
  def longestPerLang(ds: Dataset[Doc]): Dataset[(String, Doc)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.lang).reduceGroups { (a: Doc, b: Doc) =>
      if (a.n_chars > b.n_chars || (a.n_chars == b.n_chars &&
        a.doc_id < b.doc_id)) a else b
    }
  }
}
