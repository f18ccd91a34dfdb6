package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that a silent mistake could break:
  * the catalog maps merge with ++, so a duplicated query name across
  * catalog objects would silently drop one implementation; an oracle
  * without a query (or vice versa beyond the documented rows-only
  * set) would weaken the gate without failing anything. */
class SparkEntryContractSpec extends AnyFunSuite {

  private val catalogs = Seq(
    "Relational" -> (queries.Relational.queries.keySet,
      queries.Relational.oracles.keySet),
    "TextAnalysis" -> (queries.TextAnalysis.queries.keySet,
      queries.TextAnalysis.oracles.keySet),
    "Dedup" -> (queries.Dedup.queries.keySet,
      queries.Dedup.oracles.keySet),
    "Similarity" -> (queries.Similarity.queries.keySet,
      queries.Similarity.oracles.keySet),
    "TimeSeries" -> (queries.TimeSeries.queries.keySet,
      queries.TimeSeries.oracles.keySet),
    "Curation" -> (queries.Curation.queries.keySet,
      queries.Curation.oracles.keySet),
    "Graph" -> (queries.Graph.queries.keySet,
      queries.Graph.oracles.keySet),
    "Layout" -> (queries.Layout.queries.keySet,
      queries.Layout.oracles.keySet),
    "Spectral" -> (queries.Spectral.queries.keySet,
      queries.Spectral.oracles.keySet),
    "Factorize" -> (queries.Factorize.queries.keySet,
      queries.Factorize.oracles.keySet))

  test("no query name collides across catalog objects") {
    val all = catalogs.flatMap(_._2._1.toSeq)
    val dups = all.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicated query names: $dups")
    assert(SparkEntry.queries.size ==
      all.length + queries.RoundTrip.queries.size)
  }

  test("every oracle has a query; rows-only queries are the known set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // rows-only (no-oracle) queries must be deliberate, not an
    // accidentally-dropped oracle entry; since the round-trip query
    // gained its fingerprint oracle, every query is oracle-checked
    assert((q -- o).isEmpty, s"rows-only set: ${q -- o}")
  }

  test("per-catalog oracle coverage is total") {
    catalogs.foreach { case (name, (qs, os)) =>
      assert(qs == os, s"$name queries/oracles diverge: " +
        s"onlyQ=${qs -- os} onlyO=${os -- qs}")
    }
  }
}
