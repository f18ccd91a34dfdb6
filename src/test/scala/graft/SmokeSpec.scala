package graft

/** Driver-contract smoke: entry() returns rows on the sf0.001 data
  * and every catalog query at least constructs and runs there. */
class SmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows at sf0.001") {
    assume(new java.io.File(sf).isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every catalog query runs at sf0.001") {
    assume(new java.io.File(sf).isDirectory)
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("every query has either an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, noOracle)
  }
}
