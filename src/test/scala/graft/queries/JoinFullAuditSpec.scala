package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The oracle corpus is fully matched, so `q_join_full` never
  * exercises [[Relational.joinFullAudit]]'s orphan branches — this
  * spec plants orphans on BOTH sides and pins all three side rows. */
class JoinFullAuditSpec extends SparkSpec {
  import spark.implicits._

  test("full-outer audit classifies matched and both orphan sides") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-joinfull-spec").toString
    // customers 1,2,3 — customer 1 has no orders (customer_only);
    // orders for 2,3 match; orders for 4 have no customer (orders_only)
    Seq(1L, 2L, 3L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((10L, 2L), (11L, 3L), (12L, 4L), (13L, 4L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")

    val rows = Relational.joinFullAudit(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("matched", "customer_only", "orders_only"))
    assert(rows("matched") == ((2L, 2L)))      // keys 2,3 · one order each
    assert(rows("customer_only") == ((1L, 0L))) // key 1 · zero orders
    assert(rows("orders_only") == ((1L, 2L)))  // key 4 · two orders
  }
}
