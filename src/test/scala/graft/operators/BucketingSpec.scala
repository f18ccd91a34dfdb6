package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000 by 2).map(i => (i.toLong, i * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "b_left", "k", numBuckets = 8)
    Bucketing.writeBucketed(right, "b_right", "k", numBuckets = 8)

    // force the shuffle-vs-colocated comparison (broadcast would win
    // on toy sizes and hide the bucketing effect)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_left", "b_right", "k")
      assert(Bucketing.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(2000))
      assert(joined.count() == 500)

      // the same join on unbucketed frames DOES shuffle — the contrast
      val plain = left.join(right, Seq("k"))
      assert(!Bucketing.isShuffleFree(plain))

      // aggregation on the bucket key is shuffle-free too
      val agg = spark.table("b_left").groupBy(col("k")).count()
      assert(Bucketing.isShuffleFree(agg))
      assert(agg.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
