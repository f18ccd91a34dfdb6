package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class DevicePinnedSpec extends SparkSpec {
  import spark.implicits._

  test("every task sees a stable device ordinal in [0, n)") {
    val df = (1 to 100).toDF("v")
    val schema = StructType(Seq(
      StructField("v", IntegerType), StructField("device", IntegerType)))
    val out = DevicePinned.mapPartitionsWithDevice(df, nDevices = 3, schema) {
      (device, it) => it.map(r => Row(r.getInt(0), device))
    }
    val rows = out.collect()
    assert(rows.length == 100)
    val devices = rows.map(_.getInt(1)).toSet
    assert(devices.subsetOf(Set(0, 1, 2)))
    assert(devices.size == 3, s"expected all 3 devices used, got $devices")
    assert(out.rdd.getNumPartitions == 3)
  }
}
