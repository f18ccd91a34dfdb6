package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** Device-pinned partition execution — the Spark re-expression of the
  * reference's MultiGPUDataFilter (DPF/filters/multigpu_filter.py:
  * 39-133): where the reference splits the frame N ways and spawns a
  * process per GPU, Spark's unit of placement is the task, so "one
  * slice per device" is `repartition(nDevices)` + a stable
  * partition→device mapping inside the task. No custom operator
  * needed — this helper just standardizes the mapping and keeps the
  * batched two-phase shape of [[DataFilter]].
  */
object DevicePinned {

  /** Repartition to one partition per device and run `f` with the
    * device ordinal this task owns (partitionId mod nDevices — stable
    * under retries because Spark reuses partition ids). */
  def mapPartitionsWithDevice(df: DataFrame, nDevices: Int,
      outSchema: StructType)(
      f: (Int, Iterator[Row]) => Iterator[Row]): DataFrame = {
    require(nDevices > 0)
    df.repartition(nDevices)
      .mapPartitions { it =>
        val device = TaskContext.getPartitionId() % nDevices
        f(device, it)
      }(Encoders.row(outSchema))
  }
}
