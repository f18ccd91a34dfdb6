package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.SerializableHadoopConf

/** Distributed content-range fetch for huge tar members — the scale
  * path the one-member-one-row DSv2 source cannot provide: there, a
  * multi-GB member's bytes all flow through the task that owns its
  * header (and a >2 GiB payload cannot fit one row at all).
  *
  * Shape: the caller reads the PRUNED tar listing (archive, member,
  * size, offset — no content, so the scan is header-rate), this
  * operator explodes each member into ⌈size / chunkBytes⌉ fixed-size
  * content-range descriptors, hash-repartitions the descriptors (tiny
  * rows — only metadata crosses the exchange, the same discipline as
  * [[graft.plans.HoistPayloadLoad]]), and each task preads its chunks
  * directly at `offset + chunk_offset`. A 10 GB member becomes ~80
  * independent 128 MiB rows spread across the cluster; no driver-side
  * header walk, no single-task byte funnel.
  *
  * Reassembly: (member, chunk_offset) orders chunks; consumers that
  * need whole bytes concatenate, but the point of chunking is that
  * most don't — hashing, size audits, and byte-range feature passes
  * fold over chunks directly.
  *
  * Gzip-compressed archives (.tar.gz/.tgz) allow no pread and are
  * rejected per-row with a pointer at the streaming source.
  *
  * Reference scope: DPF streams whole members through one process
  * (DPF/dataloaders/shards_dataset.py:86-131); within-member
  * splitting is part of the 100 TB extension surface.
  */
object TarChunks {

  val DefaultChunkBytes: Long = 128L * 1024 * 1024

  val ChunkSchema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("chunk_offset", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** @param listing tar listing with (archive, member, size, offset)
    *                — the pruned `spark.read.format("tar")` scan; a
    *                `content` column, if present, is ignored (and its
    *                presence defeats the header-rate scan — prune it)
    * @param chunkBytes max bytes per emitted row (chunks are aligned
    *                to multiples of this within each member)
    * @return one row per (member, chunk): (archive, member, size,
    *         chunk_offset, content); a zero-byte member yields one
    *         row with empty content, so no member vanishes
    */
  def chunkedContent(listing: DataFrame, chunkBytes: Long = DefaultChunkBytes)
      : DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    require(chunkBytes <= Int.MaxValue - 8,
      s"chunkBytes must fit a byte array, got $chunkBytes")
    val spark = listing.sparkSession
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    // greatest() keeps zero-byte members at exactly one (empty) chunk;
    // sequence(0, -1) would otherwise count DOWN and emit two
    val specs = listing
      .select(col("archive"), col("member"), col("size"), col("offset"))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        expr(s"greatest(size - 1, 0L) div ${chunkBytes}L"))))
      .withColumn("chunk_offset", col("chunk_idx") * lit(chunkBytes))
      .select(col("archive"), col("member"), col("size"), col("offset"),
        col("chunk_offset"))
      // the one shuffle: descriptor rows only (five scalars), so a
      // member's chunks scatter across the cluster before any byte of
      // payload is read. The partition count MUST be pinned: AQE sees
      // only the tiny descriptor rows and would coalesce the exchange
      // to one partition, re-creating the single-task byte funnel this
      // operator exists to break — it cannot know each row inflates to
      // chunkBytes at read time.
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("archive"), col("member"), col("chunk_offset"))
    val enc = Encoders.row(ChunkSchema)
    specs.mapPartitions { rows =>
      val hconf = conf.get()
      // one open stream per archive per task — preads share the handle.
      // Closed via the task-completion listener (fires on success AND
      // failure), not just on iterator exhaustion — a task that dies
      // mid-read must not leak executor file descriptors
      val open = scala.collection.mutable.HashMap
        .empty[String, org.apache.hadoop.fs.FSDataInputStream]
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          open.values.foreach(s => try s.close() catch {
            case _: Exception =>
          })
          open.clear()
        })
      val it = rows.map { r =>
        val archive = r.getString(0)
        val member = r.getString(1)
        val size = r.getLong(2)
        val offset = r.getLong(3)
        val chunkOffset = r.getLong(4)
        if (graft.sources.tar.TarTable.isCompressed(archive))
          throw new IllegalArgumentException(
            s"cannot pread chunks through gzip: $archive — decompress " +
              "the shard or read it whole via the streaming tar source")
        val len = math.min(chunkBytes, size - chunkOffset).max(0L).toInt
        val buf = new Array[Byte](len)
        if (len > 0) {
          val in = open.getOrElseUpdate(archive, {
            val p = new Path(archive)
            p.getFileSystem(hconf).open(p)
          })
          in.readFully(offset + chunkOffset, buf, 0, len)
        }
        Row(archive, member, size, chunkOffset, buf)
      }
      it
    }(enc)
  }

  /** Whole-member reassembly of a chunked frame — mostly for tests
    * and small members; at scale, fold over chunks instead. One
    * groupBy on (archive, member): chunks of one member co-locate,
    * then concatenate in chunk_offset order. */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("archive"), col("member"), col("size"))
      .agg(array_sort(collect_list(struct(col("chunk_offset"),
        col("content")))).as("parts"))
      .select(col("archive"), col("member"), col("size"),
        aggregate(col("parts"), lit(Array.emptyByteArray),
          (acc, p) => concat(acc, p.getField("content"))).as("content"))
}
