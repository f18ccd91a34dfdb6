package graft.sources.tar

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.util
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.SerializableHadoopConf

/** DataSourceV2 reader for tar shard archives:
  * `spark.read.format("tar").load(dir)` yields one row per archive
  * member — (archive, member, size, content).
  *
  * Partition planning is two-tier:
  *   - archives at or below `splitBytes` (defaults to the session's
  *     `spark.sql.files.maxPartitionBytes`, i.e. 128 MiB) get one
  *     input partition each — the shard-at-a-time discipline of the
  *     reference's IterableDataset (DPF/dataloaders/shards_dataset.py
  *     :86-131);
  *   - larger archives are split into byte ranges of ~`splitBytes`,
  *     so ONE huge archive parallelizes across the cluster instead of
  *     serializing on a single task. Tar has no central index, so a
  *     range reader re-synchronizes to the first member header at or
  *     after its range start (512-aligned block with a valid header
  *     checksum AND the ustar magic), then walks headers with
  *     positioned reads. A member belongs to the range that contains
  *     its file-header offset; pax/long-name meta headers that
  *     straddle a boundary are recovered by a bounded backward scan,
  *     so names survive arbitrary split points.
  *
  * Column pruning is pushed into the reader: when `content` is not
  * projected (e.g. the validators' member-listing pass), the reader
  * seeks from header to header and never touches payload bytes —
  * listing a 100 TB shard corpus reads ~512 bytes per member, not the
  * payloads.
  *
  * Caveat (documented trade, same class as Hadoop's text-split line
  * resync): a member whose CONTENT embeds valid tar headers at
  * 512-aligned offsets can defeat resync. Lookahead confirmation
  * narrows this to CHAINS of forgeries — a single embedded header is
  * rejected because its size field must land a second valid header
  * (spec-pinned); a `.tar` stored INSIDE a shard tar still defeats it,
  * since its genuine header chain confirms itself. For such corpora
  * pass `.option("split", "false")` for partition-per-archive.
  *
  * Caveat: pax GLOBAL headers (typeflag 'g') are skipped, not
  * applied. A 'g' record near the archive start would have to govern
  * members in every later byte range, which a range reader cannot
  * see without scanning from offset zero — honoring it only when it
  * happens to fall in-range would give split-dependent results. The
  * .tgz branch (commons-compress streaming) does honor globals, so
  * the two readers can disagree on third-party archives that use
  * them; shard writers never emit 'g'.
  *
  * This complements (not replaces) the mapPartitions payload path in
  * [[graft.sources.PayloadLoader]]: the DSv2 source is the right tool
  * when the QUERY is over members themselves; the loader is right
  * when enriching an existing metadata table.
  *
  * One member is one row by default, so a multi-GB member's bytes
  * flow through the one task that owns its header (and anything past
  * 2 GiB cannot fit a row at all). Two escapes:
  *   - `.option("hugeMemberMode", "chunks")` (+ optional
  *     `chunkBytes`, default 128 MiB): members larger than
  *     `chunkBytes` emit INLINE as multiple content-range rows —
  *     `size` is each row's byte count, `offset` the chunk's
  *     absolute archive offset — so mixed archives read in one scan
  *     with no manual branch. Pruned scans emit the SAME chunk rows
  *     as descriptor-only rows (no payload bytes touched), so row
  *     multiplicity never depends on column pruning. The chunks of one member still
  *     originate in the task that owns its header (rows ≤ chunkBytes
  *     each, so they spill and redistribute on the next shuffle);
  *   - [[graft.sources.TarChunks.chunkedContent]] stays the fully
  *     distributed path: the pruned (header-rate) listing — which
  *     carries each payload's `offset` — explodes into fixed-size
  *     content-range descriptors, shuffles those tiny rows, and
  *     preads each chunk post-shuffle, so one huge member's BYTES
  *     land on many tasks from the first read.
  */
class TarDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tar"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("tar source needs a path"))
    new TarTable(path)
  }
}

object TarTable {
  val Schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    // payload start offset within the archive (uncompressed stream
    // offset for .tgz) — the key that lets [[graft.sources.TarChunks]]
    // pread huge members in distributed chunks without re-walking
    // headers
    StructField("offset", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Plain or gzip-compressed shard archives. */
  def hasTarExtension(name: String): Boolean =
    name.endsWith(".tar") || name.endsWith(".tar.gz") ||
      name.endsWith(".tgz")

  def isCompressed(name: String): Boolean =
    name.endsWith(".tar.gz") || name.endsWith(".tgz")

  /** Expand a path/glob/directory into (path, fileSize) pairs. */
  def resolvePaths(path: String): Seq[(String, Long)] = {
    val spark = SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // getFileStatus replaces the deprecated fs.isDirectory; a missing
    // path falls through to the glob branch exactly as before
    val isDir =
      try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    val statuses =
      if (isDir)
        fs.listStatus(p).filter(s =>
          s.isFile && hasTarExtension(s.getPath.getName))
      else fs.globStatus(p) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case gs => gs.filter(_.isFile)
      }
    statuses.map(s => s.getPath.toString -> s.getLen).sortBy(_._1).toSeq
  }
}

class TarTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tar($path)"
  override def schema(): StructType = TarTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(path, options)
}

class TarScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TarTable.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val split = options.getBoolean("split", true)
    // default follows the session's file-split convention so tar
    // ranges size like any other file source's partitions
    val sessionDefault = SparkSession.active.sessionState.conf
      .filesMaxPartitionBytes
    val splitBytes = options.getLong("splitBytes", sessionDefault)
    require(splitBytes >= TarFormat.BlockSize,
      s"splitBytes must be >= ${TarFormat.BlockSize}, got $splitBytes")
    // hugeMemberMode=chunks: members larger than chunkBytes emit as
    // multiple content-range rows inline (no manual TarChunks branch
    // at the call site); default "error" keeps one-member-one-row and
    // fails loudly past the row limit
    val hugeMode = Option(options.get("hugeMemberMode")).getOrElse("error")
    require(hugeMode == "error" || hugeMode == "chunks",
      s"hugeMemberMode must be 'error' or 'chunks', got $hugeMode")
    val chunkBytes = options.getLong("chunkBytes",
      graft.sources.TarChunks.DefaultChunkBytes)
    require(chunkBytes >= TarFormat.BlockSize &&
        chunkBytes <= Int.MaxValue - 8,
      s"chunkBytes must be in [${TarFormat.BlockSize}, ~2 GiB), " +
        s"got $chunkBytes")
    new TarScan(path, required, if (split) splitBytes else Long.MaxValue,
      hugeMode == "chunks", chunkBytes)
  }
}

class TarScan(path: String, required: StructType, splitBytes: Long,
    chunkHuge: Boolean = false,
    chunkBytes: Long = graft.sources.TarChunks.DefaultChunkBytes)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"TarScan(path=$path, columns=${required.fieldNames.mkString(",")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    TarTable.resolvePaths(path).flatMap { case (file, len) =>
      // gzip has no random access: compressed archives stream whole
      // (re-shard or decompress corpora whose .tgz outgrow one task)
      if (TarTable.isCompressed(file) || len <= splitBytes)
        Seq(TarInputPartition(file, 0L, len, len))
      else {
        // Even-sized ranges (last one absorbs the remainder's tail);
        // range boundaries need no alignment — the reader aligns.
        val n = math.max(1L, len / splitBytes)
        val step = len / n
        (0L until n).map { i =>
          val start = i * step
          val end = if (i == n - 1) len else (i + 1) * step
          TarInputPartition(file, start, end, len)
        }
      }
    }.map(p => p: InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    TarReaderFactory(required, conf, chunkHuge, chunkBytes)
  }
}

/** A byte range [start, end) of one archive. A member is owned by the
  * range containing its file-header offset (meta headers may precede
  * `start` and content may extend past `end`).
  */
case class TarInputPartition(archivePath: String, start: Long, end: Long,
    fileSize: Long) extends InputPartition

case class TarReaderFactory(required: StructType,
    conf: SerializableHadoopConf, chunkHuge: Boolean = false,
    chunkBytes: Long = graft.sources.TarChunks.DefaultChunkBytes)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TarInputPartition]
    if (TarTable.isCompressed(p.archivePath))
      new TarStreamReader(p, required, conf, chunkHuge, chunkBytes)
    else new TarSplitReader(p, required, conf, chunkHuge, chunkBytes)
  }
}

/** Tar header-block arithmetic (POSIX ustar + GNU + pax), shared by
  * the split reader. Field layout per the ustar spec: name(0,100),
  * size(124,12), chksum(148,8), typeflag(156), magic(257,6),
  * prefix(345,155).
  */
object TarFormat {
  val BlockSize = 512

  def padded(size: Long): Long =
    ((size + BlockSize - 1) / BlockSize) * BlockSize

  def isZeroBlock(buf: Array[Byte], off: Int): Boolean = {
    var i = off
    val end = off + BlockSize
    while (i < end) { if (buf(i) != 0) return false; i += 1 }
    true
  }

  /** Header checksum: unsigned byte sum with the chksum field treated
    * as spaces; accept the (historical) signed-byte variant too.
    */
  def checksumOk(buf: Array[Byte], off: Int): Boolean = {
    val stored = parseOctal(buf, off + 148, 8)
    if (stored < 0) return false
    var unsigned = 0L
    var signed = 0L
    var i = 0
    while (i < BlockSize) {
      val b = if (i >= 148 && i < 156) 0x20.toByte else buf(off + i)
      unsigned += (b & 0xff)
      signed += b
      i += 1
    }
    stored == unsigned || stored == signed
  }

  /** "ustar" at offset 257 — covers POSIX ("ustar\0") and GNU
    * ("ustar ") magics. Required for resync candidates; a header
    * reached by chain-walking from a verified offset needs only the
    * checksum.
    */
  def magicOk(buf: Array[Byte], off: Int): Boolean =
    buf(off + 257) == 'u' && buf(off + 258) == 's' &&
      buf(off + 259) == 't' && buf(off + 260) == 'a' &&
      buf(off + 261) == 'r'

  /** Octal field (NUL/space padded); GNU base-256 when the high bit
    * of the first byte is set. Returns -1 on garbage.
    */
  def parseOctal(buf: Array[Byte], off: Int, len: Int): Long = {
    if ((buf(off) & 0x80) != 0) { // GNU base-256 (big-endian)
      var v = (buf(off) & 0x7f).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (buf(off + i) & 0xff); i += 1 }
      return v
    }
    var i = off
    val end = off + len
    while (i < end && (buf(i) == ' ' || buf(i) == 0)) i += 1
    var v = 0L
    var any = false
    while (i < end && buf(i) >= '0' && buf(i) <= '7') {
      v = (v << 3) + (buf(i) - '0'); i += 1; any = true
    }
    if (!any) -1L else v
  }

  def parseString(buf: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && buf(end) != 0) end += 1
    new String(buf, off, end - off, StandardCharsets.UTF_8)
  }

  /** Member name per ustar: prefix + "/" + name when the POSIX prefix
    * field is set.
    */
  def memberName(buf: Array[Byte], off: Int): String = {
    val name = parseString(buf, off, 100)
    val prefix =
      // POSIX ustar: magic "ustar" + NUL at byte 262 (bytes 263-264
      // are the version "00"); GNU writes "ustar " + " \0" and has no
      // prefix field
      if (buf(off + 262) == 0) parseString(buf, off + 345, 155)
      else ""
    if (prefix.isEmpty) name else s"$prefix/$name"
  }

  /** Extract the `path` record from a pax extended header payload.
    * Records are "len key=value\n" where len counts BYTES of the
    * whole record — so the walk must stay byte-oriented and decode
    * UTF-8 only per record; indexing a decoded string breaks on
    * multibyte names (UTF-16 char offsets drift from byte offsets).
    */
  def paxValue(payload: Array[Byte], key: String): Option[String] = {
    var i = 0
    while (i < payload.length) {
      var sp = i
      while (sp < payload.length && payload(sp) != ' ') sp += 1
      if (sp >= payload.length) return None
      val len =
        try new String(payload, i, sp - i,
          StandardCharsets.US_ASCII).trim.toInt
        catch { case _: NumberFormatException => return None }
      if (len <= 0 || i + len > payload.length) return None
      val recStart = sp + 1
      val recEnd = i + len - 1 // strip trailing \n
      if (recEnd > recStart) {
        val rec = new String(payload, recStart, recEnd - recStart,
          StandardCharsets.UTF_8)
        val eq = rec.indexOf('=')
        if (eq > 0 && rec.substring(0, eq) == key)
          return Some(rec.substring(eq + 1))
      }
      i += len
    }
    None
  }

  def paxPath(payload: Array[Byte]): Option[String] =
    paxValue(payload, "path")

  def isMetaType(flag: Byte): Boolean =
    flag == 'x' || flag == 'g' || flag == 'L' || flag == 'K'

  /** Regular ('0'/NUL) and contiguous ('7') files — read identically.
    * Hard/symlink entries ('1'/'2') are NOT surfaced: their payload
    * lives at the link target, and the shard writers never emit
    * links. This diverges from commons-compress, which lists links
    * as zero-size entries. */
  def isFileType(flag: Byte): Boolean =
    flag == '0' || flag == 0 || flag == '7' 
}

/** Positioned-read walker over one byte range of a tar archive.
  *
  * All reads are preads (`FSDataInputStream.readFully(pos, ...)`):
  * header blocks are 512-byte reads, payloads are read only when the
  * `content` column survives pruning, and skipped members cost a seek
  * (no byte transfer) — so a pruned listing of a huge archive is
  * header-rate, not payload-rate.
  */
class TarSplitReader(part: TarInputPartition, required: StructType,
    conf: SerializableHadoopConf, chunkHuge: Boolean = false,
    chunkBytes: Long = graft.sources.TarChunks.DefaultChunkBytes)
    extends PartitionReader[InternalRow] {
  import TarFormat._

  private val needContent = required.fieldNames.contains("content")
  private val fieldOrder = required.fieldNames.toSeq
  private val hdr = new Array[Byte](BlockSize)

  private var opened = false
  private lazy val in: FSDataInputStream = {
    val p = new Path(part.archivePath)
    val s = p.getFileSystem(conf.get()).open(p)
    opened = true
    s
  }

  private var pos: Long = -1L // next unread header offset; -1 = not started
  private var finished = false
  private var current: InternalRow = _
  private var warnedPaxGlobal = false

  // in-flight huge member being emitted as chunk rows
  // (hugeMemberMode=chunks): name, payload start offset in the
  // archive, total size, and the next unread chunk offset within it
  private var chunkName: String = null
  private var chunkBase = 0L
  private var chunkTotal = 0L
  private var chunkNext = 0L

  /** Emit the next content-range row of the in-flight huge member:
    * `size` is THIS row's byte count, `offset` the chunk's absolute
    * archive offset — each row self-describing, reassembly orders by
    * offset and sums sizes to the member total. */
  private def emitChunk(): Unit = {
    val len = math.min(chunkBytes, chunkTotal - chunkNext).toInt
    // pruned scans emit the same chunk DESCRIPTOR rows without
    // touching payload bytes — multiplicity must not depend on which
    // columns survive pruning (count() vs collect() would disagree)
    val bytes =
      if (!needContent) null
      else {
        val b = new Array[Byte](len)
        in.readFully(chunkBase + chunkNext, b, 0, len)
        b
      }
    val values = fieldOrder.map {
      case "archive" => UTF8String.fromString(part.archivePath)
      case "member" => UTF8String.fromString(chunkName)
      case "size" => len.toLong
      case "offset" => chunkBase + chunkNext
      case "content" => bytes
    }
    current = InternalRow.fromSeq(values)
    chunkNext += len
    if (chunkNext >= chunkTotal) chunkName = null
  }

  /** First 512-aligned offset >= from holding a plausible member
    * header (checksum + magic, CONFIRMED by lookahead). Scans in
    * 1 MiB chunks.
    */
  private def resync(from: Long): Long = {
    var off = ((from + BlockSize - 1) / BlockSize) * BlockSize
    val chunk = new Array[Byte](1024 * 1024)
    // scan no further than the range end: a file header at or past
    // part.end belongs to the next range, and meta headers before it
    // are recovered by THAT range's backscan — so when a member
    // larger than splitBytes swallows this whole range, the scan is
    // O(splitBytes), not O(member)
    while (off + BlockSize <= part.fileSize && off < part.end) {
      val want = math.min(chunk.length.toLong, part.fileSize - off).toInt
      val len = want - want % BlockSize
      in.readFully(off, chunk, 0, len)
      var i = 0
      // candidates at or past part.end belong to the next range (its
      // own resync+backscan recovers them); without the clamp the
      // walk would redundantly re-read headers it then disowns
      while (i + BlockSize <= len && off + i < part.end) {
        if (!isZeroBlock(chunk, i) && magicOk(chunk, i) &&
            checksumOk(chunk, i) && lookaheadOk(chunk, i, off + i))
          return off + i
        i += BlockSize
      }
      off += len
    }
    part.fileSize
  }

  /** Lookahead confirmation of a resync candidate: the size field
    * must land the NEXT header at a position that is end-of-archive
    * (zero block / file end) or itself checksum+magic-valid. A
    * member whose CONTENT embeds one valid-looking tar header (the
    * documented resync caveat) now also needs that fake header's
    * size field to point at a SECOND valid header — two aligned
    * forgeries in a row instead of one. Costs one 512-byte pread per
    * candidate; candidates are rare (checksum+magic already held).
    */
  private def lookaheadOk(buf: Array[Byte], bo: Int, abs: Long): Boolean = {
    val size = parseOctal(buf, bo + 124, 12)
    if (size < 0) return false // garbage size field: not a header
    val next = abs + BlockSize +
      ((size + BlockSize - 1) / BlockSize) * BlockSize
    if (next < 0 || next > part.fileSize - BlockSize)
      // last member (next lands at/after EOF): plausible iff the
      // payload actually fits in the file
      return next <= part.fileSize
    val hdr = new Array[Byte](BlockSize)
    in.readFully(next, hdr, 0, BlockSize)
    isZeroBlock(hdr, 0) || (magicOk(hdr, 0) && checksumOk(hdr, 0))
  }

  /** Walk backward from a resync'd file header to recover meta
    * headers ('x'/'L'/...) of a chain that straddles the range start:
    * a meta header at `candidate - k` blocks whose extent (header +
    * padded payload) ends exactly at `candidate` belongs to the same
    * chain. Bounded at 64 blocks (32 KiB) — comfortably past
    * PATH_MAX-sized pax path payloads (4 KiB), so a chain the bound
    * misses implies a pathologically larger payload than any real
    * name record.
    */
  private def chainStartBefore(candidate: Long): Long = {
    var chainHead = candidate
    var continue = true
    while (continue) {
      continue = false
      var k = 1L
      val maxBack = math.min(64L, chainHead / BlockSize)
      while (k <= maxBack && !continue) {
        val off = chainHead - k * BlockSize
        in.readFully(off, hdr, 0, BlockSize)
        if (!isZeroBlock(hdr, 0) && magicOk(hdr, 0) && checksumOk(hdr, 0) &&
            isMetaType(hdr(156))) {
          val size = parseOctal(hdr, 124, 12)
          if (size >= 0 && BlockSize + padded(size) == k * BlockSize) {
            chainHead = off
            continue = true
          }
        }
        k += 1
      }
    }
    chainHead
  }

  private def readPayload(off: Long, size: Long): Array[Byte] = {
    if (size > Int.MaxValue - 8)
      throw new IOException(
        s"tar member payload too large for one row: $size bytes " +
          s"in ${part.archivePath} — re-read with " +
          ".option(\"hugeMemberMode\", \"chunks\") to emit it as " +
          "content-range rows inline, or read the pruned listing and " +
          "use graft.sources.TarChunks.chunkedContent for the fully " +
          "distributed fetch")
    val out = new Array[Byte](size.toInt)
    in.readFully(off, out, 0, size.toInt)
    out
  }

  override def next(): Boolean = {
    if (chunkName != null) { emitChunk(); return true }
    if (finished) return false
    if (pos < 0) {
      pos =
        if (part.start == 0) 0L
        else {
          val sync = resync(part.start)
          if (sync >= part.fileSize) { finished = true; return false }
          chainStartBefore(sync)
        }
    }
    var nameOverride: String = null
    var sizeOverride = -1L
    while (pos + BlockSize <= part.fileSize) {
      in.readFully(pos, hdr, 0, BlockSize)
      if (isZeroBlock(hdr, 0)) { finished = true; return false }
      if (!checksumOk(hdr, 0))
        throw new IOException(
          s"corrupt tar header at offset $pos in ${part.archivePath}")
      val headerSize = math.max(0L, parseOctal(hdr, 124, 12))
      // a pax 'size' record overrides the 12-char octal field (pax
      // archives with members past the octal limit store the real
      // size here; missing it would desync the whole walk)
      val size =
        if (sizeOverride >= 0 && isFileType(hdr(156))) sizeOverride
        else headerSize
      val flag = hdr(156)
      val contentOff = pos + BlockSize
      val entryEnd = contentOff + padded(size)
      if (isMetaType(flag)) {
        if (flag == 'x') {
          val payload = readPayload(contentOff, headerSize)
          nameOverride = paxPath(payload).getOrElse(nameOverride)
          sizeOverride = paxValue(payload, "size")
            .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
            .getOrElse(sizeOverride)
        }
        else if (flag == 'L') { // GNU long name, NUL-terminated
          val raw = readPayload(contentOff, headerSize)
          var n = raw.length
          while (n > 0 && raw(n - 1) == 0) n -= 1
          nameOverride = new String(raw, 0, n, StandardCharsets.UTF_8)
        }
        else if (flag == 'g' && !warnedPaxGlobal) {
          // skipped by design (split determinism — see object scaladoc)
          // but loudly: the .tgz streaming branch DOES apply globals,
          // so a third-party archive relying on one reads differently
          warnedPaxGlobal = true
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"pax GLOBAL header (typeflag 'g') at offset $pos in " +
              s"${part.archivePath} is skipped by the splittable tar " +
              "reader; its records are NOT applied to later members " +
              "(the streaming .tgz path honors them)")
        }
        pos = entryEnd // 'g'/'K': skip payload, keep walking
      } else if (isFileType(flag)) {
        // Ownership: the range holding the file-header offset emits.
        if (pos >= part.end) { finished = true; return false }
        val name =
          if (nameOverride != null) nameOverride else memberName(hdr, 0)
        nameOverride = null
        sizeOverride = -1L
        // huge members become chunk rows inline (hugeMemberMode=
        // chunks) — in pruned scans too (descriptor rows, no bytes
        // read), so row multiplicity is identical whichever columns
        // survive pruning
        if (chunkHuge && size > chunkBytes) {
          chunkName = name
          chunkBase = contentOff
          chunkTotal = size
          chunkNext = 0L
          pos = entryEnd
          emitChunk()
          return true
        }
        val content = if (needContent) readPayload(contentOff, size) else null
        val values = fieldOrder.map {
          case "archive" => UTF8String.fromString(part.archivePath)
          case "member" => UTF8String.fromString(name)
          case "size" => size
          case "offset" => contentOff
          case "content" => content
        }
        current = InternalRow.fromSeq(values)
        pos = entryEnd
        return true
      } else {
        nameOverride = null // dir/link/other: not surfaced
        sizeOverride = -1L
        pos = entryEnd
      }
    }
    finished = true
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (opened) in.close()
}

/** Streaming reader for gzip-compressed archives: no preads through
  * gzip, so this is the classic one-pass commons-compress walk —
  * partition-per-archive, content copy skipped when `content` is
  * pruned (the decompressor still inflates the bytes; that is the
  * price of .tgz shards, which is why the writers emit plain .tar).
  */
class TarStreamReader(part: TarInputPartition, required: StructType,
    conf: SerializableHadoopConf, chunkHuge: Boolean = false,
    chunkBytes: Long = graft.sources.TarChunks.DefaultChunkBytes)
    extends PartitionReader[InternalRow] {

  private val needContent = required.fieldNames.contains("content")
  private val fieldOrder = required.fieldNames.toSeq

  private var opened = false
  private lazy val in: org.apache.commons.compress.archivers.tar.TarArchiveInputStream = {
    val p = new Path(part.archivePath)
    val raw = p.getFileSystem(conf.get()).open(p)
    val stream = new java.util.zip.GZIPInputStream(
      new java.io.BufferedInputStream(raw, 1 << 20))
    opened = true
    new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(stream)
  }
  private var current: InternalRow = _

  // in-flight huge member being emitted as chunk rows
  // (hugeMemberMode=chunks — works on the stream too: chunks arrive
  // sequentially as the decompressor produces them)
  private var chunkName: String = null
  private var chunkBase = 0L // decompressed-stream offset of the payload
  private var chunkTotal = 0L
  private var chunkNext = 0L

  /** Read and emit the next sequential chunk of the in-flight huge
    * member; same row contract as the split reader's chunk rows
    * (`size` = this row's bytes, `offset` = payload start + chunk
    * offset — a decompressed-stream offset here). */
  private def emitStreamChunk(): Unit = {
    val want = math.min(chunkBytes, chunkTotal - chunkNext).toInt
    // pruned scans emit descriptor rows without reading the body
    // (getNextEntry skips it) — same multiplicity rule as the split
    // reader
    val bytes =
      if (!needContent) null
      else {
        val b = new Array[Byte](want)
        var got = 0
        var n = 0
        while (got < want && n >= 0) {
          n = in.read(b, got, want - got)
          if (n > 0) got += n
        }
        require(got == want,
          s"truncated tar entry $chunkName in ${part.archivePath}: " +
            s"expected $want more bytes at chunk offset $chunkNext, " +
            s"got $got")
        b
      }
    val values = fieldOrder.map {
      case "archive" => UTF8String.fromString(part.archivePath)
      case "member" => UTF8String.fromString(chunkName)
      case "size" => want.toLong
      case "offset" => chunkBase + chunkNext
      case "content" => bytes
    }
    current = InternalRow.fromSeq(values)
    chunkNext += want
    if (chunkNext >= chunkTotal) chunkName = null
  }

  override def next(): Boolean = {
    if (chunkName != null) { emitStreamChunk(); return true }
    var entry = in.getNextEntry
    while (entry != null && !entry.isFile) entry = in.getNextEntry
    if (entry == null) { current = null; return false }
    // bytes consumed so far in the DECOMPRESSED tar stream = this
    // entry's data start (header just finished) — the chunk-offset
    // base; gzip allows no pread, so TarChunks rejects compressed
    // archives and chunk rows here are produced sequentially instead
    val dataOff = in.getBytesRead
    if (chunkHuge && entry.getSize > chunkBytes) {
      chunkName = entry.getName
      chunkBase = dataOff
      chunkTotal = entry.getSize
      chunkNext = 0L
      emitStreamChunk()
      return true
    }
    if (needContent && entry.getSize > Int.MaxValue - 8)
      throw new java.io.IOException(
        s"tar member payload too large for one row: ${entry.getSize} " +
          s"bytes in ${part.archivePath} — re-read with " +
          ".option(\"hugeMemberMode\", \"chunks\") to emit it as " +
          "sequential content-range rows (gzip archives stream; " +
          "re-shard to plain .tar for the distributed fetch)")
    val content: Array[Byte] =
      if (!needContent) null
      else {
        val out = new java.io.ByteArrayOutputStream(
          math.max(entry.getSize.toInt, 64))
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      }
    val values = fieldOrder.map {
      case "archive" => UTF8String.fromString(part.archivePath)
      case "member" => UTF8String.fromString(entry.getName)
      case "size" => entry.getSize
      case "offset" => dataOff
      case "content" => content
    }
    current = InternalRow.fromSeq(values)
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (opened) in.close()
}
