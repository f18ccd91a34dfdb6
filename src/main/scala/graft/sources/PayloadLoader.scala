package graft.sources

import java.io.ByteArrayOutputStream
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Task-side payload access: resolves the canonical `<modality>_path`
  * columns produced by [[DatasetReader]] into raw bytes.
  *
  * Two path shapes:
  *  - `"/dir/file.jpg"` — plain file, random-access read
  *    (mirrors DPF/dataloaders/files_dataset.py:74-107);
  *  - `"/dir/0.tar!member.jpg"` — member of a tar shard
  *    (mirrors DPF/dataloaders/shards_dataset.py:86-131).
  *
  * Scale notes: tar has no index, so member access is a sequential
  * scan — the loader therefore reads each archive ONCE per partition
  * and serves all requested members from that single pass
  * ([[loadTarMembers]]), the same shard-at-a-time discipline as the
  * reference's IterableDataset. Callers group rows by archive before
  * asking for bytes (see Processor.applyDataFilter). Instances are
  * created per-task (not serialized).
  */
final class PayloadLoader(conf: Configuration) {

  /** Read one plain file fully. */
  def loadFile(path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** One sequential pass over a tar archive collecting exactly the
    * requested members. Returns member → bytes; absent members are
    * simply missing from the map (callers decide error semantics). */
  def loadTarMembers(archivePath: String,
      members: Set[String]): Map[String, Array[Byte]] = {
    if (members.isEmpty) return Map.empty
    val p = new Path(archivePath)
    val fs = p.getFileSystem(conf)
    val in = new TarArchiveInputStream(fs.open(p))
    try {
      val found = Map.newBuilder[String, Array[Byte]]
      var remaining = members.size
      var entry = in.getNextEntry
      while (entry != null && remaining > 0) {
        if (!entry.isDirectory && members.contains(entry.getName)) {
          val out = new ByteArrayOutputStream(entry.getSize.toInt.max(64))
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          found += entry.getName -> out.toByteArray
          remaining -= 1
        }
        entry = in.getNextEntry
      }
      found.result()
    } finally in.close()
  }

  /** List all member names of a tar archive (one header-only pass). */
  def listTarMembers(archivePath: String): Seq[String] = {
    val p = new Path(archivePath)
    val fs = p.getFileSystem(conf)
    val in = new TarArchiveInputStream(fs.open(p))
    try {
      val names = Seq.newBuilder[String]
      var entry = in.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) names += entry.getName
        entry = in.getNextEntry
      }
      names.result()
    } finally in.close()
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }
}

object PayloadLoader {
  /** Split a canonical path into (archive, member) for tar paths. */
  def splitTarPath(path: String): Option[(String, String)] = {
    val i = path.indexOf('!')
    if (i < 0) None else Some((path.substring(0, i), path.substring(i + 1)))
  }
}
