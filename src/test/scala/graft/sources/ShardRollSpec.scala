package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import graft.SparkSpec
import graft.core._
import graft.operators.Processor

class ShardRollSpec extends SparkSpec {
  import spark.implicits._

  test("a task with more rows than maxFilesInShard rolls shards") {
    val root = Files.createTempDirectory("graft-roll").toFile
    val src = new File(root, "files")
    (0 until 5).foreach { i =>
      val f = new File(src, s"m/$i.bin")
      f.getParentFile.mkdirs()
      val os = new FileOutputStream(f)
      os.write(Array.fill[Byte](4)(i.toByte)); os.close()
    }
    val csv = new File(src, "data.csv")
    val os = new FileOutputStream(csv)
    os.write(("image_path,caption" +:
      (0 until 5).map(i => s"m/$i.bin,cap $i")).mkString("\n")
      .getBytes("UTF-8"))
    os.close()
    val p = DatasetReader.readFiles(spark,
      DatasetConfig.filesImageText(csv.getAbsolutePath))

    val out = new File(root, "shards").getAbsolutePath
    // force ONE task with 5 rows and a 2-row shard cap → shards
    // 0_0 (2), 0_1 (2), 0_2 (1)
    val cfg = ShardWriters.saveToShards(p, out, maxFilesInShard = 2,
      partitionsOverride = Some(1))
    val names = new File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(names == Seq("0_0.csv", "0_0.tar", "0_1.csv", "0_1.tar",
      "0_2.csv", "0_2.tar"), names)

    val back = DatasetReader.readShards(spark, cfg)
    assert(back.count() == 5)
    val perShard = back.df.groupBy("split_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perShard == Map("0_0" -> 2L, "0_1" -> 2L, "0_2" -> 1L))
    assert(Validators.validate(back).isValid)
  }
}
