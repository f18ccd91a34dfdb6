package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.types.BinaryType
import graft.SparkSpec
import graft.core.DatasetConfig
import graft.sources.DatasetReader

/** The payload-load-pushdown invariant (SURVEY §4.2) as a verified
  * plan property: media BYTES are loaded inside the enrichment task
  * and never appear in any exchange's schema — the builder keeps
  * `BinaryType` out of every shuffle, which is why no
  * `Rule[LogicalPlan]` rewrite is needed (NOTES.md records the
  * decision; this spec keeps it honest if the plan shape regresses).
  */
class PayloadPlanSpec extends SparkSpec {

  /** (binary leaks, exchanges visited). The visited count guards the
    * guard: AdaptiveSparkPlanExec is a LEAF node (its real plan hangs
    * off `executedPlan`), so a naive walk sees no exchanges at all
    * and would pass vacuously. */
  private def shuffleSchemas(plan: SparkPlan): (Seq[String], Int) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var visited = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: ShuffleExchangeLike =>
          visited += 1
          s.child.output.foreach { a =>
            if (a.dataType == BinaryType)
              out += s"${a.name}: ${a.dataType} in ${s.nodeName}"
          }
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    (out.toSeq, visited)
  }

  test("enrichment + dedup plan carries no BinaryType through any exchange") {
    // build a files-layout dataset on the fly (2 tiny pngs + csv)
    val dir = java.nio.file.Files.createTempDirectory("graft-payload").toFile
    val imgDir = new java.io.File(dir, "imgs"); imgDir.mkdirs()
    def writePng(name: String, w: Int, h: Int): Unit = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      javax.imageio.ImageIO.write(img, "png", new java.io.File(imgDir, name))
    }
    writePng("a.png", 4, 3); writePng("b.png", 4, 3)
    val csv = new java.io.File(dir, "data.csv")
    java.nio.file.Files.writeString(csv.toPath,
      "image_path,caption\nimgs/a.png,one\nimgs/b.png,two\n")

    val p = DatasetReader.readFiles(spark,
      DatasetConfig.filesImageText(csv.getPath))
    val enriched = p.applyDataFilter(ImageInfoFilter())
    val deduped = enriched.dedup(Seq("width", "height"),
      Seq(org.apache.spark.sql.functions.col("image_path")))

    // force a plan with joins + window over the enriched frame
    val plan = deduped.df.queryExecution.executedPlan
    val (leaks, visited) = shuffleSchemas(plan)
    assert(visited > 0, "no exchange visited — the walk went vacuous:\n" +
      plan.treeString.take(1500))
    assert(leaks.isEmpty, s"payload bytes ride a shuffle: $leaks")
    assert(deduped.df.count() == 1) // equal dims → one survivor
  }
}
