package graft.onnx

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Bring-your-own-model gate: a REALISTIC score-head topology (five
  * strided conv+BN+Relu blocks at 224×224, ~47M MACs/image — the
  * NSFW/aesthetic conv-head shape a converted public model lands in
  * after tools/export_model.py) must (a) fall wholly inside the
  * interpreter subset, (b) load through the per-executor session
  * cache, (c) produce input-sensitive bounded scores, and (d) run at
  * a usable per-image latency. The batch-64 ms/image reference
  * number comes from `graft.ModelCheck` and lives in NOTES.md; the
  * assertion here is a loose regression fence, not the benchmark. */
class OnnxThroughputSpec extends AnyFunSuite {

  test("realistic 5-conv head: subset-complete, cached load, " +
      "input-sensitive scores, bounded per-image latency") {
    val bytes = TestOnnx.realisticConvHead(11)
    val f = new File(
      Files.createTempDirectory("graft-byom").toFile, "head.onnx")
    val os = new FileOutputStream(f)
    try os.write(bytes) finally os.close()

    val conf = new org.apache.hadoop.conf.Configuration()
    val loads0 = OnnxModel.loads.get()
    val m = OnnxModel.forPath(f.getAbsolutePath, conf)
    OnnxModel.forPath(f.getAbsolutePath, conf) // second hit = cache
    assert(OnnxModel.loads.get() == loads0 + 1,
      "model must parse once per executor, not per call")

    assert(m.unsupportedOps.isEmpty,
      s"realistic head outside the subset: ${m.unsupportedOps}")

    val batch = 8
    // salt scales pixel MAGNITUDE — a pure spatial shift would be
    // erased by the global average pool and fail the sensitivity check
    // for the wrong reason
    def input(salt: Int) = Onnx.Tensor(Seq(batch, 3, 224, 224),
      Array.tabulate(batch * 3 * 224 * 224)(i =>
        ((i.toLong * 2654435761L % 255L).toInt / 255.0f) *
          (1.0f + salt * 0.4f)))
    val warm = m.forward(input(0)) // first pass absorbs JIT
    assert(warm.dims == Seq(batch, 1), warm.dims)
    assert(warm.data.forall(v => v > 0f && v < 1f),
      s"sigmoid scores out of (0,1): ${warm.data.toSeq}")
    // input-sensitive — a constant-output head would pass every
    // shape check while scoring nothing
    val other = m.forward(input(7))
    assert(!warm.data.sameElements(other.data),
      "scores must depend on the pixels")

    val t0 = System.nanoTime()
    m.forward(input(0))
    val msPerImage = (System.nanoTime() - t0) / 1e6 / batch
    info(f"$msPerImage%.1f ms/image at batch $batch (224×224, 5 convs)")
    // loose fence: ~47M MACs/image should stay well under this on any
    // JVM; a 10× interpreter regression (lost arraycopy, boxed loop)
    // trips it
    assert(msPerImage < 2000.0, f"$msPerImage%.1f ms/image")
  }
}
