package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import graft.core.Modality
import graft.SparkSpec
import graft.onnx.{OnnxModel, TestOnnx}

/** OnnxFlowFilter: a real (toy) flow net over stacked frame pairs —
  * the RAFT execution shape on the interpreter's conv tier — plus
  * the Farneback fallback when no model is given. */
class OnnxFlowFilterSpec extends SparkSpec {

  private def frame(shift: Int): Array[Byte] = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = ((x + shift) * 8) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** [1,6,S,S] → Conv(6→2, 1×1) → [1,2,S,S]: u = R(a) − R(b),
    * v = G(a) − G(b) — a hand-checkable differencing "flow net". */
  private lazy val flowNet: Array[Byte] = TestOnnx.model(
    nodes = Seq(TestOnnx.node("Conv", Seq("x", "w"), Seq("y"),
      Seq(TestOnnx.attrInts("kernel_shape", Seq(1L, 1L))))),
    inits = Seq(TestOnnx.tensor("w", Seq(2, 6, 1, 1),
      Seq(1f, 0f, 0f, -1f, 0f, 0f,
        0f, 1f, 0f, 0f, -1f, 0f))),
    inputs = Seq("x"), outputs = Seq("y"))

  private lazy val dir: File =
    Files.createTempDirectory("graft-flow-filter").toFile
  private lazy val modelFile: String = {
    val f = new File(dir, "flow.onnx")
    val o = new FileOutputStream(f)
    try o.write(flowNet) finally o.close()
    f.getAbsolutePath
  }

  private def in(avi: Array[Byte]) =
    FilterInput("k", Map(Modality.Video.name -> avi), Map.empty)

  test("identical frames produce zero model flow; motion produces some") {
    val still = Mjpeg.write(Seq(frame(0), frame(0), frame(0)), 64, 64, 10)
    val filter = OnnxFlowFilter(Some(modelFile), nFrames = 3,
      inputSize = 16)
    val zero = filter.processBatch(Seq(in(still))).head.get
    assert(zero(0) == true, zero)
    assert(zero(1).asInstanceOf[Double] == 0.0)
    val moving = Mjpeg.write(Seq(frame(0), frame(6), frame(12)), 64, 64, 10)
    val some = filter.processBatch(Seq(in(moving))).head.get
    assert(some(0) == true)
    assert(some(1).asInstanceOf[Double] > 0.0)
  }

  test("the Spark-side mean equals driver-side pair sums") {
    val avi = Mjpeg.write(Seq(frame(0), frame(4), frame(9)), 64, 64, 10)
    val filter = OnnxFlowFilter(Some(modelFile), nFrames = 3,
      inputSize = 16)
    val got = filter.processBatch(Seq(in(avi))).head.get(1)
      .asInstanceOf[Double]
    val m = OnnxModel.parseBytes(flowNet)
    val imgs = VideoFrames.extractSampled(avi, 3).toOption.get._3
      .map(b => ImageIO.read(new java.io.ByteArrayInputStream(b)))
    var total = 0.0
    var count = 0L
    imgs.sliding(2).foreach { case Seq(a, b) =>
      val (mag, n) = filter.modelFlow(m, a, b)
      total += mag
      count += n
    }
    assert(math.abs(got - total / count) < 1e-9)
  }

  test("a RAFT-style GRU-bearing flow net runs END TO END through the " +
      "filter — recurrent update inside the subset") {
    // the RAFT execution shape in miniature: conv feature encoder
    // with INSTANCE NORM (raft_small's FeatureEncoder norm layer) →
    // T=3 recurrent GRU refinement steps over the (flattened)
    // feature state → project the final hidden state to a coarse
    // [1, 2, 4, 4] flow field → bilinear RESIZE upsample to
    // [1, 2, 8, 8] (the F.interpolate flow upsampler every RAFT
    // export ends with). Every op inside the interpreter subset —
    // this is the graph class the GRU tier + real-export residue
    // ops exist for.
    def seeded(n: Int, s: Int, amp: Float): Seq[Float] =
      (0 until n).map { i =>
        val h0 = i.toLong * 2654435761L + s.toLong * 7919L
        val h1 = (h0 ^ (h0 >>> 31)) * 0x9E3779B97F4A7C15L
        (Math.floorMod(h1 ^ (h1 >>> 33), 13L) - 6) * amp
      }
    val i512 = 8 * 8 * 8 // conv features flattened
    val hid = 16
    val net = TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Conv", Seq("x", "cw"), Seq("c"),
          Seq(TestOnnx.attrInts("kernel_shape", Seq(3L, 3L)),
            TestOnnx.attrInts("strides", Seq(2L, 2L)),
            TestOnnx.attrInts("pads", Seq(1L, 1L, 1L, 1L)))),
        TestOnnx.node("InstanceNormalization",
          Seq("c", "inscale", "inbias"), Seq("cn")),
        TestOnnx.node("Reshape", Seq("cn", "seqshape"), Seq("f")),
        TestOnnx.node("Concat", Seq("f", "f", "f"), Seq("seq"),
          Seq(TestOnnx.attrInt("axis", 0L))),
        TestOnnx.node("GRU", Seq("seq", "W", "R"), Seq("", "hT"),
          Seq(TestOnnx.attrInt("hidden_size", hid.toLong))),
        TestOnnx.node("Reshape", Seq("hT", "flatshape"), Seq("h")),
        TestOnnx.node("Gemm", Seq("h", "proj"), Seq("z"),
          Seq(TestOnnx.attrInt("transB", 1L))),
        TestOnnx.node("Reshape", Seq("z", "flowshape"), Seq("coarse")),
        TestOnnx.node("Resize", Seq("coarse", "", "upscales"), Seq("y"),
          Seq(TestOnnx.attrString("mode", "linear"),
            TestOnnx.attrString("coordinate_transformation_mode",
              "pytorch_half_pixel")))),
      inits = Seq(
        TestOnnx.tensor("inscale", Seq(8), Seq.fill(8)(1f)),
        TestOnnx.tensor("inbias", Seq(8), Seq.fill(8)(0f)),
        TestOnnx.tensor("upscales", Seq(4), Seq(1f, 1f, 2f, 2f)),
        TestOnnx.tensor("cw", Seq(8, 6, 3, 3), seeded(8 * 6 * 9, 1, 0.02f)),
        TestOnnx.tensor("seqshape", Seq(3), Seq(1f, 1f, i512.toFloat)),
        TestOnnx.tensor("W", Seq(1, 3 * hid, i512),
          seeded(3 * hid * i512, 2, 0.004f)),
        TestOnnx.tensor("R", Seq(1, 3 * hid, hid),
          seeded(3 * hid * hid, 3, 0.02f)),
        TestOnnx.tensor("flatshape", Seq(2), Seq(1f, hid.toFloat)),
        TestOnnx.tensor("proj", Seq(32, hid), seeded(32 * hid, 4, 0.05f)),
        TestOnnx.tensor("flowshape", Seq(4), Seq(1f, 2f, 4f, 4f))),
      inputs = Seq("x"), outputs = Seq("y"))
    assert(OnnxModel.parseBytes(net).unsupportedOps.isEmpty,
      s"GRU flow net outside subset: " +
        OnnxModel.parseBytes(net).unsupportedOps)
    val f = new File(dir, "gru-flow.onnx")
    val o = new FileOutputStream(f)
    try o.write(net) finally o.close()
    val filter = OnnxFlowFilter(Some(f.getAbsolutePath), nFrames = 2,
      inputSize = 16)
    val still = Mjpeg.write(Seq(frame(0), frame(0)), 64, 64, 10)
    val moving = Mjpeg.write(Seq(frame(0), frame(8)), 64, 64, 10)
    val rs = filter.processBatch(Seq(in(still))).head.get
    val rm = filter.processBatch(Seq(in(moving))).head.get
    assert(rs(0) == true && rm(0) == true, (rs, rm))
    val (ms, mm) = (rs(1).asInstanceOf[Double], rm(1).asInstanceOf[Double])
    assert(!ms.isNaN && !mm.isNaN && ms >= 0 && mm >= 0, (ms, mm))
    // the recurrent net must actually SEE the frames: a motion pair
    // and a still pair stack to different tensors → different flow
    assert(ms != mm, s"GRU flow net ignored its input: $ms == $mm")
  }

  test("a mis-shaped model fails the task loudly, not as silent row errors") {
    // scoring head [N,E], not a flow net: model misconfiguration
    // must not be swallowed into per-row nulls (the OnnxScoreFilter
    // contract — per-row errors are for bad data only)
    val bad = new File(dir, "bad.onnx")
    val o = new FileOutputStream(bad)
    try o.write(TestOnnx.tinyCnnEncoder(4, 3)) finally o.close()
    val avi = Mjpeg.write(Seq(frame(0), frame(3)), 64, 64, 10)
    val e = intercept[IllegalArgumentException] {
      OnnxFlowFilter(Some(bad.getAbsolutePath), nFrames = 2,
        inputSize = 16).processBatch(Seq(in(avi)))
    }
    // here the 6-channel input trips Conv before the [1,2,H,W] check
    assert(e.getMessage.contains("Conv") ||
      e.getMessage.contains("flow model"))
  }

  test("a model with ops outside the subset fails the task with the " +
      "COMPLETE op list, before any decode") {
    // a genuine-RAFT-style graph using ops the interpreter lacks: a
    // bad MODEL is a job error (the OnnxScoreFilter contract), not
    // per-row error rows — those would let a misconfigured model
    // complete "successfully" as all-error output over a huge corpus
    val raftish = TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Conv", Seq("x", "w"), Seq("c"),
          Seq(TestOnnx.attrInts("kernel_shape", Seq(1L, 1L)))),
        TestOnnx.node("ScatterND", Seq("c"), Seq("s")),
        TestOnnx.node("NonMaxSuppression", Seq("s"), Seq("y"))),
      inits = Seq(TestOnnx.tensor("w", Seq(2, 6, 1, 1),
        Seq.fill(12)(0.1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val f = new File(dir, "raftish.onnx")
    val o = new FileOutputStream(f)
    try o.write(raftish) finally o.close()
    val filter = OnnxFlowFilter(modelPath = Some(f.getAbsolutePath))
    val moving = Mjpeg.write(Seq(frame(0), frame(4)), 64, 64, 10)
    val e = intercept[IllegalArgumentException] {
      filter.processBatch(Seq(in(moving)))
    }
    val err = e.getMessage
    assert(err.contains("NonMaxSuppression") && err.contains("ScatterND"),
      s"error must list every missing op: $err")
    assert(err.contains("Farneback"), "error should point at the fallback")
  }

  test("GridSample-bearing flow nets run inside the subset") {
    assert(graft.onnx.OnnxModel.SupportedOps.contains("GridSample"))
    assert(OnnxModel.parseBytes(flowNet).unsupportedOps.isEmpty)
  }

  test("no model falls back to the Farneback computation") {
    val avi = Mjpeg.write(Seq(frame(0), frame(2), frame(5)), 64, 64, 10)
    val got = OnnxFlowFilter(None, nFrames = 3)
      .processBatch(Seq(in(avi))).head.get
    val want = FarnebackFilter(nFrames = 3)
      .processBatch(Seq(in(avi))).head.get
    assert(got == want)
  }
}
