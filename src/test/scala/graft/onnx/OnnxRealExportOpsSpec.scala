package graft.onnx

import org.scalatest.funsuite.AnyFunSuite

/** The real-export residue ops (Shape / InstanceNormalization / Pad /
  * Resize) a torch CNN/RAFT export carries — hand-computed values,
  * mode coverage, and the loud-unsupported edges. Closes the
  * raft_small census gap from the documented torchvision inventory
  * (see NOTES.md round 7). */
class OnnxRealExportOpsSpec extends AnyFunSuite {
  import TestOnnx._

  private def run1(g: Array[Byte], x: Onnx.Tensor): Onnx.Tensor =
    OnnxModel.parseBytes(g).forward(x)

  private def approx(got: Seq[Float], want: Seq[Double], tol: Double)
      : Unit = {
    assert(got.length == want.length, s"$got vs $want")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= tol, s"$got vs $want") }
  }

  test("Shape: full dims, start/end slicing, negative axes") {
    def shapeOf(attrs: Seq[Array[Byte]]): Seq[Float] = {
      val g = model(
        nodes = Seq(node("Shape", Seq("x"), Seq("y"), attrs)),
        inits = Seq.empty, inputs = Seq("x"), outputs = Seq("y"))
      run1(g, Onnx.Tensor(Seq(2, 3, 4), new Array[Float](24))).data.toSeq
    }
    assert(shapeOf(Seq.empty) == Seq(2f, 3f, 4f))
    assert(shapeOf(Seq(attrInt("start", 1L))) == Seq(3f, 4f))
    assert(shapeOf(Seq(attrInt("end", -1L))) == Seq(2f, 3f))
    assert(shapeOf(Seq(attrInt("start", -2L))) == Seq(3f, 4f))
  }

  test("InstanceNormalization: per-(n,c) stats over spatial dims") {
    val g = model(
      nodes = Seq(node("InstanceNormalization", Seq("x", "s", "b"),
        Seq("y"), Seq(attrFloat("epsilon", 1e-9f)))),
      inits = Seq(
        tensor("s", Seq(2), Seq(2f, 1f)),
        tensor("b", Seq(2), Seq(10f, 0f))),
      inputs = Seq("x"), outputs = Seq("y"))
    // ch0 = [1,3]: mean 2, pop-var 1 → ±1 → ·2 + 10 = [8, 12]
    // ch1 = [5,5]: var 0 (clamped) → 0 → [0, 0]
    val out = run1(g, Onnx.Tensor(Seq(1, 2, 1, 2), Array(1f, 3f, 5f, 5f)))
    assert(out.dims == Seq(1, 2, 1, 2))
    approx(out.data.toSeq, Seq(8.0, 12.0, 0.0, 0.0), 1e-3)
    // batch dim: stats are PER (n, c) — two batch rows of one channel
    // normalize independently (would be [-1,-1,1,1]-ish if pooled)
    val g2 = model(
      nodes = Seq(node("InstanceNormalization", Seq("x", "s", "b"),
        Seq("y"), Seq(attrFloat("epsilon", 1e-9f)))),
      inits = Seq(tensor("s", Seq(1), Seq(1f)),
        tensor("b", Seq(1), Seq(0f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out2 = run1(g2, Onnx.Tensor(Seq(2, 1, 1, 2), Array(1f, 3f, 10f, 30f)))
    approx(out2.data.toSeq, Seq(-1.0, 1.0, -1.0, 1.0), 1e-3)
  }

  test("Pad: constant mode via inputs, default and explicit value") {
    val g = model(
      nodes = Seq(node("Pad", Seq("x", "p"), Seq("y"), Seq.empty)),
      inits = Seq(tensor("p", Seq(8),
        Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = run1(g, Onnx.Tensor(Seq(1, 1, 2, 2), Array(1f, 2f, 3f, 4f)))
    assert(out.dims == Seq(1, 1, 3, 3))
    assert(out.data.toSeq == Seq(0f, 0f, 0f, 1f, 2f, 0f, 3f, 4f, 0f))
    val g2 = model(
      nodes = Seq(node("Pad", Seq("x", "p", "c"), Seq("y"), Seq.empty)),
      inits = Seq(
        tensor("p", Seq(8), Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)),
        tensor("c", Seq(1), Seq(9f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out2 = run1(g2, Onnx.Tensor(Seq(1, 1, 1, 2), Array(7f, 8f)))
    assert(out2.dims == Seq(1, 1, 1, 3))
    assert(out2.data.toSeq == Seq(9f, 7f, 8f))
    // edge/replicate: RAFT's InputPadder shape (F.pad replicate)
    val g4 = model(
      nodes = Seq(node("Pad", Seq("x", "p"), Seq("y"),
        Seq(attrString("mode", "edge")))),
      inits = Seq(tensor("p", Seq(8),
        Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out4 = run1(g4, Onnx.Tensor(Seq(1, 1, 2, 2), Array(1f, 2f, 3f, 4f)))
    assert(out4.dims == Seq(1, 1, 4, 4))
    assert(out4.data.toSeq == Seq(
      1f, 1f, 2f, 2f,
      1f, 1f, 2f, 2f,
      3f, 3f, 4f, 4f,
      3f, 3f, 4f, 4f))
    // reflect mode must fail loudly, not silently zero-pad
    val g3 = model(
      nodes = Seq(node("Pad", Seq("x", "p"), Seq("y"),
        Seq(attrString("mode", "reflect")))),
      inits = Seq(tensor("p", Seq(8), Seq.fill(8)(0f))),
      inputs = Seq("x"), outputs = Seq("y"))
    intercept[Exception] {
      run1(g3, Onnx.Tensor(Seq(1, 1, 1, 2), Array(1f, 2f)))
    }
  }

  test("Resize nearest + asymmetric + floor (the torch nearest export)") {
    val g = model(
      nodes = Seq(node("Resize", Seq("x", "", "sc"), Seq("y"), Seq(
        attrString("mode", "nearest"),
        attrString("coordinate_transformation_mode", "asymmetric"),
        attrString("nearest_mode", "floor")))),
      inits = Seq(tensor("sc", Seq(4), Seq(1f, 1f, 2f, 2f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = run1(g, Onnx.Tensor(Seq(1, 1, 2, 2), Array(1f, 2f, 3f, 4f)))
    assert(out.dims == Seq(1, 1, 4, 4))
    assert(out.data.toSeq == Seq(
      1f, 1f, 2f, 2f,
      1f, 1f, 2f, 2f,
      3f, 3f, 4f, 4f,
      3f, 3f, 4f, 4f))
  }

  test("Resize linear + pytorch_half_pixel (the torch bilinear export)") {
    val g = model(
      nodes = Seq(node("Resize", Seq("x", "", "sc"), Seq("y"), Seq(
        attrString("mode", "linear"),
        attrString("coordinate_transformation_mode",
          "pytorch_half_pixel")))),
      inits = Seq(tensor("sc", Seq(4), Seq(1f, 1f, 1f, 2f))),
      inputs = Seq("x"), outputs = Seq("y"))
    // torch F.interpolate([0,2], scale=2, bilinear, align_corners=False)
    // = [0, 0.5, 1.5, 2]
    val out = run1(g, Onnx.Tensor(Seq(1, 1, 1, 2), Array(0f, 2f)))
    assert(out.dims == Seq(1, 1, 1, 4))
    approx(out.data.toSeq, Seq(0.0, 0.5, 1.5, 2.0), 1e-6)
  }

  test("Resize linear + align_corners via SIZES input") {
    val g = model(
      nodes = Seq(node("Resize", Seq("x", "", "", "sz"), Seq("y"), Seq(
        attrString("mode", "linear"),
        attrString("coordinate_transformation_mode", "align_corners")))),
      inits = Seq(tensor("sz", Seq(4), Seq(1f, 1f, 1f, 5f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = run1(g, Onnx.Tensor(Seq(1, 1, 1, 3), Array(0f, 1f, 2f)))
    assert(out.dims == Seq(1, 1, 1, 5))
    approx(out.data.toSeq, Seq(0.0, 0.5, 1.0, 1.5, 2.0), 1e-6)
    // cubic must fail loudly
    val g2 = model(
      nodes = Seq(node("Resize", Seq("x", "", "", "sz"), Seq("y"), Seq(
        attrString("mode", "cubic")))),
      inits = Seq(tensor("sz", Seq(4), Seq(1f, 1f, 1f, 5f))),
      inputs = Seq("x"), outputs = Seq("y"))
    intercept[Exception] {
      run1(g2, Onnx.Tensor(Seq(1, 1, 1, 3), Array(0f, 1f, 2f)))
    }
  }
  /** F.unfold (im2col) EXACTLY as torch's symbolic_opset11 emits it
    * at static shapes before constant folding: Pad → live
    * Range/Unsqueeze/Add index builds → Gather(axis=2) →
    * Gather(axis=4) → Transpose(0,1,2,4,3,5) → Reshape — the
    * raft_large convex-upsampler prerequisite (VERDICT r7 #8). */
  test("im2col chain (torch unfold export): Pad + 2-D-index Gathers " +
      "match a hand-looped F.unfold") {
    // x: (1, 2, 3, 4), kernel 3x3, pad 1, stride 1 → (1, 18, 12)
    val h = 3; val w = 4; val c = 2
    val x = Onnx.Tensor(Seq(1, c, h, w),
      Array.tabulate(c * h * w)(i => ((i * 7) % 11 - 5).toFloat))
    val g = model(
      nodes = Seq(
        node("Pad", Seq("x", "pads"), Seq("xp")),
        node("Range", Seq("z", "k3", "one"), Seq("ra")),
        node("Unsqueeze", Seq("ra"), Seq("ra1"),
          Seq(attrInts("axes", Seq(1L)))),
        node("Range", Seq("z", "oh", "one"), Seq("rb")),
        node("Unsqueeze", Seq("rb"), Seq("rb1"),
          Seq(attrInts("axes", Seq(0L)))),
        node("Add", Seq("ra1", "rb1"), Seq("rows")),
        node("Range", Seq("z", "k3", "one"), Seq("ca")),
        node("Unsqueeze", Seq("ca"), Seq("ca1"),
          Seq(attrInts("axes", Seq(1L)))),
        node("Range", Seq("z", "ow", "one"), Seq("cb")),
        node("Unsqueeze", Seq("cb"), Seq("cb1"),
          Seq(attrInts("axes", Seq(0L)))),
        node("Add", Seq("ca1", "cb1"), Seq("cols")),
        node("Gather", Seq("xp", "rows"), Seq("g1"),
          Seq(attrInt("axis", 2L))),
        node("Gather", Seq("g1", "cols"), Seq("g2"),
          Seq(attrInt("axis", 4L))),
        node("Transpose", Seq("g2"), Seq("t"),
          Seq(attrInts("perm", Seq(0L, 1L, 2L, 4L, 3L, 5L)))),
        node("Reshape", Seq("t", "shp"), Seq("y"))),
      inits = Seq(
        tensor("pads", Seq(8), Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f)),
        tensor("z", Seq(1), Seq(0f)), tensor("one", Seq(1), Seq(1f)),
        tensor("k3", Seq(1), Seq(3f)),
        tensor("oh", Seq(1), Seq(h.toFloat)),
        tensor("ow", Seq(1), Seq(w.toFloat)),
        tensor("shp", Seq(3), Seq(1f, (c * 9).toFloat, (h * w).toFloat))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = run1(g, x)
    assert(out.dims == Seq(1, c * 9, h * w))
    // hand-looped F.unfold reference (zero padding)
    def xv(ci: Int, yi: Int, xi: Int): Float =
      if (yi < 0 || yi >= h || xi < 0 || xi >= w) 0f
      else x.data((ci * h + yi) * w + xi)
    for (ci <- 0 until c; ki <- 0 until 3; kj <- 0 until 3;
         oy <- 0 until h; ox <- 0 until w) {
      val row = ci * 9 + ki * 3 + kj
      val want = xv(ci, oy + ki - 1, ox + kj - 1)
      val got = out.data(row * (h * w) + oy * w + ox)
      assert(got == want, s"unfold[$row][${oy * w + ox}] = $got != $want")
    }
  }

  /** raft_large's CONVEX UPSAMPLER end to end, as a static-shape
    * opset-16 export emits it: mask Reshape to the 7-D view →
    * Softmax over the 9-patch axis (INTERIOR axis of a 7-D tensor) →
    * 8·flow through the im2col chain → Reshape → broadcast Mul →
    * ReduceSum(axis=2) → Transpose(0,1,4,2,5,3) → Reshape. Verified
    * against a direct hand-looped implementation of the torchvision
    * upsample_flow math. This closes the round-7 census residue: the
    * Softmax-over-unfold tail RUNS; only the genuine artifact export
    * remains environment-blocked. */
  test("raft_large convex upsampler subgraph: softmax(axis=2) over " +
      "unfold patches matches the hand-looped math") {
    val h = 2; val w = 3; val f = 8
    val flow = Onnx.Tensor(Seq(1, 2, h, w),
      Array.tabulate(2 * h * w)(i => ((i * 13) % 17 - 8) * 0.25f))
    val mask = Onnx.Tensor(Seq(1, 9 * f * f, h, w),
      Array.tabulate(9 * f * f * h * w)(i => ((i * 31) % 23 - 11) * 0.2f))
    val g = model(
      nodes = Seq(
        node("Reshape", Seq("mask", "mshp"), Seq("m7")),
        node("Softmax", Seq("m7"), Seq("sm"), Seq(attrInt("axis", 2L))),
        node("Mul", Seq("flow", "c8"), Seq("f8")),
        node("Pad", Seq("f8", "pads"), Seq("xp")),
        node("Range", Seq("z", "k3", "one"), Seq("ra")),
        node("Unsqueeze", Seq("ra"), Seq("ra1"),
          Seq(attrInts("axes", Seq(1L)))),
        node("Range", Seq("z", "oh", "one"), Seq("rb")),
        node("Unsqueeze", Seq("rb"), Seq("rb1"),
          Seq(attrInts("axes", Seq(0L)))),
        node("Add", Seq("ra1", "rb1"), Seq("rows")),
        node("Range", Seq("z", "k3", "one"), Seq("ca")),
        node("Unsqueeze", Seq("ca"), Seq("ca1"),
          Seq(attrInts("axes", Seq(1L)))),
        node("Range", Seq("z", "ow", "one"), Seq("cb")),
        node("Unsqueeze", Seq("cb"), Seq("cb1"),
          Seq(attrInts("axes", Seq(0L)))),
        node("Add", Seq("ca1", "cb1"), Seq("cols")),
        node("Gather", Seq("xp", "rows"), Seq("g1"),
          Seq(attrInt("axis", 2L))),
        node("Gather", Seq("g1", "cols"), Seq("g2"),
          Seq(attrInt("axis", 4L))),
        node("Transpose", Seq("g2"), Seq("tuf"),
          Seq(attrInts("perm", Seq(0L, 1L, 2L, 4L, 3L, 5L)))),
        node("Reshape", Seq("tuf", "ushp"), Seq("u7")),
        node("Mul", Seq("sm", "u7"), Seq("prod")),
        node("ReduceSum", Seq("prod"), Seq("s6"), Seq(
          attrInts("axes", Seq(2L)), attrInt("keepdims", 0L))),
        node("Transpose", Seq("s6"), Seq("t6"),
          Seq(attrInts("perm", Seq(0L, 1L, 4L, 2L, 5L, 3L)))),
        node("Reshape", Seq("t6", "oshp"), Seq("y"))),
      inits = Seq(
        tensor("mshp", Seq(7), Seq(1f, 1f, 9f, f.toFloat, f.toFloat,
          h.toFloat, w.toFloat)),
        tensor("c8", Seq(1), Seq(8f)),
        tensor("pads", Seq(8), Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f)),
        tensor("z", Seq(1), Seq(0f)), tensor("one", Seq(1), Seq(1f)),
        tensor("k3", Seq(1), Seq(3f)),
        tensor("oh", Seq(1), Seq(h.toFloat)),
        tensor("ow", Seq(1), Seq(w.toFloat)),
        tensor("ushp", Seq(7), Seq(1f, 2f, 9f, 1f, 1f, h.toFloat,
          w.toFloat)),
        tensor("oshp", Seq(4), Seq(1f, 2f, (f * h).toFloat,
          (f * w).toFloat))),
      inputs = Seq("flow", "mask"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g)
      .run(Map("flow" -> flow, "mask" -> mask))("y")
    assert(out.dims == Seq(1, 2, f * h, f * w))

    // hand-looped torchvision upsample_flow reference
    def fv(ci: Int, yi: Int, xi: Int): Double =
      if (yi < 0 || yi >= h || xi < 0 || xi >= w) 0.0
      else 8.0 * flow.data((ci * h + yi) * w + xi)
    def mv(k: Int, u: Int, v: Int, yi: Int, xi: Int): Double =
      mask.data((((k * f + u) * f + v) * h + yi) * w + xi)
    var worst = 0.0
    for (ci <- 0 until 2; yi <- 0 until h; xi <- 0 until w;
         u <- 0 until f; v <- 0 until f) {
      val mx = (0 until 9).map(k => mv(k, u, v, yi, xi)).max
      val es = (0 until 9).map(k => math.exp(mv(k, u, v, yi, xi) - mx))
      val z = es.sum
      val want = (0 until 9).map { k =>
        es(k) / z * fv(ci, yi + k / 3 - 1, xi + k % 3 - 1)
      }.sum
      val got = out.data(((ci * f * h + yi * f + u) * f * w) +
        xi * f + v)
      worst = math.max(worst, math.abs(got - want))
    }
    assert(worst < 1e-4, s"convex upsample max abs err $worst")
  }
}

