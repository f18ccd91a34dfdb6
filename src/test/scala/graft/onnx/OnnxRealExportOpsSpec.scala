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
}
