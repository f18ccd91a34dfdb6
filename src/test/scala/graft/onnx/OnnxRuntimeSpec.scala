package graft.onnx

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Test-side ONNX protobuf WRITER: emits real wire-format ModelProto
  * bytes (the same encoding torch.onnx.export produces) so the specs
  * exercise the parser on genuine serialized models rather than
  * hand-mocked structures. */
object TestOnnx {
  private def varint(out: ByteArrayOutputStream, v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
  }
  private def tag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    varint(out, (field.toLong << 3) | wire)
  private def lenDelim(out: ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    tag(out, field, 2); varint(out, body.length.toLong); out.write(body)
  }
  private def str(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    lenDelim(out, field, s.getBytes("UTF-8"))
  private def msg(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream(); f(out); out.toByteArray
  }

  /** TensorProto: dims packed (field 1), data_type=1 float (field 2),
    * values either packed float_data (field 4) or raw_data (field 9,
    * little-endian) — both encodings appear in the wild. */
  def tensor(name: String, dims: Seq[Int], data: Seq[Float],
      useRaw: Boolean = false): Array[Byte] = msg { out =>
    lenDelim(out, 1, msg(o => dims.foreach(d => varint(o, d.toLong))))
    tag(out, 2, 0); varint(out, 1L) // FLOAT
    if (useRaw) {
      val bb = ByteBuffer.allocate(data.length * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(bb.putFloat)
      lenDelim(out, 9, bb.array())
    } else {
      val bb = ByteBuffer.allocate(data.length * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(bb.putFloat)
      lenDelim(out, 4, bb.array()) // packed floats
    }
    str(out, 8, name)
  }

  def attrInt(name: String, v: Long): Array[Byte] = msg { out =>
    str(out, 1, name)
    tag(out, 3, 0); varint(out, v)
    tag(out, 20, 0); varint(out, 2L) // type = INT
  }

  def attrInts(name: String, vs: Seq[Long]): Array[Byte] = msg { out =>
    str(out, 1, name)
    vs.foreach { v => tag(out, 8, 0); varint(out, v) }
    tag(out, 20, 0); varint(out, 7L) // type = INTS
  }

  def attrString(name: String, v: String): Array[Byte] = msg { out =>
    str(out, 1, name)
    str(out, 4, v)
    tag(out, 20, 0); varint(out, 3L) // type = STRING
  }

  def attrFloat(name: String, v: Float): Array[Byte] = msg { out =>
    str(out, 1, name)
    tag(out, 2, 5)
    val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(v)
    // fixed32 little-endian bytes
    out.write(bb.array())
    tag(out, 20, 0); varint(out, 1L) // type = FLOAT
  }

  def node(op: String, ins: Seq[String], outs: Seq[String],
      attrs: Seq[Array[Byte]] = Nil): Array[Byte] = msg { out =>
    ins.foreach(i => str(out, 1, i))
    outs.foreach(o => str(out, 2, o))
    str(out, 4, op)
    attrs.foreach(a => lenDelim(out, 5, a))
  }

  private def valueInfo(name: String): Array[Byte] = msg(o => str(o, 1, name))

  def model(nodes: Seq[Array[Byte]], inits: Seq[Array[Byte]],
      inputs: Seq[String], outputs: Seq[String]): Array[Byte] = msg { out =>
    tag(out, 1, 0); varint(out, 7L) // ir_version
    str(out, 2, "graft-test")
    val graph = msg { g =>
      nodes.foreach(n => lenDelim(g, 1, n))
      str(g, 2, "mlp")
      inits.foreach(i => lenDelim(g, 5, i))
      inputs.foreach(i => lenDelim(g, 11, valueInfo(i)))
      outputs.foreach(o => lenDelim(g, 12, valueInfo(o)))
    }
    lenDelim(out, 7, graph)
    // opset_import { domain="", version=17 }
    lenDelim(out, 8, msg { o => str(o, 1, ""); tag(o, 2, 0); varint(o, 17L) })
  }

  /** Tiny REAL conv encoder `[N,3,s,s] → [N, e]` for composition
    * specs (video → frame → model paths). */
  def tinyCnnEncoder(e: Int, salt: Int): Array[Byte] = {
    def seeded(n: Int, s: Int): Seq[Float] =
      (0 until n).map(i =>
        (((i.toLong * i * 40503L + i * 2654435761L + s * 7919L) % 13)
          - 6) * 0.21f)
    model(
      nodes = Seq(
        node("Conv", Seq("x", "cw"), Seq("c"),
          Seq(attrInts("kernel_shape", Seq(1L, 1L)))),
        node("GlobalAveragePool", Seq("c"), Seq("p")),
        node("Flatten", Seq("p"), Seq("f")),
        node("Gemm", Seq("f", "w"), Seq("y"),
          Seq(attrInt("transB", 1L)))),
      inits = Seq(
        tensor("cw", Seq(2, 3, 1, 1), seeded(6, salt)),
        tensor("w", Seq(e, 2), seeded(2 * e, salt + 1))),
      inputs = Seq("x"), outputs = Seq("y"))
  }

  /** Tiny REAL single-head-attention cross-encoder
    * `ids [N,l] → score [N,1]`: token+position embedding →
    * self-attention (QKᵀ softmax V) → residual + Gelu → mean-pool →
    * sigmoid head. Exercises the batched-3D MatMul / Transpose /
    * Softmax tier on a genuine transformer block. */
  def tinyCrossEncoder(v: Int, e: Int, l: Int, salt: Int): Array[Byte] = {
    def seeded(n: Int, s: Int): Seq[Float] =
      (0 until n).map(i =>
        (((i.toLong * i * 40503L + i * 2654435761L + s * 7919L) % 13)
          - 6) * 0.21f)
    model(
      nodes = Seq(
        node("Gather", Seq("temb", "ids"), Seq("g")),
        node("Add", Seq("g", "pos"), Seq("h")),
        node("MatMul", Seq("h", "wq"), Seq("q")),
        node("MatMul", Seq("h", "wk"), Seq("k")),
        node("MatMul", Seq("h", "wv"), Seq("vv")),
        node("Transpose", Seq("k"), Seq("kt"),
          Seq(attrInts("perm", Seq(0L, 2L, 1L)))),
        node("MatMul", Seq("q", "kt"), Seq("att")),
        node("Softmax", Seq("att"), Seq("sm")),
        node("MatMul", Seq("sm", "vv"), Seq("ctx")),
        node("Add", Seq("ctx", "h"), Seq("res")),
        node("Gelu", Seq("res"), Seq("a")),
        node("Transpose", Seq("a"), Seq("at"),
          Seq(attrInts("perm", Seq(0L, 2L, 1L)))),
        node("ReduceMean", Seq("at"), Seq("pool"),
          Seq(attrInts("axes", Seq(-1L)), attrInt("keepdims", 0L))),
        node("MatMul", Seq("pool", "wout"), Seq("z")),
        node("Sigmoid", Seq("z"), Seq("y"))),
      inits = Seq(
        tensor("temb", Seq(v, e), seeded(v * e, salt)),
        tensor("pos", Seq(l, e), seeded(l * e, salt + 1)),
        tensor("wq", Seq(e, e), seeded(e * e, salt + 2)),
        tensor("wk", Seq(e, e), seeded(e * e, salt + 3)),
        tensor("wv", Seq(e, e), seeded(e * e, salt + 4)),
        tensor("wout", Seq(e, 1), seeded(e, salt + 5))),
      inputs = Seq("ids"), outputs = Seq("y"))
  }

  /** Realistic score-head TOPOLOGY at real input dims — the
    * bring-your-own-model throughput fixture (an NSFW/aesthetic-class
    * conv head: `[N, 3, 224, 224] → [N, 1]`): five strided 3×3 conv
    * blocks with BatchNorm + Relu (16→32→64→64→128 channels, each
    * halving the spatial grid), GlobalAveragePool, a Gemm score head,
    * Sigmoid. ~47M MACs/image. Every op is in the interpreter subset
    * — the shape a converted public score model lands in after the
    * tools/export_model.py recipe. */
  def realisticConvHead(salt: Int): Array[Byte] = {
    // PROPERLY MIXED seed (splitmix-style): the other fixtures'
    // quadratic-mod-13 pattern is distributionally biased (a
    // quadratic map mod a prime is non-uniform), which gives every
    // weight row a consistent non-zero mean — activations then
    // compound layer over layer until a ReLU goes entirely dead and
    // the head output turns input-INDEPENDENT. Small nets shrug that
    // off; a 5-deep stack does not.
    def seededAmp(n: Int, s: Int, amp: Float): Seq[Float] =
      (0 until n).map { i =>
        val h0 = i.toLong * 2654435761L + s.toLong * 7919L
        val h1 = (h0 ^ (h0 >>> 31)) * 0x9E3779B97F4A7C15L
        (Math.floorMod(h1 ^ (h1 >>> 33), 13L) - 6) * amp
      }
    def seeded(n: Int, s: Int): Seq[Float] = seededAmp(n, s, 0.047f)
    val chans = Seq(3, 16, 32, 64, 64, 128)
    val convs = (0 until 5).flatMap { i =>
      val (ci, co) = (chans(i), chans(i + 1))
      val in = if (i == 0) "x" else s"a${i - 1}"
      Seq(
        node("Conv", Seq(in, s"w$i", s"cb$i"), Seq(s"c$i"),
          Seq(attrInts("kernel_shape", Seq(3L, 3L)),
            attrInts("strides", Seq(2L, 2L)),
            attrInts("pads", Seq(1L, 1L, 1L, 1L)))),
        node("BatchNormalization",
          Seq(s"c$i", s"g$i", s"b$i", s"m$i", s"v$i"), Seq(s"n$i")),
        node("Relu", Seq(s"n$i"), Seq(s"a$i")))
    }
    val convInits = (0 until 5).flatMap { i =>
      val (ci, co) = (chans(i), chans(i + 1))
      // fan-in-scaled weights (the Kaiming discipline): unnormalized
      // seeds compounded ~8× per layer until one layer's ReLU went
      // entirely dead and the head output turned input-INDEPENDENT
      val wAmp = (0.4 / math.sqrt(ci * 9.0)).toFloat
      Seq(
        tensor(s"w$i", Seq(co, ci, 3, 3),
          seededAmp(co * ci * 9, salt + i, wAmp)),
        tensor(s"cb$i", Seq(co), seeded(co, salt + 10 + i)),
        tensor(s"g$i", Seq(co), Seq.fill(co)(1.01f)),
        tensor(s"b$i", Seq(co), seeded(co, salt + 20 + i)),
        tensor(s"m$i", Seq(co), seeded(co, salt + 30 + i)),
        tensor(s"v$i", Seq(co), Seq.fill(co)(0.9f)))
    }
    model(
      nodes = convs ++ Seq(
        node("GlobalAveragePool", Seq("a4"), Seq("p")),
        node("Flatten", Seq("p"), Seq("f")),
        node("Gemm", Seq("f", "wh", "bh"), Seq("z"),
          Seq(attrInt("transB", 1L))),
        node("Sigmoid", Seq("z"), Seq("y"))),
      inits = convInits ++ Seq(
        tensor("wh", Seq(1, 128), seeded(128, salt + 40)),
        tensor("bh", Seq(1), Seq(0.05f))),
      inputs = Seq("x"), outputs = Seq("y"))
  }

  /** Tiny REAL caption decoder `(img [1,e], ids [1,l]) → [1,l,v]`
    * logits: token embedding + position embedding + image
    * conditioning through Gelu into a vocab projection. */
  def tinyCaptionDecoder(v: Int, e: Int, l: Int, salt: Int): Array[Byte] = {
    def seeded(n: Int, s: Int): Seq[Float] =
      (0 until n).map(i =>
        (((i.toLong * i * 40503L + i * 2654435761L + s * 7919L) % 13)
          - 6) * 0.21f)
    model(
      nodes = Seq(
        node("Gather", Seq("temb", "ids"), Seq("g")),
        node("Add", Seq("g", "pos"), Seq("gp")),
        node("Unsqueeze", Seq("img", "one"), Seq("iu")),
        node("Add", Seq("gp", "iu"), Seq("h")),
        node("Gelu", Seq("h"), Seq("a")),
        node("MatMul", Seq("a", "wout"), Seq("y"))),
      inits = Seq(
        tensor("temb", Seq(v, e), seeded(v * e, salt)),
        tensor("pos", Seq(l, e), seeded(l * e, salt + 1)),
        tensor("one", Seq(1), Seq(1f)),
        tensor("wout", Seq(e, v), seeded(e * v, salt + 2))),
      inputs = Seq("img", "ids"), outputs = Seq("y"))
  }

  // deterministic 4→8→1 MLP weights shared by the specs
  val W1: Seq[Float] = (0 until 32).map(i => ((i % 7) - 3) * 0.25f)      // [8,4] (transB)
  val B1: Seq[Float] = (0 until 8).map(i => 0.1f * (i - 4))
  val W2: Seq[Float] = (0 until 8).map(i => if (i % 2 == 0) 0.4f else -0.3f) // [8,1]
  val B2: Seq[Float] = Seq(0.05f)

  /** x[N,4] → Gemm(W1ᵀ)+b1 → Relu → Gemm(W2)+b2 → Sigmoid → y.
    * W1 is stored [8,4] with transB=1 to exercise the transpose path;
    * W2 is serialized via raw_data to exercise that decode path. */
  def mlpBytes: Array[Byte] = model(
    nodes = Seq(
      node("Gemm", Seq("x", "w1", "b1"), Seq("h0"),
        Seq(attrInt("transB", 1L), attrFloat("alpha", 1f))),
      node("Relu", Seq("h0"), Seq("h1")),
      node("Gemm", Seq("h1", "w2", "b2"), Seq("z")),
      node("Sigmoid", Seq("z"), Seq("y"))),
    inits = Seq(
      tensor("w1", Seq(8, 4), W1),
      tensor("b1", Seq(8), B1),
      tensor("w2", Seq(8, 1), W2, useRaw = true),
      tensor("b2", Seq(1), B2)),
    inputs = Seq("x"), outputs = Seq("y"))

  /** Reference forward pass in double math for value assertions. */
  def expectedScore(x: Seq[Float]): Double = {
    val h = (0 until 8).map { i =>
      val z = (0 until 4).map(j => W1(i * 4 + j).toDouble * x(j)).sum +
        B1(i)
      math.max(z, 0.0)
    }
    val z = (0 until 8).map(i => h(i) * W2(i).toDouble).sum + B2.head
    1.0 / (1.0 + math.exp(-z))
  }
}

class OnnxRuntimeSpec extends AnyFunSuite {
  import TestOnnx._

  test("parser reads the serialized model structure") {
    val g = Onnx.parse(mlpBytes)
    assert(g.nodes.map(_.opType) == Seq("Gemm", "Relu", "Gemm", "Sigmoid"))
    assert(g.inputs == Seq("x"))
    assert(g.outputs == Seq("y"))
    assert(g.initializers.keySet == Set("w1", "b1", "w2", "b2"))
    assert(g.initializers("w1").dims == Seq(8, 4))
    // raw_data path decoded identically to float_data
    assert(g.initializers("w2").data.toSeq == W2)
  }

  test("forward pass matches the reference MLP within float tolerance") {
    val m = OnnxModel.parseBytes(mlpBytes)
    val xs = Seq(
      Seq(0.5f, 0.2f, 0.7f, 0.4f),
      Seq(0.0f, 0.0f, 0.0f, 0.0f),
      Seq(1.0f, -1.0f, 0.3f, 2.0f))
    val out = m.forward(Onnx.Tensor(Seq(3, 4), xs.flatten.toArray))
    assert(out.data.length == 3)
    xs.zip(out.data).foreach { case (x, got) =>
      val want = expectedScore(x)
      assert(math.abs(got - want) < 1e-5, s"x=$x got=$got want=$want")
    }
  }

  test("batch of one equals the same row inside a larger batch") {
    val m = OnnxModel.parseBytes(mlpBytes)
    val x = Seq(0.9f, 0.1f, 0.5f, 0.25f)
    val alone = m.forward(Onnx.Tensor(Seq(1, 4), x.toArray)).data(0)
    val batched = m.forward(Onnx.Tensor(Seq(2, 4),
      (x ++ Seq(0.1f, 0.2f, 0.3f, 0.4f)).toArray)).data(0)
    assert(alone == batched)
  }

  test("softmax + broadcast add graph") {
    val g = model(
      nodes = Seq(
        node("Add", Seq("x", "bias"), Seq("s")),
        node("Softmax", Seq("s"), Seq("p"))),
      inits = Seq(tensor("bias", Seq(3), Seq(0.5f, 0f, -0.5f))),
      inputs = Seq("x"), outputs = Seq("p"))
    val m = OnnxModel.parseBytes(g)
    val out = m.forward(Onnx.Tensor(Seq(2, 3),
      Array(1f, 2f, 3f, 10f, 10f, 10f)))
    // rows sum to 1, higher logit → higher mass
    val rows = out.data.grouped(3).toSeq
    rows.foreach(r => assert(math.abs(r.sum - 1f) < 1e-5))
    assert(rows(0)(2) > rows(0)(0))
    // second row: equal logits + bias tilts mass toward index 0
    assert(rows(1)(0) > rows(1)(2))
  }

  test("torch-style export: BatchNorm + Gelu + Dropout graph") {
    // x[N,3] → BatchNormalization → Gelu → Dropout → y — the shape a
    // torch MLP with nn.BatchNorm1d + nn.GELU exports in eval mode
    val g = model(
      nodes = Seq(
        node("BatchNormalization",
          Seq("x", "scale", "bias", "mean", "var"), Seq("b"),
          Seq(attrFloat("epsilon", 1e-5f))),
        node("Gelu", Seq("b"), Seq("h")),
        node("Dropout", Seq("h"), Seq("y"))),
      inits = Seq(
        tensor("scale", Seq(3), Seq(1.5f, 1.0f, 0.5f)),
        tensor("bias", Seq(3), Seq(0.1f, 0.0f, -0.1f)),
        tensor("mean", Seq(3), Seq(0.5f, 0.0f, -0.5f)),
        tensor("var", Seq(3), Seq(1.0f, 4.0f, 0.25f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val m = OnnxModel.parseBytes(g)
    val x = Seq(1.0f, 2.0f, 0.0f)
    val out = m.forward(Onnx.Tensor(Seq(1, 3), x.toArray))
    def gelu(v: Double): Double = { // via the same A&S erf approx class
      def erf(z: Double): Double = {
        val s = if (z < 0) -1.0 else 1.0
        val t = 1.0 / (1.0 + 0.3275911 * math.abs(z))
        s * (1.0 - (((((1.061405429 * t - 1.453152027) * t) +
          1.421413741) * t - 0.284496736) * t + 0.254829592) * t *
          math.exp(-z * z))
      }
      0.5 * v * (1.0 + erf(v / math.sqrt(2.0)))
    }
    val scale = Seq(1.5, 1.0, 0.5)
    val bias = Seq(0.1, 0.0, -0.1)
    val mean = Seq(0.5, 0.0, -0.5)
    val vari = Seq(1.0, 4.0, 0.25)
    (0 until 3).foreach { c =>
      val bn = (x(c) - mean(c)) / math.sqrt(vari(c) + 1e-5) *
        scale(c) + bias(c)
      val want = gelu(bn)
      assert(math.abs(out.data(c) - want) < 1e-5,
        s"c=$c got ${out.data(c)} want $want")
    }
  }

  test("Clip via inputs (opset 11+) and via attributes (opset 6)") {
    val byInputs = model(
      nodes = Seq(node("Clip", Seq("x", "lo", "hi"), Seq("y"))),
      inits = Seq(tensor("lo", Seq(1), Seq(0f)),
        tensor("hi", Seq(1), Seq(1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val got1 = OnnxModel.parseBytes(byInputs)
      .forward(Onnx.Tensor(Seq(1, 3), Array(-2f, 0.5f, 7f)))
    assert(got1.data.toSeq == Seq(0f, 0.5f, 1f))
    val byAttrs = model(
      nodes = Seq(node("Clip", Seq("x"), Seq("y"),
        Seq(attrFloat("min", -1f), attrFloat("max", 2f)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val got2 = OnnxModel.parseBytes(byAttrs)
      .forward(Onnx.Tensor(Seq(1, 3), Array(-2f, 0.5f, 7f)))
    assert(got2.data.toSeq == Seq(-1f, 0.5f, 2f))
  }

  test("ReduceMean over the last axis, keepdims on and off") {
    def g(keep: Long) = model(
      nodes = Seq(node("ReduceMean", Seq("x"), Seq("y"),
        Seq(attrInts("axes", Seq(-1L)), attrInt("keepdims", keep)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val x = Onnx.Tensor(Seq(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f))
    val kept = OnnxModel.parseBytes(g(1L)).forward(x)
    assert(kept.dims == Seq(2, 1) && kept.data.toSeq == Seq(2f, 5f))
    val dropped = OnnxModel.parseBytes(g(0L)).forward(x)
    assert(dropped.dims == Seq(2) && dropped.data.toSeq == Seq(2f, 5f))
  }

  test("Reduce with ABSENT axes reduces over ALL axes (ONNX default)") {
    // x.sum() exports as ReduceSum with no axes at all — the result
    // is a global scalar, not per-row values
    def g(op: String, keep: Long) = model(
      nodes = Seq(node(op, Seq("x"), Seq("y"),
        Seq(attrInt("keepdims", keep)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val x = Onnx.Tensor(Seq(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f))
    val s = OnnxModel.parseBytes(g("ReduceSum", 0L)).forward(x)
    assert(s.dims == Seq(1) && s.data.toSeq == Seq(21f))
    val m = OnnxModel.parseBytes(g("ReduceMean", 1L)).forward(x)
    assert(m.dims == Seq(1, 1) && m.data.toSeq == Seq(3.5f))
    val mx = OnnxModel.parseBytes(g("ReduceMax", 0L)).forward(x)
    assert(mx.data.toSeq == Seq(6f))
  }

  test("Conv: basic 2x2 kernel with bias, hand-computed") {
    val g = model(
      nodes = Seq(node("Conv", Seq("x", "w", "b"), Seq("y"),
        Seq(attrInts("kernel_shape", Seq(2L, 2L))))),
      inits = Seq(
        tensor("w", Seq(1, 1, 2, 2), Seq(1f, 2f, 3f, 4f)),
        tensor("b", Seq(1), Seq(0.5f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g).forward(
      Onnx.Tensor(Seq(1, 1, 3, 3), (1 to 9).map(_.toFloat).toArray))
    assert(out.dims == Seq(1, 1, 2, 2))
    assert(out.data.toSeq == Seq(37.5f, 47.5f, 67.5f, 77.5f))
  }

  test("Conv: stride 2 with pads, window clipping at edges") {
    val g = model(
      nodes = Seq(node("Conv", Seq("x", "w"), Seq("y"),
        Seq(attrInts("kernel_shape", Seq(2L, 2L)),
          attrInts("strides", Seq(2L, 2L)),
          attrInts("pads", Seq(1L, 1L, 1L, 1L))))),
      inits = Seq(tensor("w", Seq(1, 1, 2, 2), Seq(1f, 1f, 1f, 1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g).forward(
      Onnx.Tensor(Seq(1, 1, 3, 3), (1 to 9).map(_.toFloat).toArray))
    assert(out.dims == Seq(1, 1, 2, 2))
    assert(out.data.toSeq == Seq(1f, 5f, 11f, 28f))
  }

  test("Conv: groups route each output channel to its input slice") {
    val g = model(
      nodes = Seq(node("Conv", Seq("x", "w"), Seq("y"),
        Seq(attrInts("kernel_shape", Seq(1L, 1L)),
          attrInt("group", 2L)))),
      inits = Seq(tensor("w", Seq(2, 1, 1, 1), Seq(2f, 3f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g).forward(Onnx.Tensor(Seq(1, 2, 2, 2),
      (1 to 8).map(_.toFloat).toArray))
    assert(out.dims == Seq(1, 2, 2, 2))
    assert(out.data.toSeq ==
      Seq(2f, 4f, 6f, 8f, 15f, 18f, 21f, 24f))
  }

  test("MaxPool and AveragePool, including pad-exclusion semantics") {
    def g(op: String, extra: Seq[Array[Byte]] = Nil) = model(
      nodes = Seq(node(op, Seq("x"), Seq("y"),
        Seq(attrInts("kernel_shape", Seq(2L, 2L)),
          attrInts("strides", Seq(2L, 2L))) ++ extra)),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val x4 = Onnx.Tensor(Seq(1, 1, 4, 4), (1 to 16).map(_.toFloat).toArray)
    val mx = OnnxModel.parseBytes(g("MaxPool")).forward(x4)
    assert(mx.dims == Seq(1, 1, 2, 2) &&
      mx.data.toSeq == Seq(6f, 8f, 14f, 16f))
    val av = OnnxModel.parseBytes(g("AveragePool")).forward(x4)
    assert(av.data.toSeq == Seq(3.5f, 5.5f, 11.5f, 13.5f))
    // padded window: denominator excludes the pad by default,
    // includes it with count_include_pad=1
    val x2 = Onnx.Tensor(Seq(1, 1, 2, 2), Array(1f, 2f, 3f, 4f))
    def gp(inc: Long) = model(
      nodes = Seq(node("AveragePool", Seq("x"), Seq("y"),
        Seq(attrInts("kernel_shape", Seq(2L, 2L)),
          attrInts("strides", Seq(2L, 2L)),
          attrInts("pads", Seq(1L, 1L, 1L, 1L)),
          attrInt("count_include_pad", inc)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val excl = OnnxModel.parseBytes(gp(0L)).forward(x2)
    assert(excl.data.toSeq == Seq(1f, 2f, 3f, 4f))
    val incl = OnnxModel.parseBytes(gp(1L)).forward(x2)
    assert(incl.data.toSeq == Seq(0.25f, 0.5f, 0.75f, 1f))
  }

  test("GlobalAveragePool collapses H,W per channel") {
    val g = model(
      nodes = Seq(node("GlobalAveragePool", Seq("x"), Seq("y"))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g).forward(Onnx.Tensor(Seq(1, 2, 2, 2),
      (1 to 8).map(_.toFloat).toArray))
    assert(out.dims == Seq(1, 2, 1, 1))
    assert(out.data.toSeq == Seq(2.5f, 6.5f))
  }

  test("Transpose with an explicit 3-D perm and the 2-D default") {
    val g3 = model(
      nodes = Seq(node("Transpose", Seq("x"), Seq("y"),
        Seq(attrInts("perm", Seq(0L, 2L, 1L))))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val out3 = OnnxModel.parseBytes(g3).forward(
      Onnx.Tensor(Seq(1, 2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f)))
    assert(out3.dims == Seq(1, 3, 2))
    assert(out3.data.toSeq == Seq(1f, 4f, 2f, 5f, 3f, 6f))
    val g2 = model(
      nodes = Seq(node("Transpose", Seq("x"), Seq("y"))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val out2 = OnnxModel.parseBytes(g2).forward(
      Onnx.Tensor(Seq(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f)))
    assert(out2.dims == Seq(3, 2))
    assert(out2.data.toSeq == Seq(1f, 4f, 2f, 5f, 3f, 6f))
  }

  test("Concat along axis 1 and a negative axis") {
    def g(ax: Long) = model(
      nodes = Seq(node("Concat", Seq("a", "b"), Seq("y"),
        Seq(attrInt("axis", ax)))),
      inits = Seq(tensor("b", Seq(2, 1), Seq(9f, 10f))),
      inputs = Seq("a"), outputs = Seq("y"))
    val a = Onnx.Tensor(Seq(2, 2), Array(1f, 2f, 3f, 4f))
    val out = OnnxModel.parseBytes(g(1L)).forward(a)
    assert(out.dims == Seq(2, 3))
    assert(out.data.toSeq == Seq(1f, 2f, 9f, 3f, 4f, 10f))
    val outNeg = OnnxModel.parseBytes(g(-1L)).forward(a)
    assert(outNeg.data.toSeq == out.data.toSeq)
  }

  test("Conv auto_pad other than NOTSET is rejected loudly") {
    val g = model(
      nodes = Seq(node("Conv", Seq("x", "w"), Seq("y"),
        Seq(attrInts("kernel_shape", Seq(2L, 2L)),
          attrString("auto_pad", "SAME_UPPER")))),
      inits = Seq(tensor("w", Seq(1, 1, 2, 2), Seq(1f, 1f, 1f, 1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val e = intercept[IllegalArgumentException] {
      OnnxModel.parseBytes(g).forward(
        Onnx.Tensor(Seq(1, 1, 3, 3), (1 to 9).map(_.toFloat).toArray))
    }
    assert(e.getMessage.contains("auto_pad"))
  }

  test("end-to-end tiny CNN head: Conv→Relu→MaxPool→Flatten→Gemm→Sigmoid") {
    // 1×1×4×4 → Conv(2ch, 2×2, s1) → 2×3×3 → Relu → MaxPool(3×3) →
    // 2×1×1 → Flatten → [1,2] → Gemm → [1,1] → Sigmoid
    val convW = Seq(1f, 0f, 0f, 1f, /* ch1 */ 0f, 1f, -1f, 0f)
    val convB = Seq(0f, 2f)
    val fcW = Seq(0.1f, -0.2f) // [1,2] transB
    val fcB = Seq(0.05f)
    val g = model(
      nodes = Seq(
        node("Conv", Seq("x", "cw", "cb"), Seq("c"),
          Seq(attrInts("kernel_shape", Seq(2L, 2L)))),
        node("Relu", Seq("c"), Seq("r")),
        node("MaxPool", Seq("r"), Seq("p"),
          Seq(attrInts("kernel_shape", Seq(3L, 3L)))),
        node("Flatten", Seq("p"), Seq("f")),
        node("Gemm", Seq("f", "fw", "fb"), Seq("z"),
          Seq(attrInt("transB", 1L))),
        node("Sigmoid", Seq("z"), Seq("y"))),
      inits = Seq(
        tensor("cw", Seq(2, 1, 2, 2), convW),
        tensor("cb", Seq(2), convB),
        tensor("fw", Seq(1, 2), fcW),
        tensor("fb", Seq(1), fcB)),
      inputs = Seq("x"), outputs = Seq("y"))
    val xs = (1 to 16).map(_.toFloat).toArray
    val out = OnnxModel.parseBytes(g)
      .forward(Onnx.Tensor(Seq(1, 1, 4, 4), xs))
    // reference computation with plain loops
    def at(y: Int, x: Int) = xs(y * 4 + x)
    val conv = Array.ofDim[Float](2, 3, 3)
    for (ch <- 0 until 2; oy <- 0 until 3; ox <- 0 until 3) {
      var a = convB(ch)
      for (ky <- 0 until 2; kx <- 0 until 2)
        a += at(oy + ky, ox + kx) * convW(ch * 4 + ky * 2 + kx)
      conv(ch)(oy)(ox) = math.max(a, 0f)
    }
    val pooled = (0 until 2).map(ch => conv(ch).flatten.max)
    val z = fcB(0) + pooled(0) * fcW(0) + pooled(1) * fcW(1)
    val want = (1.0 / (1.0 + math.exp(-z.toDouble))).toFloat
    assert(out.dims == Seq(1, 1))
    assert(math.abs(out.data(0) - want) < 1e-6f)
  }

  test("batched MatMul: per-batch product, 2-D weight broadcast") {
    // [2,2,2] @ [2,2,2]: identity and doubling batches
    val g = model(
      nodes = Seq(node("MatMul", Seq("x", "w"), Seq("y"))),
      inits = Seq(tensor("w", Seq(2, 2, 2),
        Seq(1f, 0f, 0f, 1f, 2f, 0f, 0f, 2f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val x = Onnx.Tensor(Seq(2, 2, 2),
      Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f))
    val out = OnnxModel.parseBytes(g).forward(x)
    assert(out.dims == Seq(2, 2, 2))
    assert(out.data.toSeq ==
      Seq(1f, 2f, 3f, 4f, 10f, 12f, 14f, 16f))
    // [2,2,3] @ [3,2]: the projection-weight case (rhs broadcasts)
    val g2 = model(
      nodes = Seq(node("MatMul", Seq("x", "w"), Seq("y"))),
      inits = Seq(tensor("w", Seq(3, 2),
        Seq(1f, 0f, 0f, 1f, 1f, 1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val x2 = Onnx.Tensor(Seq(2, 2, 3), (1 to 12).map(_.toFloat).toArray)
    val out2 = OnnxModel.parseBytes(g2).forward(x2)
    assert(out2.dims == Seq(2, 2, 3 - 1))
    // row [a,b,c] -> [a+c, b+c]
    assert(out2.data.toSeq == Seq(4f, 5f, 10f, 11f, 16f, 17f, 22f, 23f))
  }

  test("elementwise broadcasting: trailing, middle-1, and scalar") {
    def g(op: String) = model(
      nodes = Seq(node(op, Seq("a", "b"), Seq("y"))),
      inits = Seq(tensor("b", Seq(2, 1, 3),
        Seq(10f, 20f, 30f, 40f, 50f, 60f))),
      inputs = Seq("a"), outputs = Seq("y"))
    // [2,2,3] + [2,1,3]: b's middle dim stretches
    val a = Onnx.Tensor(Seq(2, 2, 3), (1 to 12).map(_.toFloat).toArray)
    val out = OnnxModel.parseBytes(g("Add")).forward(a)
    assert(out.dims == Seq(2, 2, 3))
    assert(out.data.toSeq == Seq(11f, 22f, 33f, 14f, 25f, 36f,
      47f, 58f, 69f, 50f, 61f, 72f))
    // scalar rhs
    val gs = model(
      nodes = Seq(node("Mul", Seq("a", "s"), Seq("y"))),
      inits = Seq(tensor("s", Seq(1), Seq(0.5f))),
      inputs = Seq("a"), outputs = Seq("y"))
    val half = OnnxModel.parseBytes(gs).forward(a)
    assert(half.data.toSeq == a.data.map(_ * 0.5f).toSeq)
  }

  test("LayerNormalization: last-axis mean/var with scale and bias") {
    val g = model(
      nodes = Seq(node("LayerNormalization",
        Seq("x", "scale", "bias"), Seq("y"))),
      inits = Seq(
        tensor("scale", Seq(4), Seq(1f, 2f, 1f, 2f)),
        tensor("bias", Seq(4), Seq(0f, 0.5f, 0f, -0.5f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val x = Array(1f, 2f, 3f, 4f, -2f, 0f, 2f, 8f)
    val out = OnnxModel.parseBytes(g)
      .forward(Onnx.Tensor(Seq(2, 4), x))
    val scale = Seq(1f, 2f, 1f, 2f)
    val bias = Seq(0f, 0.5f, 0f, -0.5f)
    (0 until 2).foreach { r =>
      val row = x.slice(r * 4, r * 4 + 4).map(_.toDouble)
      val m = row.sum / 4
      val v = row.map(d => (d - m) * (d - m)).sum / 4
      (0 until 4).foreach { j =>
        val want = (row(j) - m) / math.sqrt(v + 1e-5) * scale(j) + bias(j)
        assert(math.abs(out.data(r * 4 + j) - want) < 1e-5,
          s"($r,$j): ${out.data(r * 4 + j)} vs $want")
      }
    }
  }

  test("Slice: input form with negative ends and an axes subset") {
    val g = model(
      nodes = Seq(node("Slice",
        Seq("x", "starts", "ends", "axes"), Seq("y"))),
      inits = Seq(
        tensor("starts", Seq(1), Seq(1f)),
        tensor("ends", Seq(1), Seq(-1f)),
        tensor("axes", Seq(1), Seq(1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val x = Onnx.Tensor(Seq(2, 4), (1 to 8).map(_.toFloat).toArray)
    val out = OnnxModel.parseBytes(g).forward(x)
    assert(out.dims == Seq(2, 2))
    assert(out.data.toSeq == Seq(2f, 3f, 6f, 7f)) // cols 1..-1
  }

  test("Split: equal parts along the last axis, both outputs live") {
    val g = model(
      nodes = Seq(
        node("Split", Seq("x"), Seq("a", "b"),
          Seq(attrInt("axis", -1L))),
        node("Sub", Seq("a", "b"), Seq("y"))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val x = Onnx.Tensor(Seq(2, 4), (1 to 8).map(_.toFloat).toArray)
    val out = OnnxModel.parseBytes(g).forward(x)
    assert(out.dims == Seq(2, 2))
    // [1,2]-[3,4] and [5,6]-[7,8]
    assert(out.data.toSeq == Seq(-2f, -2f, -2f, -2f))
  }

  test("Gather: axis-0 embedding lookup keeps index shape") {
    val g = model(
      nodes = Seq(node("Gather", Seq("emb", "x"), Seq("y"))),
      inits = Seq(tensor("emb", Seq(3, 2),
        Seq(10f, 11f, 20f, 21f, 30f, 31f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val idx = Onnx.Tensor(Seq(2, 2), Array(2f, 0f, 1f, 2f))
    val out = OnnxModel.parseBytes(g).forward(idx)
    assert(out.dims == Seq(2, 2, 2))
    assert(out.data.toSeq ==
      Seq(30f, 31f, 10f, 11f, 20f, 21f, 30f, 31f))
  }

  test("Unsqueeze then Squeeze round-trips shape and data") {
    val g = model(
      nodes = Seq(
        node("Unsqueeze", Seq("x"), Seq("u"),
          Seq(attrInts("axes", Seq(0L, 2L)))),
        node("Squeeze", Seq("u"), Seq("y"),
          Seq(attrInts("axes", Seq(0L))))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val x = Onnx.Tensor(Seq(2, 3), (1 to 6).map(_.toFloat).toArray)
    val out = OnnxModel.parseBytes(g).forward(x)
    assert(out.dims == Seq(2, 1, 3))
    assert(out.data.toSeq == x.data.toSeq)
  }

  test("end-to-end transformer encoder block matches a plain-Scala reference") {
    // x[1,S,D] → LayerNorm → qkv proj → Split → scaled-dot attention
    // (single head) → out proj → +residual — the torch
    // TransformerEncoderLayer core, S=2, D=4
    val S = 2
    val D = 4
    def seeded(n: Int, salt: Int): Seq[Float] =
      (0 until n).map(i => (((i * 2654435761L + salt * 40503L) % 17) - 8)
        * 0.07f)
    val wqkv = seeded(D * 3 * D, 1) // [D, 3D]
    val bqkv = seeded(3 * D, 2)
    val wout = seeded(D * D, 3)
    val lnS = (0 until D).map(i => 1f + 0.1f * i)
    val lnB = (0 until D).map(i => 0.05f * (i - 2))
    val g = model(
      nodes = Seq(
        node("LayerNormalization", Seq("x", "lns", "lnb"), Seq("h")),
        node("MatMul", Seq("h", "wqkv"), Seq("p0")),
        node("Add", Seq("p0", "bqkv"), Seq("p")),
        node("Split", Seq("p"), Seq("q", "k", "v"),
          Seq(attrInt("axis", -1L))),
        node("Transpose", Seq("k"), Seq("kt"),
          Seq(attrInts("perm", Seq(0L, 2L, 1L)))),
        node("MatMul", Seq("q", "kt"), Seq("sc0")),
        node("Mul", Seq("sc0", "inv"), Seq("sc")),
        node("Softmax", Seq("sc"), Seq("at")),
        node("MatMul", Seq("at", "v"), Seq("ctx")),
        node("MatMul", Seq("ctx", "wout"), Seq("proj")),
        node("Add", Seq("proj", "x"), Seq("y"))),
      inits = Seq(
        tensor("lns", Seq(D), lnS),
        tensor("lnb", Seq(D), lnB),
        tensor("wqkv", Seq(D, 3 * D), wqkv),
        tensor("bqkv", Seq(3 * D), bqkv),
        tensor("wout", Seq(D, D), wout),
        tensor("inv", Seq(1), Seq((1.0 / math.sqrt(D)).toFloat))),
      inputs = Seq("x"), outputs = Seq("y"))
    val xs = seeded(S * D, 9)
    val out = OnnxModel.parseBytes(g)
      .forward(Onnx.Tensor(Seq(1, S, D), xs.toArray))

    // ---- reference in plain doubles ----
    val x2 = Array.tabulate(S, D)((s, d) => xs(s * D + d).toDouble)
    val h = x2.map { row =>
      val m = row.sum / D
      val v = row.map(d => (d - m) * (d - m)).sum / D
      Array.tabulate(D)(j =>
        (row(j) - m) / math.sqrt(v + 1e-5f) * lnS(j) + lnB(j))
    }
    def mm(a: Array[Array[Double]], w: Seq[Float], n: Int) =
      a.map(row => Array.tabulate(n)(j =>
        row.indices.map(i => row(i) * w(i * n + j)).sum))
    val p = mm(h, wqkv, 3 * D).map(r =>
      r.zipWithIndex.map { case (v, i) => v + bqkv(i) })
    val q = p.map(_.slice(0, D))
    val k = p.map(_.slice(D, 2 * D))
    val v = p.map(_.slice(2 * D, 3 * D))
    val scores = Array.tabulate(S, S)((i, j) =>
      (0 until D).map(d => q(i)(d) * k(j)(d)).sum *
        (1.0 / math.sqrt(D)).toFloat)
    val att = scores.map { row =>
      val mx = row.max
      val es = row.map(s => math.exp(s - mx))
      es.map(_ / es.sum)
    }
    val ctx = Array.tabulate(S, D)((i, d) =>
      (0 until S).map(j => att(i)(j) * v(j)(d)).sum)
    val proj = mm(ctx, wout, D)
    (0 until S).foreach { s =>
      (0 until D).foreach { d =>
        val want = proj(s)(d) + x2(s)(d)
        val got = out.data(s * D + d)
        assert(math.abs(got - want) < 1e-4,
          s"($s,$d): $got vs $want")
      }
    }
  }

  test("empty input name = omitted optional input (torch clamp max-only)") {
    // Clip["x", "", "max"]: lower bound omitted positionally
    val g = model(
      nodes = Seq(node("Clip", Seq("x", "", "hi"), Seq("y"))),
      inits = Seq(tensor("hi", Seq(1), Seq(1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g)
      .forward(Onnx.Tensor(Seq(1, 3), Array(-5f, 0.5f, 5f)))
    assert(out.data.toSeq == Seq(-5f, 0.5f, 1f))
  }

  test("ReduceMean takes axes as a second input (opset 18 form)") {
    val g = model(
      nodes = Seq(node("ReduceMean", Seq("x", "ax"), Seq("y"),
        Seq(attrInt("keepdims", 0L)))),
      inits = Seq(tensor("ax", Seq(1), Seq(1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g)
      .forward(Onnx.Tensor(Seq(2, 2), Array(1f, 3f, 5f, 7f)))
    assert(out.dims == Seq(2) && out.data.toSeq == Seq(2f, 6f))
  }

  test("silently-unimplementable attributes are rejected loudly") {
    val pool = model(
      nodes = Seq(node("MaxPool", Seq("x"), Seq("y"),
        Seq(attrInts("kernel_shape", Seq(2L, 2L)),
          attrInt("ceil_mode", 1L)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val e1 = intercept[IllegalArgumentException] {
      OnnxModel.parseBytes(pool).forward(
        Onnx.Tensor(Seq(1, 1, 3, 3), (1 to 9).map(_.toFloat).toArray))
    }
    assert(e1.getMessage.contains("ceil_mode"))
    // Softmax on an INTERIOR axis is supported since round 8
    // (raft_large's convex upsampler needs axis=2 on a 7-D view) —
    // axis 0 of a 2-D tensor normalizes COLUMNS
    val sm = model(
      nodes = Seq(node("Softmax", Seq("x"), Seq("y"),
        Seq(attrInt("axis", 0L)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(sm).forward(
      Onnx.Tensor(Seq(2, 2), Array(1f, 2f, 3f, 4f)))
    val c = 1.0 / (1.0 + math.exp(2.0)) // e^1/(e^1+e^3) = e^2/(e^2+e^4)
    Seq(c, c, 1 - c, 1 - c).zip(out.data).foreach { case (w, g) =>
      assert(math.abs(g - w) < 1e-6, out.data.toSeq)
    }
    // a genuinely out-of-range axis still fails loudly
    val bad = model(
      nodes = Seq(node("Softmax", Seq("x"), Seq("y"),
        Seq(attrInt("axis", 5L)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val e2 = intercept[IllegalArgumentException] {
      OnnxModel.parseBytes(bad).forward(
        Onnx.Tensor(Seq(2, 2), Array(1f, 2f, 3f, 4f)))
    }
    assert(e2.getMessage.contains("axis"))
  }

  test("empty optional inputs: Gemm without C, Slice with omitted axes") {
    // Gemm["a","b",""] — bias omitted positionally: y = a·b
    val gemm = model(
      nodes = Seq(node("Gemm", Seq("a", "b", ""), Seq("y"))),
      inits = Seq(tensor("b", Seq(2, 2), Seq(1f, 0f, 0f, 2f))),
      inputs = Seq("a"), outputs = Seq("y"))
    val og = OnnxModel.parseBytes(gemm)
      .forward(Onnx.Tensor(Seq(1, 2), Array(3f, 4f)))
    assert(og.data.toSeq == Seq(3f, 8f))
    // Slice["x","starts","ends","","steps"] — axes omitted so steps
    // can be passed: starts/ends MUST still constrain (axis default
    // = positional), not silently no-op
    val slice = model(
      nodes = Seq(node("Slice",
        Seq("x", "starts", "ends", "", "steps"), Seq("y"))),
      inits = Seq(
        tensor("starts", Seq(1), Seq(1f)),
        tensor("ends", Seq(1), Seq(3f)),
        tensor("steps", Seq(1), Seq(1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val os = OnnxModel.parseBytes(slice)
      .forward(Onnx.Tensor(Seq(4), Array(10f, 11f, 12f, 13f)))
    assert(os.dims == Seq(2) && os.data.toSeq == Seq(11f, 12f))
  }

  test("unsupported op fails loudly with the op name") {
    val g = model(
      nodes = Seq(node("LSTM", Seq("x"), Seq("y"))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val m = OnnxModel.parseBytes(g)
    val e = intercept[UnsupportedOperationException] {
      m.forward(Onnx.Tensor(Seq(1, 4), Array(1f, 2f, 3f, 4f)))
    }
    assert(e.getMessage.contains("LSTM"))
  }

  test("GridSample: bilinear + nearest, zeros + border, align_corners") {
    // X = [1,1,2,2] = [[1,2],[3,4]]
    def sample(mode: String, pad: String, align: Long,
        grid: Seq[Float], gh: Int, gw: Int): Onnx.Tensor = {
      val g = model(
        nodes = Seq(node("GridSample", Seq("x", "grid"), Seq("y"),
          Seq(attrString("mode", mode), attrString("padding_mode", pad),
            attrInt("align_corners", align)))),
        inits = Seq(tensor("grid", Seq(1, gh, gw, 2), grid)),
        inputs = Seq("x"), outputs = Seq("y"))
      OnnxModel.parseBytes(g)
        .run(Map("x" -> Onnx.Tensor(Seq(1, 1, 2, 2),
          Array(1f, 2f, 3f, 4f))))("y")
    }
    // align_corners=1: corners map exactly onto corner pixels
    val corners = sample("linear", "zeros", 1L,
      Seq(-1f, -1f, 1f, -1f, -1f, 1f, 1f, 1f), 2, 2)
    assert(corners.dims == Seq(1, 1, 2, 2))
    assert(corners.data.toSeq == Seq(1f, 2f, 3f, 4f))
    // center of the image = mean of the four pixels
    val center = sample("linear", "zeros", 1L, Seq(0f, 0f), 1, 1)
    assert(math.abs(center.data(0) - 2.5f) < 1e-6)
    // align_corners=0: (-1,-1) lands at pixel (-0.5,-0.5); zeros
    // padding leaves one in-bounds tap (pixel (0,0)=1) at 0.5² weight
    val zeroPad = sample("linear", "zeros", 0L, Seq(-1f, -1f), 1, 1)
    assert(math.abs(zeroPad.data(0) - 0.25f) < 1e-6)
    // border padding clamps the out-of-bounds taps to pixel (0,0)
    val borderPad = sample("linear", "border", 0L, Seq(-1f, -1f), 1, 1)
    assert(math.abs(borderPad.data(0) - 1f) < 1e-6)
    // nearest snaps to the closest pixel
    val near = sample("nearest", "zeros", 1L, Seq(0.9f, 0.9f), 1, 1)
    assert(near.data(0) == 4f)
  }

  test("Reduce family: sum/max/min over the last axis, keepdims") {
    def reduce(op: String, keep: Long): Onnx.Tensor = {
      val g = model(
        nodes = Seq(node(op, Seq("x"), Seq("y"),
          Seq(attrInts("axes", Seq(-1L)), attrInt("keepdims", keep)))),
        inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
      OnnxModel.parseBytes(g).forward(
        Onnx.Tensor(Seq(2, 3), Array(1f, -2f, 3f, 4f, 0f, -5f)))
    }
    assert(reduce("ReduceSum", 1L).dims == Seq(2, 1))
    assert(reduce("ReduceSum", 0L).dims == Seq(2))
    assert(reduce("ReduceSum", 0L).data.toSeq == Seq(2f, -1f))
    assert(reduce("ReduceMax", 0L).data.toSeq == Seq(3f, 4f))
    assert(reduce("ReduceMin", 0L).data.toSeq == Seq(-2f, -5f))
  }

  test("elementwise tier 2: min/max, floor/ceil/round, trig") {
    def un(op: String, xs: Seq[Float]): Seq[Float] = {
      val g = model(nodes = Seq(node(op, Seq("x"), Seq("y"))),
        inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
      OnnxModel.parseBytes(g)
        .forward(Onnx.Tensor(Seq(xs.length), xs.toArray)).data.toSeq
    }
    assert(un("Floor", Seq(1.7f, -1.2f)) == Seq(1f, -2f))
    assert(un("Ceil", Seq(1.2f, -1.7f)) == Seq(2f, -1f))
    // ONNX Round is half-to-even
    assert(un("Round", Seq(0.5f, 1.5f, 2.5f, -0.5f)) ==
      Seq(0f, 2f, 2f, -0f))
    assert(math.abs(un("Sin", Seq(0f)).head) < 1e-7)
    assert(math.abs(un("Cos", Seq(0f)).head - 1f) < 1e-7)
    // binary Min/Max broadcast a scalar across the row
    val g = model(
      nodes = Seq(node("Max", Seq("x", "c"), Seq("y"))),
      inits = Seq(tensor("c", Seq(1), Seq(0f))),
      inputs = Seq("x"), outputs = Seq("y"))
    assert(OnnxModel.parseBytes(g).forward(
      Onnx.Tensor(Seq(3), Array(-1f, 0.5f, 2f))).data.toSeq ==
      Seq(0f, 0.5f, 2f))
  }

  test("comparisons, logic, and Where select with broadcasting") {
    // mask = x > 0; y = where(mask, x, -x)  — a float-mask abs()
    val g = model(
      nodes = Seq(
        node("Greater", Seq("x", "zero"), Seq("m")),
        node("Neg", Seq("x"), Seq("nx")),
        node("Where", Seq("m", "x", "nx"), Seq("y"))),
      inits = Seq(tensor("zero", Seq(1), Seq(0f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g).forward(
      Onnx.Tensor(Seq(4), Array(-3f, -0.5f, 0f, 2f)))
    assert(out.data.toSeq == Seq(3f, 0.5f, 0f, 2f))
    // Not / And / Or on 0-1 float masks
    def bin(op: String, a: Seq[Float], b: Seq[Float]): Seq[Float] = {
      val g2 = model(nodes = Seq(node(op, Seq("a", "b"), Seq("y"))),
        inits = Seq(tensor("b", Seq(b.length), b)),
        inputs = Seq("a"), outputs = Seq("y"))
      OnnxModel.parseBytes(g2)
        .forward(Onnx.Tensor(Seq(a.length), a.toArray)).data.toSeq
    }
    assert(bin("And", Seq(1f, 1f, 0f), Seq(1f, 0f, 1f)) == Seq(1f, 0f, 0f))
    assert(bin("Or", Seq(1f, 0f, 0f), Seq(0f, 0f, 1f)) == Seq(1f, 0f, 1f))
  }

  test("shape ops: Expand, Tile, Range, ConstantOfShape") {
    // Range(-1, 1.1, 2) = [-1, 1]; Expand a [2,1] column to [2,3]
    val g = model(
      nodes = Seq(
        node("Expand", Seq("x", "shape"), Seq("e")),
        node("Tile", Seq("e", "reps"), Seq("y"))),
      inits = Seq(
        tensor("shape", Seq(2), Seq(2f, 3f)),
        tensor("reps", Seq(2), Seq(2f, 1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val out = OnnxModel.parseBytes(g).forward(
      Onnx.Tensor(Seq(2, 1), Array(5f, 7f)))
    assert(out.dims == Seq(4, 3))
    assert(out.data.toSeq ==
      Seq(5f, 5f, 5f, 7f, 7f, 7f, 5f, 5f, 5f, 7f, 7f, 7f))
    val r = model(
      nodes = Seq(node("Range", Seq("s", "l", "d"), Seq("y"))),
      inits = Seq(tensor("s", Seq(1), Seq(-1f)),
        tensor("l", Seq(1), Seq(1.1f)), tensor("d", Seq(1), Seq(2f))),
      inputs = Seq("x"), outputs = Seq("y"))
    // (dummy input keeps the single-input forward contract)
    val rng = OnnxModel.parseBytes(r).run(
      Map("x" -> Onnx.Tensor(Seq(1), Array(0f))))("y")
    assert(rng.data.toSeq == Seq(-1f, 1f))
    val c = model(
      nodes = Seq(node("ConstantOfShape", Seq("sh"), Seq("y"))),
      inits = Seq(tensor("sh", Seq(2), Seq(2f, 2f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val cs = OnnxModel.parseBytes(c).run(
      Map("x" -> Onnx.Tensor(Seq(1), Array(0f))))("y")
    assert(cs.dims == Seq(2, 2) && cs.data.forall(_ == 0f))
  }

  test("RAFT-style warp subgraph: graph-computed identity grid + " +
      "GridSample reproduces the input") {
    // x-coords Range(-1,1.1,2) → [1,1,2,1] tiled down rows; y-coords
    // the same reshaped [1,2,1,1] tiled across cols; Concat(axis 3)
    // → identity grid [1,2,2,2]; GridSample(align_corners=1) == X
    val g = model(
      nodes = Seq(
        node("Range", Seq("s", "l", "d"), Seq("r")),
        node("Reshape", Seq("r", "shx"), Seq("rx")),
        node("Tile", Seq("rx", "tx"), Seq("gx")),
        node("Reshape", Seq("r", "shy"), Seq("ry")),
        node("Tile", Seq("ry", "ty"), Seq("gy")),
        node("Concat", Seq("gx", "gy"), Seq("grid"),
          Seq(attrInt("axis", 3L))),
        node("GridSample", Seq("x", "grid"), Seq("y"),
          Seq(attrString("mode", "linear"),
            attrInt("align_corners", 1L)))),
      inits = Seq(
        tensor("s", Seq(1), Seq(-1f)), tensor("l", Seq(1), Seq(1.1f)),
        tensor("d", Seq(1), Seq(2f)),
        tensor("shx", Seq(4), Seq(1f, 1f, 2f, 1f)),
        tensor("tx", Seq(4), Seq(1f, 2f, 1f, 1f)),
        tensor("shy", Seq(4), Seq(1f, 2f, 1f, 1f)),
        tensor("ty", Seq(4), Seq(1f, 1f, 2f, 1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val x = Onnx.Tensor(Seq(1, 1, 2, 2), Array(1f, 2f, 3f, 4f))
    val out = OnnxModel.parseBytes(g).forward(x)
    assert(out.dims == Seq(1, 1, 2, 2))
    assert(out.data.toSeq == x.data.toSeq,
      s"identity warp must reproduce the input, got ${out.data.toSeq}")
  }

  test("ArgMax: last-axis first-wins indices as floats, keepdims") {
    def g(keep: Long) = model(
      nodes = Seq(node("ArgMax", Seq("x"), Seq("y"),
        Seq(attrInt("axis", -1L), attrInt("keepdims", keep)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    // row 2 has a TIE at the max (first occurrence must win)
    val x = Onnx.Tensor(Seq(2, 3), Array(1f, 5f, 3f, 7f, 2f, 7f))
    val kept = OnnxModel.parseBytes(g(1L)).forward(x)
    assert(kept.dims == Seq(2, 1) && kept.data.toSeq == Seq(1f, 0f))
    val dropped = OnnxModel.parseBytes(g(0L)).forward(x)
    assert(dropped.dims == Seq(2) && dropped.data.toSeq == Seq(1f, 0f))
    // a non-last axis must fail loudly, not silently transpose
    val bad = model(
      nodes = Seq(node("ArgMax", Seq("x"), Seq("y"),
        Seq(attrInt("axis", 0L)))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val e = intercept[IllegalArgumentException] {
      OnnxModel.parseBytes(bad).forward(x)
    }
    assert(e.getMessage.contains("ArgMax"))
  }

  // shared GRU fixture: H=2, I=2, gate stacking [z, r, h], B=[Wb|Rb]
  private val gruW = tensor("W", Seq(1, 6, 2), Seq(
    0.1f, 0.2f, 0.3f, 0.4f, // W_z
    0.5f, -0.1f, 0.2f, 0.1f, // W_r
    0.3f, 0.2f, -0.2f, 0.4f)) // W_h
  private val gruR = tensor("R", Seq(1, 6, 2), Seq(
    0.1f, 0f, 0f, 0.1f, // R_z
    0.2f, 0f, 0f, 0.2f, // R_r
    0.3f, 0f, 0f, 0.3f)) // R_h
  private val gruB = tensor("B", Seq(1, 12), Seq(
    0.01f, 0.02f, 0.03f, 0.04f, 0.05f, 0.06f, // Wb z,r,h
    0f, 0f, 0f, 0f, 0.07f, 0.08f)) // Rb z,r,h

  test("GRU: hand-computed recurrence over two timesteps (Y and Y_h)") {
    // expected values from the spec equations computed independently:
    //   z=σ(Wz·x+Rz·h+Wbz+Rbz), r=σ(Wr·x+Rr·h+Wbr+Rbr),
    //   h̃=tanh(Wh·x+Rh·(r⊙h)+Wbh+Rbh), H=(1−z)⊙h̃+z⊙h, h0=0
    //   x1=[1,.5]  → H1=[0.2138625, 0.0518609]
    //   x2=[−.5,1] → H2=[0.2053418, 0.2756393]
    val g = model(
      nodes = Seq(node("GRU", Seq("x", "W", "R", "B"), Seq("Y", "Yh"),
        Seq(attrInt("hidden_size", 2L)))),
      inits = Seq(gruW, gruR, gruB),
      inputs = Seq("x"), outputs = Seq("Y", "Yh"))
    val x = Onnx.Tensor(Seq(2, 1, 2), Array(1f, 0.5f, -0.5f, 1f))
    val out = OnnxModel.parseBytes(g).run(Map("x" -> x))
    val y = out("Y")
    assert(y.dims == Seq(2, 1, 1, 2), y.dims)
    val want = Seq(0.2138625f, 0.0518609f, 0.2053418f, 0.2756393f)
    y.data.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 1e-6, s"Y ${y.data.toSeq} != $want")
    }
    val yh = out("Yh")
    assert(yh.dims == Seq(1, 1, 2))
    assert(math.abs(yh.data(0) - 0.2053418f) < 1e-6 &&
      math.abs(yh.data(1) - 0.2756393f) < 1e-6, yh.data.toSeq)
  }

  test("GRU: linear_before_reset=1 with initial_h over a 2-batch; " +
      "unsupported variants fail loudly") {
    // h̃=tanh(Wh·x+Wbh+r⊙(Rh·h+Rbh)) — the torch export form:
    //   b0: x=[1,−1],  h0=[.5,−.5] → [0.3928493, −0.5104004]
    //   b1: x=[0, 2],  h0=[.1, .2] → [0.2424163,  0.3613516]
    val g = model(
      nodes = Seq(node("GRU", Seq("x", "W", "R", "B", "", "h0"),
        Seq("", "Yh"), // Y omitted — positional optional output
        Seq(attrInt("hidden_size", 2L),
          attrInt("linear_before_reset", 1L)))),
      inits = Seq(gruW, gruR, gruB,
        tensor("h0", Seq(1, 2, 2), Seq(0.5f, -0.5f, 0.1f, 0.2f))),
      inputs = Seq("x"), outputs = Seq("Yh"))
    val x = Onnx.Tensor(Seq(1, 2, 2), Array(1f, -1f, 0f, 2f))
    val yh = OnnxModel.parseBytes(g).run(Map("x" -> x))("Yh")
    assert(yh.dims == Seq(1, 2, 2))
    val want = Seq(0.3928493f, -0.5104004f, 0.2424163f, 0.3613516f)
    yh.data.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 1e-6, s"Yh ${yh.data.toSeq} != $want")
    }
    // reverse/bidirectional is a loud unsupported, not a wrong answer
    val rev = model(
      nodes = Seq(node("GRU", Seq("x", "W", "R"), Seq("Y"),
        Seq(attrInt("hidden_size", 2L),
          attrString("direction", "reverse")))),
      inits = Seq(gruW, gruR), inputs = Seq("x"), outputs = Seq("Y"))
    val e = intercept[IllegalArgumentException] {
      OnnxModel.parseBytes(rev).run(Map("x" -> x))
    }
    assert(e.getMessage.contains("direction"), e.getMessage)
    // layout=1 ([B,T,I]) passes every dims check — rank 3 either
    // way — and would silently read wrong rows; must reject
    val bt = model(
      nodes = Seq(node("GRU", Seq("x", "W", "R"), Seq("Y"),
        Seq(attrInt("hidden_size", 2L), attrInt("layout", 1L)))),
      inits = Seq(gruW, gruR), inputs = Seq("x"), outputs = Seq("Y"))
    val e2 = intercept[IllegalArgumentException] {
      OnnxModel.parseBytes(bt).run(Map("x" -> x))
    }
    assert(e2.getMessage.contains("layout"), e2.getMessage)
    // and the op now counts as supported for flow-net gating
    assert(OnnxModel.SupportedOps.contains("GRU"))
  }

  test("unsupportedOps reports the complete missing-op list") {
    val g = model(
      nodes = Seq(
        node("Relu", Seq("x"), Seq("r")),
        node("ScatterND", Seq("r"), Seq("s")),
        node("LSTM", Seq("s"), Seq("y"))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    assert(OnnxModel.parseBytes(g).unsupportedOps == Seq("LSTM", "ScatterND"))
    // a fully-supported graph reports none
    val ok = model(
      nodes = Seq(node("Relu", Seq("x"), Seq("y"))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    assert(OnnxModel.parseBytes(ok).unsupportedOps.isEmpty)
  }

  test("Reshape with -1 and Constant nodes") {
    val g = model(
      nodes = Seq(
        node("Constant", Nil, Seq("shape"),
          Seq(msg2("value", tensor("", Seq(2), Seq(2f, -1f))))),
        node("Reshape", Seq("x", "shape"), Seq("y"))),
      inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
    val m = OnnxModel.parseBytes(g)
    val out = m.forward(Onnx.Tensor(Seq(1, 6), Array(1f, 2f, 3f, 4f, 5f, 6f)))
    assert(out.dims == Seq(2, 3))
  }

  /** AttributeProto with a tensor payload (field 5). */
  private def msg2(name: String, t: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val nb = name.getBytes("UTF-8")
    out.write(((1 << 3) | 2)); out.write(nb.length); out.write(nb)
    out.write(((5 << 3) | 2)); out.write(t.length); out.write(t)
    out.write((20 << 3) | 0); out.write(4) // type = TENSOR
    out.toByteArray
  }
}
