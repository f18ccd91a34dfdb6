package graft.onnx

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM ONNX model loader + interpreter for the
  * MLP-class graphs the image/text scoring filters ship (a few Gemm/
  * activation layers over a feature vector). This container has no
  * onnxruntime and the build adds no dependencies, so the engine
  * reads the (public, stable) ONNX protobuf wire format directly and
  * interprets the op subset those heads need — real model files run
  * unmodified; anything outside the subset fails loudly with the op
  * name so production can swap a full runtime behind the same
  * [[OnnxModel.run]] signature.
  *
  * Format references (all public): protobuf encoding spec
  * (developers.google.com/protocol-buffers/docs/encoding) and
  * onnx/onnx.proto3 field numbers — ModelProto.graph=7,
  * GraphProto.{node=1, initializer=5, input=11, output=12},
  * NodeProto.{input=1, output=2, op_type=4, attribute=5},
  * AttributeProto.{name=1, f=2, i=3, t=5, floats=7, ints=8},
  * TensorProto.{dims=1, data_type=2, float_data=4, name=8,
  * raw_data=9}.
  *
  * Reference scope: the DPF filters this backs load ONNX sessions in
  * aesthetic_improved_filter.py:22-71 and nsfw_filter.py:45-90.
  */
object Onnx {

  /** Row-major float tensor. */
  final case class Tensor(dims: Seq[Int], data: Array[Float]) {
    require(dims.product == data.length,
      s"tensor shape ${dims.mkString("x")} != ${data.length} values")
    def rows: Int = dims.head
    def cols: Int = if (dims.length < 2) 1 else dims.drop(1).product
  }

  sealed trait Attr
  final case class AttrFloat(v: Float) extends Attr
  final case class AttrInt(v: Long) extends Attr
  final case class AttrInts(v: Seq[Long]) extends Attr
  final case class AttrFloats(v: Seq[Float]) extends Attr
  final case class AttrTensor(v: Tensor) extends Attr
  final case class AttrString(v: String) extends Attr

  final case class Node(opType: String, inputs: Seq[String],
      outputs: Seq[String], attrs: Map[String, Attr])

  final case class Graph(nodes: Seq[Node],
      initializers: Map[String, Tensor],
      inputs: Seq[String], outputs: Seq[String])

  // ---------------- protobuf wire-format reader ----------------

  private final class Pb(val b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      var more = true
      while (more) {
        val x = b(pos) & 0xff
        pos += 1
        out |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      out
    }
    /** returns (fieldNumber, wireType) */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def readFixed32(): Int = {
      val v = ((b(pos) & 0xff)) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def readFloat(): Float = java.lang.Float.intBitsToFloat(readFixed32())
    /** returns a sub-reader over a length-delimited field */
    def sub(): Pb = {
      val len = readVarint().toInt
      val r = new Pb(b, pos, pos + len)
      pos += len
      r
    }
    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len)
      pos += len
      out
    }
    def readString(): String = new String(readBytes(), "UTF-8")
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 =>
        // two statements: `pos += readVarint()` reads the OLD pos
        // before readVarint advances it (left-to-right evaluation)
        val len = readVarint().toInt
        pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  // ---------------- ONNX message parsers ----------------

  /** Parse ModelProto bytes into its graph. */
  def parse(model: Array[Byte]): Graph = {
    val pb = new Pb(model, 0, model.length)
    var graph: Graph = null
    while (pb.hasMore) {
      val (f, w) = pb.readTag()
      if (f == 7 && w == 2) graph = parseGraph(pb.sub())
      else pb.skip(w)
    }
    require(graph != null, "no graph in ONNX model")
    graph
  }

  private def parseGraph(pb: Pb): Graph = {
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    while (pb.hasMore) {
      val (f, w) = pb.readTag()
      (f, w) match {
        case (1, 2) => nodes += parseNode(pb.sub())
        case (5, 2) =>
          val t = parseTensor(pb.sub())
          inits += t._1 -> t._2
        case (11, 2) => ins += parseValueInfoName(pb.sub())
        case (12, 2) => outs += parseValueInfoName(pb.sub())
        case _ => pb.skip(w)
      }
    }
    val initMap = inits.result()
    // graph inputs include initializers in many exporters; model
    // inputs = declared inputs minus initializer names
    Graph(nodes.result(), initMap,
      ins.result().filterNot(initMap.contains), outs.result())
  }

  private def parseValueInfoName(pb: Pb): String = {
    var name = ""
    while (pb.hasMore) {
      val (f, w) = pb.readTag()
      if (f == 1 && w == 2) name = pb.readString()
      else pb.skip(w)
    }
    name
  }

  private def parseNode(pb: Pb): Node = {
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    var op = ""
    val attrs = Map.newBuilder[String, Attr]
    while (pb.hasMore) {
      val (f, w) = pb.readTag()
      (f, w) match {
        case (1, 2) => ins += pb.readString()
        case (2, 2) => outs += pb.readString()
        case (4, 2) => op = pb.readString()
        case (5, 2) =>
          val a = parseAttr(pb.sub())
          if (a != null) attrs += a
        case _ => pb.skip(w)
      }
    }
    Node(op, ins.result(), outs.result(), attrs.result())
  }

  private def parseAttr(pb: Pb): (String, Attr) = {
    var name = ""
    var attr: Attr = null
    val ints = Seq.newBuilder[Long]
    val floats = Seq.newBuilder[Float]
    var sawInts = false
    var sawFloats = false
    while (pb.hasMore) {
      val (f, w) = pb.readTag()
      (f, w) match {
        case (1, 2) => name = pb.readString()
        case (2, 5) => attr = AttrFloat(pb.readFloat())
        case (3, 0) => attr = AttrInt(pb.readVarint())
        case (4, 2) => attr = AttrString(pb.readString())
        case (5, 2) => attr = AttrTensor(parseTensor(pb.sub())._2)
        case (7, 2) => // packed floats
          val s = pb.sub(); sawFloats = true
          while (s.hasMore) floats += s.readFloat()
        case (7, 5) => sawFloats = true; floats += pb.readFloat()
        case (8, 2) => // packed ints
          val s = pb.sub(); sawInts = true
          while (s.hasMore) ints += s.readVarint()
        case (8, 0) => sawInts = true; ints += pb.readVarint()
        case _ => pb.skip(w)
      }
    }
    if (attr == null && sawInts) attr = AttrInts(ints.result())
    if (attr == null && sawFloats) attr = AttrFloats(floats.result())
    if (attr == null) null else name -> attr
  }

  /** TensorProto → (name, tensor); FLOAT (1) via float_data or
    * raw_data (little-endian), INT64 (7) via int64_data or raw_data
    * (cast to float — shape/axis tensors). */
  private def parseTensor(pb: Pb): (String, Tensor) = {
    val dims = Seq.newBuilder[Int]
    var dataType = 1L
    var name = ""
    val floats = Seq.newBuilder[Float]
    var raw: Array[Byte] = null
    while (pb.hasMore) {
      val (f, w) = pb.readTag()
      (f, w) match {
        case (1, 2) =>
          val s = pb.sub()
          while (s.hasMore) dims += s.readVarint().toInt
        case (1, 0) => dims += pb.readVarint().toInt
        case (2, 0) => dataType = pb.readVarint()
        case (4, 2) =>
          val s = pb.sub()
          while (s.hasMore) floats += s.readFloat()
        case (4, 5) => floats += pb.readFloat()
        case (7, 2) =>
          val s = pb.sub()
          while (s.hasMore) floats += s.readVarint().toFloat
        case (7, 0) => floats += pb.readVarint().toFloat
        case (8, 2) => name = pb.readString()
        case (9, 2) => raw = pb.readBytes()
        case _ => pb.skip(w)
      }
    }
    var data = floats.result().toArray
    if (data.isEmpty && raw != null) {
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      data =
        if (dataType == 7L) { // INT64
          val out = new Array[Float](raw.length / 8)
          var i = 0
          while (i < out.length) { out(i) = bb.getLong(i * 8).toFloat; i += 1 }
          out
        } else {
          val out = new Array[Float](raw.length / 4)
          var i = 0
          while (i < out.length) { out(i) = bb.getFloat(i * 4); i += 1 }
          out
        }
    }
    val d = dims.result()
    name -> Tensor(if (d.isEmpty) Seq(data.length) else d, data)
  }
}

/** Interpreter over a parsed graph. ONNX requires nodes in
  * topological order, so evaluation is a single fold.
  *
  * The supported op subset is [[OnnxModel.SupportedOps]] (the ONE
  * inventory — [[unsupportedOps]] reports against it, keep it in
  * lockstep with `eval`): the MLP scoring tier, the small-CNN tier
  * (Conv with groups/strides/pads/dilations, pooling, Transpose,
  * Concat), the attention tier (batched N-D MatMul, full numpy
  * broadcasting on elementwise ops, LayerNormalization, Slice,
  * Split, Gather, Unsqueeze/Squeeze — a small transformer encoder
  * block runs end-to-end), and the warp/shape tier (GridSample,
  * Where, Expand, Tile, Range, ConstantOfShape, the comparison and
  * logic set as float 0/1 masks, Reduce{Mean,Sum,Max,Min}), and the
  * real-export residue a torch CNN/RAFT export carries (`Shape` —
  * emitted even under static input shapes unless constant folding
  * removed the chain, `InstanceNormalization`, constant-mode `Pad`,
  * `Resize` nearest/linear — the `F.interpolate` flow upsampler). */
final class OnnxModel(val graph: Onnx.Graph) {
  import Onnx._

  def run(inputs: Map[String, Tensor]): Map[String, Tensor] = {
    val env = scala.collection.mutable.HashMap[String, Tensor]()
    env ++= graph.initializers
    env ++= inputs
    graph.nodes.foreach { n =>
      // an empty input name is ONNX's "optional input omitted" marker
      // (e.g. torch.clamp(x, max=c) → Clip["x", "", "max"]): keep the
      // POSITION with an empty tensor so ins(i) indexing holds, and
      // let each op's data.nonEmpty/length checks treat it as absent
      val ins = n.inputs.map {
        case "" => Tensor(Seq(0), Array.empty[Float])
        case i => env.getOrElse(i,
          throw new IllegalArgumentException(
            s"${n.opType}: missing input $i — graph not topological?"))
      }
      if (n.opType == "Split") {
        n.outputs.zip(evalSplit(n, ins)).foreach {
          case (name, t) => env += name -> t
        }
      } else if (n.opType == "GRU") {
        // two positional outputs (Y, Y_h), each optional: an exporter
        // wanting only Y_h writes ["", "Y_h"] — skip the empty slots
        n.outputs.zip(evalGru(n, ins)).foreach {
          case ("", _) => ()
          case (name, t) => env += name -> t
        }
      } else env += n.outputs.head -> eval(n, ins)
    }
    graph.outputs.map(o => o -> env(o)).toMap
  }

  /** Single-output forward pass over a [N, D] batch. */
  def forward(batch: Tensor): Tensor = {
    require(graph.inputs.length == 1,
      s"expected one model input, got ${graph.inputs}")
    run(Map(graph.inputs.head -> batch))(graph.outputs.head)
  }

  /** Every op this graph uses that the interpreter does NOT cover —
    * callers (e.g. the flow filter) report the WHOLE list up front
    * instead of failing mid-forward on whichever op runs first. */
  def unsupportedOps: Seq[String] =
    graph.nodes.map(_.opType).distinct
      .filterNot(OnnxModel.SupportedOps).sorted

  private def attrF(n: Node, k: String, d: Float): Float =
    n.attrs.get(k) match {
      case Some(AttrFloat(v)) => v
      case Some(AttrInt(v)) => v.toFloat
      case _ => d
    }
  private def attrI(n: Node, k: String, d: Long): Long =
    n.attrs.get(k) match {
      case Some(AttrInt(v)) => v
      case _ => d
    }
  private def attrInts(n: Node, k: String, d: Seq[Long]): Seq[Long] =
    n.attrs.get(k) match {
      case Some(AttrInts(v)) => v
      case _ => d
    }
  private def attrS(n: Node, k: String, d: String): String =
    n.attrs.get(k) match {
      case Some(AttrString(v)) => v
      case _ => d
    }

  /** Shared single-axis reduction for the Reduce* family: axes
    * arrive as an attribute (opset <= 13) or as a second input
    * (opset 18+ torch exports); keepdims semantics fold into the
    * returned shape. Any single axis runs (interior axes take the
    * strided path — raft_large's convex upsampler sums over the
    * 9-patch axis of a 7-D tensor); absent axes means reduce ALL. */
  private def reduceLast(n: Node, ins: Seq[Tensor]): Tensor = {
    val x = ins(0)
    // ONNX: absent axes (with noop_with_empty_axes unset/0) means
    // reduce over ALL axes — modelled as one row spanning the whole
    // tensor; defaulting to the last axis here would silently return
    // per-row reductions where the export asked for a global one
    val axes =
      if (ins.length > 1 && ins(1).data.nonEmpty)
        Some(ins(1).data.map(_.toLong).toSeq)
      else n.attrs.get("axes") match {
        case Some(AttrInts(a)) => Some(a)
        case _ => None
      }
    val keepAll = attrI(n, "keepdims", 1L) == 1L
    axes match {
      case None =>
        require(attrI(n, "noop_with_empty_axes", 0L) == 0L,
          s"${n.opType} noop_with_empty_axes=1 with absent axes " +
            "unsupported")
        val whole = reduceRows(n, x.data, x.data.length)
        return Tensor(
          if (keepAll) x.dims.map(_ => 1) else Seq(1), whole)
      case Some(a) =>
        require(a.length == 1,
          s"${n.opType} supports a single axis (or all axes via " +
            s"absent axes) only, got $a")
    }
    val axRaw = axes.get.head.toInt
    val ax = if (axRaw < 0) axRaw + x.dims.length else axRaw
    require(ax >= 0 && ax < x.dims.length,
      s"${n.opType} axis $axRaw invalid for ${x.dims}")
    val outDims =
      if (keepAll) x.dims.updated(ax, 1)
      else x.dims.take(ax) ++ x.dims.drop(ax + 1)
    if (ax == x.dims.length - 1)
      return Tensor(outDims, reduceRows(n, x.data, x.dims.last))
    // interior axis (raft_large's ReduceSum over the 9 unfold
    // patches, axis 2 of a 7-D tensor): strided accumulate
    val d = x.dims(ax)
    require(d > 0, s"${n.opType} over an empty axis is undefined here")
    val inner = x.dims.drop(ax + 1).product
    val outer = x.dims.take(ax).product
    val out = new Array[Float](outer * inner)
    var o = 0
    while (o < outer) {
      var i = 0
      while (i < inner) {
        var acc = n.opType match {
          case "ReduceMax" => Double.NegativeInfinity
          case "ReduceMin" => Double.PositiveInfinity
          case _ => 0.0
        }
        var k = 0
        while (k < d) {
          val v = x.data((o * d + k) * inner + i)
          n.opType match {
            case "ReduceMax" => if (v > acc) acc = v
            case "ReduceMin" => if (v < acc) acc = v
            case _ => acc += v
          }
          k += 1
        }
        if (n.opType == "ReduceMean") acc /= d
        out(o * inner + i) = acc.toFloat
        i += 1
      }
      o += 1
    }
    Tensor(outDims, out)
  }

  /** Rows of length `c` folded to one value each per `n.opType`. */
  private def reduceRows(n: Node, data: Array[Float],
      c: Int): Array[Float] = {
    require(c > 0,
      s"${n.opType} over an empty tensor/axis is undefined here")
    val rows = data.length / c
    val out = new Array[Float](rows)
    var r = 0
    while (r < rows) {
      var acc = n.opType match {
        case "ReduceMax" => Double.NegativeInfinity
        case "ReduceMin" => Double.PositiveInfinity
        case _ => 0.0
      }
      var j = 0
      while (j < c) {
        val v = data(r * c + j)
        n.opType match {
          case "ReduceMax" => if (v > acc) acc = v
          case "ReduceMin" => if (v < acc) acc = v
          case _ => acc += v
        }
        j += 1
      }
      out(r) =
        if (n.opType == "ReduceMean") (acc / c).toFloat else acc.toFloat
      r += 1
    }
    out
  }

  /** ONNX Tile: repeat each axis `repeats(i)` times; output index
    * maps back by modulo on every axis. */
  private def tile(x: Tensor, repeats: Seq[Int]): Tensor = {
    require(repeats.length == x.dims.length,
      s"Tile repeats rank ${repeats.length} != input rank " +
        s"${x.dims.length}")
    require(repeats.forall(_ >= 1), s"Tile repeats must be >= 1: $repeats")
    val od = x.dims.zip(repeats).map { case (d, r) => d * r }
    val is = strides(x.dims)
    val os = strides(od)
    val out = new Array[Float](od.product)
    var i = 0
    while (i < out.length) {
      var rem = i
      var src = 0
      var d = 0
      while (d < od.length) {
        val idx = rem / os(d)
        rem %= os(d)
        src += (idx % x.dims(d)) * is(d)
        d += 1
      }
      out(i) = x.data(src)
      i += 1
    }
    Tensor(od, out)
  }

  /** row-major strides for a dim vector */
  private def strides(dims: Seq[Int]): Array[Int] = {
    val s = new Array[Int](dims.length)
    var acc = 1
    var i = dims.length - 1
    while (i >= 0) { s(i) = acc; acc *= dims(i); i -= 1 }
    s
  }

  /** Direct 2-D convolution over [N,C,H,W] with [M,C/g,kH,kW]
    * weights — explicit pads (t,l,b,r), strides, dilations, groups.
    * A direct loop, not im2col: the heads this backs are a few
    * thousand MACs per output, far below where blocking would pay. */
  private def conv2d(x: Tensor, w: Tensor, bias: Option[Tensor],
      group: Int, strides: Seq[Long], pads: Seq[Long],
      dils: Seq[Long]): Tensor = {
    require(x.dims.length == 4 && w.dims.length == 4,
      s"Conv needs [N,C,H,W] x [M,C/g,kH,kW], got ${x.dims} x ${w.dims}")
    val Seq(nN, c, h, wd) = x.dims.map(identity)
    val Seq(m, cg, kh, kw) = w.dims.map(identity)
    require(c == cg * group && m % group == 0,
      s"Conv group mismatch: C=$c, weight C/g=$cg, g=$group, M=$m")
    val sh = strides(0).toInt; val sw = strides(1).toInt
    val ph0 = pads(0).toInt; val pw0 = pads(1).toInt
    val ph1 = pads(2).toInt; val pw1 = pads(3).toInt
    val dh = dils(0).toInt; val dw = dils(1).toInt
    val oh = (h + ph0 + ph1 - dh * (kh - 1) - 1) / sh + 1
    val ow = (wd + pw0 + pw1 - dw * (kw - 1) - 1) / sw + 1
    require(oh > 0 && ow > 0, s"Conv output ${oh}x$ow empty")
    bias.foreach(b => require(b.data.length == m,
      s"Conv bias ${b.dims} != M=$m"))
    val mg = m / group
    val out = new Array[Float](nN * m * oh * ow)
    var n0 = 0
    while (n0 < nN) {
      var om = 0
      while (om < m) {
        val g = om / mg
        val b0 = bias.map(_.data(om)).getOrElse(0f)
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            var acc = b0.toDouble
            var ic = 0
            while (ic < cg) {
              val xc = g * cg + ic
              var ky = 0
              while (ky < kh) {
                val iy = oy * sh - ph0 + ky * dh
                if (iy >= 0 && iy < h) {
                  var kx = 0
                  while (kx < kw) {
                    val ix = ox * sw - pw0 + kx * dw
                    if (ix >= 0 && ix < wd) {
                      acc += x.data(((n0 * c + xc) * h + iy) * wd + ix) *
                        w.data(((om * cg + ic) * kh + ky) * kw + kx)
                    }
                    kx += 1
                  }
                }
                ky += 1
              }
              ic += 1
            }
            out(((n0 * m + om) * oh + oy) * ow + ox) = acc.toFloat
            ox += 1
          }
          oy += 1
        }
        om += 1
      }
      n0 += 1
    }
    Tensor(Seq(nN, m, oh, ow), out)
  }

  /** 2-D max/average pooling over [N,C,H,W]. Padding contributes
    * nothing to max; for average it is excluded unless
    * count_include_pad=1 (the ONNX default semantics). */
  private def pool2d(x: Tensor, kh: Int, kw: Int, strides: Seq[Long],
      pads: Seq[Long], isMax: Boolean, includePad: Boolean): Tensor = {
    require(x.dims.length == 4,
      s"pooling needs [N,C,H,W], got ${x.dims}")
    val Seq(nN, c, h, wd) = x.dims.map(identity)
    val sh = strides(0).toInt; val sw = strides(1).toInt
    val ph0 = pads(0).toInt; val pw0 = pads(1).toInt
    val ph1 = pads(2).toInt; val pw1 = pads(3).toInt
    val oh = (h + ph0 + ph1 - kh) / sh + 1
    val ow = (wd + pw0 + pw1 - kw) / sw + 1
    require(oh > 0 && ow > 0, s"pool output ${oh}x$ow empty")
    val out = new Array[Float](nN * c * oh * ow)
    var nc = 0
    while (nc < nN * c) {
      val in0 = nc * h * wd
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var mx = Float.NegativeInfinity
          var sum = 0.0
          var cnt = 0
          var ky = 0
          while (ky < kh) {
            val iy = oy * sh - ph0 + ky
            if (iy >= 0 && iy < h) {
              var kx = 0
              while (kx < kw) {
                val ix = ox * sw - pw0 + kx
                if (ix >= 0 && ix < wd) {
                  val v = x.data(in0 + iy * wd + ix)
                  if (v > mx) mx = v
                  sum += v
                  cnt += 1
                }
                kx += 1
              }
            }
            ky += 1
          }
          val denom = if (includePad) kh * kw else cnt
          out(nc * oh * ow + oy * ow + ox) =
            if (isMax) mx else (sum / denom).toFloat
          ox += 1
        }
        oy += 1
      }
      nc += 1
    }
    Tensor(Seq(nN, c, oh, ow), out)
  }

  private def eval(n: Node, ins: Seq[Tensor]): Tensor = n.opType match {
    case "Gemm" =>
      val alpha = attrF(n, "alpha", 1f)
      val beta = attrF(n, "beta", 1f)
      val a = if (attrI(n, "transA", 0) == 1) transpose(ins(0)) else ins(0)
      val b = if (attrI(n, "transB", 0) == 1) transpose(ins(1)) else ins(1)
      val y = matmul(a, b, alpha)
      if (ins.length > 2 && ins(2).data.nonEmpty)
        addBroadcast(y, ins(2), beta)
      else y
    case "MatMul" => matmulND(ins(0), ins(1))
    case "Add" => broadcastZip(ins(0), ins(1), _ + _)
    case "Sub" => broadcastZip(ins(0), ins(1), _ - _)
    case "Mul" => broadcastZip(ins(0), ins(1), _ * _)
    case "Div" => broadcastZip(ins(0), ins(1), _ / _)
    case "Relu" => map1(ins(0), v => math.max(v, 0f))
    case "LeakyRelu" =>
      val a = attrF(n, "alpha", 0.01f)
      map1(ins(0), v => if (v >= 0f) v else a * v)
    case "Sigmoid" =>
      map1(ins(0), v => (1.0 / (1.0 + math.exp(-v.toDouble))).toFloat)
    case "Tanh" => map1(ins(0), v => math.tanh(v.toDouble).toFloat)
    case "Softmax" =>
      val x = ins(0)
      // opset 13 default is -1; any axis runs (raft_large's convex
      // upsampler softmaxes the 9-patch axis of a 7-D mask view)
      val axRaw = attrI(n, "axis", -1L).toInt
      val ax = if (axRaw < 0) axRaw + x.dims.length else axRaw
      require(ax >= 0 && ax < x.dims.length,
        s"Softmax axis $axRaw invalid for ${x.dims}")
      if (ax == x.dims.length - 1) softmax(x)
      else {
        val d = x.dims(ax)
        val inner = x.dims.drop(ax + 1).product
        val outer = x.dims.take(ax).product
        val out = new Array[Float](x.data.length)
        var o = 0
        while (o < outer) {
          var i = 0
          while (i < inner) {
            var mx = Float.NegativeInfinity
            var k = 0
            while (k < d) {
              val v = x.data((o * d + k) * inner + i)
              if (v > mx) mx = v
              k += 1
            }
            var sum = 0.0
            k = 0
            while (k < d) {
              sum += math.exp((x.data((o * d + k) * inner + i) - mx)
                .toDouble)
              k += 1
            }
            k = 0
            while (k < d) {
              val idx = (o * d + k) * inner + i
              out(idx) = (math.exp((x.data(idx) - mx).toDouble) / sum)
                .toFloat
              k += 1
            }
            i += 1
          }
          o += 1
        }
        Tensor(x.dims, out)
      }
    case "Exp" => map1(ins(0), v => math.exp(v.toDouble).toFloat)
    case "Log" => map1(ins(0), v => math.log(v.toDouble).toFloat)
    case "Sqrt" => map1(ins(0), v => math.sqrt(v.toDouble).toFloat)
    case "Neg" => map1(ins(0), v => -v)
    case "Abs" => map1(ins(0), v => math.abs(v))
    case "Erf" => map1(ins(0), v => erf(v.toDouble).toFloat)
    case "Gelu" => // exact (erf) form, the torch.nn.GELU default
      map1(ins(0), v =>
        (0.5 * v * (1.0 + erf(v / math.sqrt(2.0)))).toFloat)
    case "Pow" => broadcastZip(ins(0), ins(1),
      (a, b) => math.pow(a.toDouble, b.toDouble).toFloat)
    case "Clip" =>
      // opset 11+: min/max as optional inputs; opset 6: attributes
      val lo = if (ins.length > 1 && ins(1).data.nonEmpty) ins(1).data(0)
        else attrF(n, "min", Float.NegativeInfinity)
      val hi = if (ins.length > 2 && ins(2).data.nonEmpty) ins(2).data(0)
        else attrF(n, "max", Float.PositiveInfinity)
      map1(ins(0), v => math.min(math.max(v, lo), hi))
    case "Dropout" | "Cast" => ins(0) // eval-mode no-op / float-only
    case "BatchNormalization" =>
      // eval mode: y = scale·(x−mean)/√(var+ε) + bias, per channel.
      // ONNX BN channels live at AXIS 1 for any rank — [N, C] (where
      // axis 1 is also the last axis, the MLP case) and [N, C, H, W]
      // (the conv case, channel stride = H·W) share this one loop.
      val eps = attrF(n, "epsilon", 1e-5f)
      val Seq(x, scale, bias, mean, variance) = ins.take(5)
      require(x.dims.length >= 2,
        s"BatchNormalization needs rank >= 2, got ${x.dims}")
      val c = x.dims(1)
      val inner = x.dims.drop(2).product
      require(scale.data.length == c && mean.data.length == c &&
        variance.data.length == c && bias.data.length == c,
        s"BatchNormalization param length != $c channels")
      val out = new Array[Float](x.data.length)
      var i = 0
      while (i < out.length) {
        val ch = (i / inner) % c
        out(i) = ((x.data(i) - mean.data(ch)) /
          math.sqrt((variance.data(ch) + eps).toDouble).toFloat) *
          scale.data(ch) + bias.data(ch)
        i += 1
      }
      Tensor(x.dims, out)
    case "ReduceMean" | "ReduceSum" | "ReduceMax" | "ReduceMin" =>
      reduceLast(n, ins)
    case "ArgMax" =>
      // the greedy-decode terminal op (logits → token id). Last axis
      // only; indices emit as floats (the interpreter is float-only —
      // Cast is a no-op, so index tensors flow like everything else).
      val x = ins(0)
      val ax = attrI(n, "axis", 0L)
      require(ax == -1L || ax == x.dims.length - 1,
        s"ArgMax axis $ax unsupported — last axis only")
      require(attrI(n, "select_last_index", 0L) == 0L,
        "ArgMax select_last_index=1 unsupported (first max wins)")
      val c = x.dims.last
      require(c > 0, "ArgMax over an empty axis is undefined")
      val rows = x.data.length / c
      val out = new Array[Float](rows)
      var r = 0
      while (r < rows) {
        var best = 0
        var bestV = x.data(r * c)
        var j = 1
        while (j < c) {
          val v = x.data(r * c + j)
          if (v > bestV) { bestV = v; best = j }
          j += 1
        }
        out(r) = best.toFloat
        r += 1
      }
      Tensor(
        if (attrI(n, "keepdims", 1L) == 1L) x.dims.init :+ 1
        else x.dims.init, out)
    case "Conv" =>
      require(attrS(n, "auto_pad", "NOTSET") == "NOTSET",
        "Conv auto_pad unsupported — export with explicit pads")
      conv2d(ins(0), ins(1),
        if (ins.length > 2 && ins(2).data.nonEmpty) Some(ins(2)) else None,
        attrI(n, "group", 1L).toInt,
        attrInts(n, "strides", Seq(1L, 1L)),
        attrInts(n, "pads", Seq(0L, 0L, 0L, 0L)),
        attrInts(n, "dilations", Seq(1L, 1L)))
    case "MaxPool" | "AveragePool" =>
      require(attrS(n, "auto_pad", "NOTSET") == "NOTSET",
        s"${n.opType} auto_pad unsupported — export with explicit pads")
      // deviating silently would change output shapes/values — reject
      require(attrI(n, "ceil_mode", 0L) == 0L,
        s"${n.opType} ceil_mode=1 unsupported — floor semantics only")
      require(attrInts(n, "dilations", Seq(1L, 1L)).forall(_ == 1L),
        s"${n.opType} dilations unsupported")
      val k = attrInts(n, "kernel_shape", Seq.empty)
      require(k.length == 2, s"${n.opType} needs 2-D kernel_shape, got $k")
      pool2d(ins(0), k(0).toInt, k(1).toInt,
        attrInts(n, "strides", Seq(1L, 1L)),
        attrInts(n, "pads", Seq(0L, 0L, 0L, 0L)),
        isMax = n.opType == "MaxPool",
        includePad = attrI(n, "count_include_pad", 0L) == 1L)
    case "GlobalAveragePool" =>
      val x = ins(0)
      require(x.dims.length == 4,
        s"GlobalAveragePool needs [N,C,H,W], got ${x.dims}")
      val Seq(nN, c, h, w) = x.dims.map(identity)
      val hw = h * w
      val out = new Array[Float](nN * c)
      var i = 0
      while (i < nN * c) {
        var s = 0.0
        var j = 0
        while (j < hw) { s += x.data(i * hw + j); j += 1 }
        out(i) = (s / hw).toFloat
        i += 1
      }
      Tensor(Seq(nN, c, 1, 1), out)
    case "Transpose" =>
      val x = ins(0)
      val perm = attrInts(n, "perm",
        x.dims.indices.reverse.map(_.toLong)).map(_.toInt)
      require(perm.sorted == x.dims.indices.toSeq,
        s"Transpose perm $perm invalid for ${x.dims}")
      if (x.dims.length == 2 && perm == Seq(1, 0)) transpose(x)
      else {
        val inStride = strides(x.dims)
        val outDims = perm.map(x.dims)
        val outStride = strides(outDims)
        val out = new Array[Float](x.data.length)
        var i = 0
        while (i < out.length) {
          // decompose output offset into out coords, map back via perm
          var rem = i
          var inOff = 0
          var d = 0
          while (d < perm.length) {
            val coord = rem / outStride(d)
            rem %= outStride(d)
            inOff += coord * inStride(perm(d))
            d += 1
          }
          out(i) = x.data(inOff)
          i += 1
        }
        Tensor(outDims, out)
      }
    case "Concat" =>
      val axRaw = attrI(n, "axis", 0L).toInt
      val nd = ins(0).dims.length
      val ax = if (axRaw < 0) axRaw + nd else axRaw
      require(ins.forall(t => t.dims.length == nd &&
        t.dims.zipWithIndex.forall { case (d, i) =>
          i == ax || d == ins(0).dims(i) }),
        s"Concat shapes disagree off axis $ax: ${ins.map(_.dims)}")
      val outDims = ins(0).dims.updated(ax, ins.map(_.dims(ax)).sum)
      val inner = ins(0).dims.drop(ax + 1).product
      val outer = ins(0).dims.take(ax).product
      val out = new Array[Float](outDims.product)
      var o = 0
      var b = 0
      while (b < outer) {
        var t = 0
        while (t < ins.length) {
          val chunk = ins(t).dims(ax) * inner
          System.arraycopy(ins(t).data, b * chunk, out, o, chunk)
          o += chunk
          t += 1
        }
        b += 1
      }
      Tensor(outDims, out)
    case "LayerNormalization" =>
      // normalize over dims [axis, rank): y = (x−μ)/√(σ²+ε)·scale+bias
      val x = ins(0)
      val rank = x.dims.length
      val axRaw = attrI(n, "axis", -1L).toInt
      val ax = if (axRaw < 0) axRaw + rank else axRaw
      require(ax >= 0 && ax < rank,
        s"LayerNormalization axis $axRaw invalid for ${x.dims}")
      val block = x.dims.drop(ax).product
      val scale = ins(1)
      val bias =
        if (ins.length > 2 && ins(2).data.nonEmpty) Some(ins(2)) else None
      require(scale.data.length == block &&
        bias.forall(_.data.length == block),
        s"LayerNormalization scale/bias != normalized block $block")
      val eps = attrF(n, "epsilon", 1e-5f)
      // hoisted out of the per-element loop: no Option dispatch in
      // the hot path (runs B·S·D times per encoder LayerNorm)
      val biasArr = bias.map(_.data).getOrElse(new Array[Float](block))
      val out = new Array[Float](x.data.length)
      var r = 0
      while (r < x.data.length / block) {
        val o = r * block
        var s = 0.0
        var j = 0
        while (j < block) { s += x.data(o + j); j += 1 }
        val mean = s / block
        var v = 0.0
        j = 0
        while (j < block) {
          val d = x.data(o + j) - mean
          v += d * d
          j += 1
        }
        val inv = 1.0 / math.sqrt(v / block + eps)
        j = 0
        while (j < block) {
          out(o + j) = (((x.data(o + j) - mean) * inv) *
            scale.data(j)).toFloat + biasArr(j)
          j += 1
        }
        r += 1
      }
      Tensor(x.dims, out)
    case "Slice" =>
      val x = ins(0)
      val rank = x.dims.length
      // opset 10+: starts/ends/axes/steps as inputs; opset 1: attrs
      // nonEmpty: an empty-string optional input arrives as an empty
      // tensor and must fall through to the attribute/default, not
      // read as "zero constraints"
      def longs(i: Int, attr: String): Option[Seq[Long]] =
        if (ins.length > i && ins(i).data.nonEmpty)
          Some(ins(i).data.map(_.toLong).toSeq)
        else n.attrs.get(attr) match {
          case Some(AttrInts(v)) => Some(v)
          case _ => None
        }
      val starts = longs(1, "starts").getOrElse(
        throw new IllegalArgumentException("Slice needs starts"))
      val ends = longs(2, "ends").getOrElse(
        throw new IllegalArgumentException("Slice needs ends"))
      val axes = longs(3, "axes")
        .getOrElse(starts.indices.map(_.toLong))
        .map(a => if (a < 0) (a + rank).toInt else a.toInt)
      val steps = longs(4, "steps")
        .getOrElse(Seq.fill(starts.length)(1L))
      require(steps.forall(_ == 1L),
        s"Slice steps other than 1 unsupported, got $steps")
      val lo = Array.fill(rank)(0)
      val hi = x.dims.toArray
      axes.zipWithIndex.foreach { case (a, i) =>
        val d = x.dims(a)
        def clamp(v: Long): Int =
          math.min(math.max(if (v < 0) v + d else v, 0), d).toInt
        lo(a) = clamp(starts(i))
        hi(a) = clamp(ends(i))
      }
      val outDims = (0 until rank).map(d => math.max(hi(d) - lo(d), 0))
      val out = new Array[Float](outDims.product)
      if (out.length > 0) {
        val inStride = strides(x.dims)
        val outStride = strides(outDims)
        var i = 0
        while (i < out.length) {
          var rem = i
          var src = 0
          var d = 0
          while (d < rank) {
            val c = rem / outStride(d)
            rem %= outStride(d)
            src += (c + lo(d)) * inStride(d)
            d += 1
          }
          out(i) = x.data(src)
          i += 1
        }
      }
      Tensor(outDims, out)
    case "Gather" =>
      val x = ins(0)
      val idx = ins(1)
      val rank = x.dims.length
      val axRaw = attrI(n, "axis", 0L).toInt
      val ax = if (axRaw < 0) axRaw + rank else axRaw
      require(ax >= 0 && ax < rank, s"Gather axis $axRaw for ${x.dims}")
      val d = x.dims(ax)
      val outer = x.dims.take(ax).product
      val inner = x.dims.drop(ax + 1).product
      val nIdx = idx.data.length
      val out = new Array[Float](outer * nIdx * inner)
      var o = 0
      while (o < outer) {
        var k = 0
        while (k < nIdx) {
          val raw = math.round(idx.data(k)).toInt
          val j = if (raw < 0) raw + d else raw
          require(j >= 0 && j < d, s"Gather index $raw out of [0,$d)")
          System.arraycopy(x.data, (o * d + j) * inner,
            out, (o * nIdx + k) * inner, inner)
          k += 1
        }
        o += 1
      }
      Tensor(x.dims.take(ax) ++ idx.dims ++ x.dims.drop(ax + 1), out)
    case "Unsqueeze" =>
      val x = ins(0)
      val axes = (if (ins.length > 1) ins(1).data.map(_.toLong).toSeq
        else attrInts(n, "axes", Seq.empty))
      require(axes.nonEmpty, "Unsqueeze needs axes")
      val outRank = x.dims.length + axes.length
      val norm = axes.map(a => if (a < 0) (a + outRank).toInt else a.toInt)
      val dims = scala.collection.mutable.ArrayBuffer(x.dims: _*)
      norm.sorted.foreach(a => dims.insert(a, 1))
      Tensor(dims.toSeq, x.data)
    case "Squeeze" =>
      val x = ins(0)
      val axes = (if (ins.length > 1) ins(1).data.map(_.toLong).toSeq
        else attrInts(n, "axes", Seq.empty))
        .map(a => if (a < 0) (a + x.dims.length).toInt else a.toInt)
      val dims =
        if (axes.isEmpty) x.dims.filter(_ != 1)
        else {
          axes.foreach(a => require(x.dims(a) == 1,
            s"Squeeze axis $a is ${x.dims(a)}, not 1"))
          x.dims.zipWithIndex.collect {
            case (v, i) if !axes.contains(i) => v
          }
        }
      Tensor(dims, x.data)
    case "Flatten" =>
      val t = ins(0)
      require(attrI(n, "axis", 1L) == 1L,
        "Flatten axis other than 1 unsupported")
      Tensor(Seq(t.rows, t.cols), t.data)
    case "Identity" => ins(0)
    case "Constant" => n.attrs("value") match {
      case AttrTensor(t) => t
      case a => throw new IllegalArgumentException(s"Constant attr $a")
    }
    case "Reshape" =>
      val t = ins(0)
      val want = ins(1).data.map(_.toLong)
      val known = want.filter(_ > 0).product
      val dims = want.map {
        case -1L => (t.data.length / math.max(known, 1L)).toInt
        case 0L => throw new IllegalArgumentException(
          "Reshape dim 0 (copy) unsupported")
        case d => d.toInt
      }
      Tensor(dims.toSeq, t.data)
    case "GridSample" =>
      gridSample(ins(0), ins(1),
        attrS(n, "mode", "linear"),
        attrS(n, "padding_mode", "zeros"),
        attrI(n, "align_corners", 0L) == 1L)
    // elementwise tier 2 — masks travel as float 0/1 (the interpreter
    // is float-only; Cast is already a no-op, so bool graphs flow)
    case "Min" => ins.reduce(broadcastZip(_, _, math.min))
    case "Max" => ins.reduce(broadcastZip(_, _, math.max))
    case "Floor" => map1(ins(0), v => math.floor(v).toFloat)
    case "Ceil" => map1(ins(0), v => math.ceil(v).toFloat)
    case "Round" => // ONNX rounds half to even (rint), not half up
      map1(ins(0), v => math.rint(v).toFloat)
    case "Sin" => map1(ins(0), v => math.sin(v).toFloat)
    case "Cos" => map1(ins(0), v => math.cos(v).toFloat)
    case "Greater" =>
      broadcastZip(ins(0), ins(1), (a, b) => if (a > b) 1f else 0f)
    case "GreaterOrEqual" =>
      broadcastZip(ins(0), ins(1), (a, b) => if (a >= b) 1f else 0f)
    case "Less" =>
      broadcastZip(ins(0), ins(1), (a, b) => if (a < b) 1f else 0f)
    case "LessOrEqual" =>
      broadcastZip(ins(0), ins(1), (a, b) => if (a <= b) 1f else 0f)
    case "Equal" =>
      broadcastZip(ins(0), ins(1), (a, b) => if (a == b) 1f else 0f)
    case "Not" => map1(ins(0), v => if (v == 0f) 1f else 0f)
    case "And" =>
      broadcastZip(ins(0), ins(1),
        (a, b) => if (a != 0f && b != 0f) 1f else 0f)
    case "Or" =>
      broadcastZip(ins(0), ins(1),
        (a, b) => if (a != 0f || b != 0f) 1f else 0f)
    case "Where" =>
      // select(cond, a, b) with full multidirectional broadcasting,
      // composed from two conditional zips + a sum (positions are
      // exclusive, so no NaN leaks through arithmetic)
      val selA = broadcastZip(ins(0), ins(1),
        (c, x) => if (c != 0f) x else 0f)
      val selB = broadcastZip(ins(0), ins(2),
        (c, x) => if (c == 0f) x else 0f)
      broadcastZip(selA, selB, _ + _)
    case "Expand" =>
      // broadcast input to broadcast(input.dims, shape) — zip against
      // a zero tensor of the target shape
      val want = ins(1).data.map(_.toInt).toSeq
      broadcastZip(ins(0),
        Tensor(want, new Array[Float](math.max(want.product, 0))),
        (x, _) => x)
    case "Tile" => tile(ins(0), ins(1).data.map(_.toInt).toSeq)
    case "Range" =>
      val (start, limit, delta) =
        (ins(0).data(0), ins(1).data(0), ins(2).data(0))
      require(delta != 0f, "Range delta must be nonzero")
      val count = math.max(
        math.ceil(((limit - start) / delta).toDouble).toInt, 0)
      Tensor(Seq(count),
        Array.tabulate(count)(i => start + i * delta))
    case "ConstantOfShape" =>
      val want = ins(0).data.map(_.toInt).toSeq
      val fill = n.attrs.get("value") match {
        case Some(AttrTensor(t)) if t.data.nonEmpty => t.data(0)
        case _ => 0f
      }
      Tensor(want, Array.fill(math.max(want.product, 0))(fill))
    case "Shape" =>
      // dims emit as float data (the interpreter is float-only; real
      // tensor dims sit far below 2^24, so the values are exact and
      // flow into Reshape/Expand/ConstantOfShape unchanged). torch
      // exports carry Shape→Gather→Concat chains even under static
      // input shapes unless constant folding removed them.
      val r = ins(0).dims.length
      def clampAx(v: Long): Int =
        math.max(0L, math.min(r.toLong, if (v < 0) v + r else v)).toInt
      val s = clampAx(attrI(n, "start", 0L))
      val e = clampAx(attrI(n, "end", r.toLong))
      val out = ins(0).dims.slice(s, math.max(s, e))
      Tensor(Seq(out.length), out.map(_.toFloat).toArray)
    case "InstanceNormalization" =>
      // y = scale·(x − mean_nc)/√(var_nc + ε) + bias — statistics per
      // (batch, channel) over the spatial dims (vs BatchNormalization's
      // stored population stats). The RAFT feature encoder's norm.
      val eps = attrF(n, "epsilon", 1e-5f)
      val Seq(x, scale, bias) = ins.take(3)
      require(x.dims.length >= 3,
        s"InstanceNormalization needs rank >= 3, got ${x.dims}")
      val c = x.dims(1)
      val inner = x.dims.drop(2).product
      require(scale.data.length == c && bias.data.length == c,
        s"InstanceNormalization param length != $c channels")
      require(inner > 0, "InstanceNormalization over empty spatial dims")
      val out = new Array[Float](x.data.length)
      val planes = x.dims(0) * c
      var p = 0
      while (p < planes) {
        val base = p * inner
        var s1 = 0.0; var s2 = 0.0
        var i = 0
        while (i < inner) {
          val v = x.data(base + i).toDouble
          s1 += v; s2 += v * v
          i += 1
        }
        val mean = s1 / inner
        // population variance, clamped: s2/n − mean² can round
        // fractionally negative on constant planes
        val vr = math.max(s2 / inner - mean * mean, 0.0)
        val inv = 1.0 / math.sqrt(vr + eps)
        val g = scale.data(p % c); val b = bias.data(p % c)
        i = 0
        while (i < inner) {
          out(base + i) =
            (((x.data(base + i) - mean) * inv) * g + b).toFloat
          i += 1
        }
        p += 1
      }
      Tensor(x.dims, out)
    case "Pad" =>
      // opset-11+ form: pads (and the optional constant) are INPUTS.
      // constant and replicate (edge) modes — replicate is what
      // RAFT's InputPadder exports (F.pad mode='replicate' pads the
      // frame to /8-divisible dims); reflect stays loudly out.
      val mode = attrS(n, "mode", "constant")
      require(mode == "constant" || mode == "edge",
        s"Pad: mode $mode unsupported (constant/edge only)")
      val x = ins(0)
      val r = x.dims.length
      val pv = ins(1).data.map(_.toInt)
      require(pv.length == 2 * r,
        s"Pad: pads length ${pv.length} != 2*rank $r")
      require(pv.forall(_ >= 0), "Pad: negative pads unsupported")
      val cval =
        if (ins.length > 3 && ins(3).data.nonEmpty)
          throw new UnsupportedOperationException(
            "Pad: axes input unsupported — pad every axis")
        else if (ins.length > 2 && ins(2).data.nonEmpty) ins(2).data(0)
        else 0f
      val outDims = x.dims.indices.map(a => x.dims(a) + pv(a) + pv(r + a))
      val inStr = x.dims.scanRight(1)(_ * _).tail
      val outStr = outDims.scanRight(1)(_ * _).tail
      val out = new Array[Float](outDims.product)
      if (mode == "constant") {
        java.util.Arrays.fill(out, cval)
        var i = 0
        while (i < x.data.length) {
          var o = 0
          var rem = i
          var a = 0
          while (a < r) {
            o += (rem / inStr(a) + pv(a)) * outStr(a)
            rem %= inStr(a)
            a += 1
          }
          out(o) = x.data(i)
          i += 1
        }
      } else {
        // edge/replicate: every output coordinate clamps into range —
        // one pass over the OUTPUT, gather from the clamped source
        var o = 0
        while (o < out.length) {
          var src = 0
          var rem = o
          var a = 0
          while (a < r) {
            val oc = rem / outStr(a)
            rem %= outStr(a)
            val ic = math.max(0, math.min(x.dims(a) - 1, oc - pv(a)))
            src += ic * inStr(a)
            a += 1
          }
          out(o) = x.data(src)
          o += 1
        }
      }
      Tensor(outDims, out)
    case "Resize" =>
      evalResize(n, ins)
    case op => throw new UnsupportedOperationException(
      s"ONNX op $op outside the MLP interpreter subset — plug a full " +
        "runtime behind OnnxModel.run for this model")
  }

  /** ONNX Resize over [N, C, H, W] spatial dims — the flow-field
    * upsampler (torch `F.interpolate` exports here: `bilinear` →
    * linear + pytorch_half_pixel / align_corners; `nearest` →
    * nearest + asymmetric + floor). Inputs per opset-13: (X, roi?,
    * scales?, sizes?) — exactly one of scales/sizes present; N and C
    * must not resize. Cubic, roi-based transforms, and the antialias
    * attr stay loudly unsupported. */
  private def evalResize(n: Node, ins: Seq[Tensor]): Tensor = {
    val x = ins(0)
    require(x.dims.length == 4, s"Resize: 4-D NCHW only, got ${x.dims}")
    require(attrI(n, "antialias", 0L) == 0L, "Resize: antialias unsupported")
    // silently ignoring these would compute per-row wrong answers —
    // the interpreter's contract is loud failure outside the subset
    require(attrI(n, "exclude_outside", 0L) == 0L,
      "Resize: exclude_outside unsupported")
    require(attrS(n, "keep_aspect_ratio_policy", "stretch") == "stretch",
      "Resize: keep_aspect_ratio_policy unsupported")
    require(!n.attrs.contains("axes"),
      "Resize: axes attribute unsupported — full-rank scales/sizes only")
    val mode = attrS(n, "mode", "nearest")
    require(mode == "nearest" || mode == "linear",
      s"Resize: mode $mode unsupported")
    val ct = attrS(n, "coordinate_transformation_mode", "half_pixel")
    require(Seq("half_pixel", "pytorch_half_pixel", "align_corners",
      "asymmetric").contains(ct), s"Resize: $ct unsupported")
    val nearestMode = attrS(n, "nearest_mode", "round_prefer_floor")
    val Seq(nb, c, h, w) = x.dims
    val scales = if (ins.length > 2 && ins(2).data.nonEmpty)
      Some(ins(2).data.map(_.toDouble)) else None
    val sizes = if (ins.length > 3 && ins(3).data.nonEmpty)
      Some(ins(3).data.map(_.toInt)) else None
    require(scales.isDefined != sizes.isDefined,
      "Resize: exactly one of scales/sizes must be present")
    val (oh, ow, sh, sw) = (scales, sizes) match {
      case (Some(s), _) =>
        require(s.length == 4 && s(0) == 1.0 && s(1) == 1.0,
          s"Resize: N/C axes must not resize (scales ${s.toSeq})")
        ((h * s(2)).floor.toInt, (w * s(3)).floor.toInt, s(2), s(3))
      case (_, Some(sz)) =>
        require(sz.length == 4 && sz(0) == nb && sz(1) == c,
          s"Resize: N/C axes must not resize (sizes ${sz.toSeq})")
        (sz(2), sz(3), sz(2).toDouble / h, sz(3).toDouble / w)
      case _ => throw new IllegalStateException("unreachable")
    }
    require(oh > 0 && ow > 0, s"Resize: empty output $oh x $ow")
    def src(out: Int, scale: Double, inLen: Int, outLen: Int): Double =
      ct match {
        case "half_pixel" => (out + 0.5) / scale - 0.5
        case "pytorch_half_pixel" =>
          if (outLen > 1) (out + 0.5) / scale - 0.5 else 0.0
        case "align_corners" =>
          if (outLen > 1) out.toDouble * (inLen - 1) / (outLen - 1) else 0.0
        case "asymmetric" => out / scale
      }
    def nearestIdx(v: Double, inLen: Int): Int = {
      val r = nearestMode match {
        case "floor" => math.floor(v)
        case "ceil" => math.ceil(v)
        case "round_prefer_floor" => math.ceil(v - 0.5)
        case "round_prefer_ceil" => math.floor(v + 0.5)
        case other => throw new UnsupportedOperationException(
          s"Resize: nearest_mode $other unsupported")
      }
      math.max(0, math.min(inLen - 1, r.toInt))
    }
    val out = new Array[Float](nb * c * oh * ow)
    var p = 0 // (n, c) plane
    val planes = nb * c
    while (p < planes) {
      val ib = p * h * w
      val ob = p * oh * ow
      var oy = 0
      while (oy < oh) {
        val sy = src(oy, sh, h, oh)
        var ox = 0
        while (ox < ow) {
          val sx = src(ox, sw, w, ow)
          val v: Float =
            if (mode == "nearest")
              x.data(ib + nearestIdx(sy, h) * w + nearestIdx(sx, w))
            else {
              // bilinear with edge clamping
              val y0 = math.max(0, math.min(h - 1, math.floor(sy).toInt))
              val x0 = math.max(0, math.min(w - 1, math.floor(sx).toInt))
              val y1 = math.min(h - 1, y0 + 1)
              val x1 = math.min(w - 1, x0 + 1)
              val fy = math.max(0.0, math.min(1.0, sy - y0))
              val fx = math.max(0.0, math.min(1.0, sx - x0))
              val v00 = x.data(ib + y0 * w + x0)
              val v01 = x.data(ib + y0 * w + x1)
              val v10 = x.data(ib + y1 * w + x0)
              val v11 = x.data(ib + y1 * w + x1)
              ((v00 * (1 - fx) + v01 * fx) * (1 - fy) +
                (v10 * (1 - fx) + v11 * fx) * fy).toFloat
            }
          out(ob + oy * ow + ox) = v
          ox += 1
        }
        oy += 1
      }
      p += 1
    }
    Tensor(Seq(nb, c, oh, ow), out)
  }

  /** ONNX GridSample (opset 16+) — the RAFT-class gather op
    * (correlation-volume lookup samples a feature map at flow-
    * displaced fractional coordinates): X [N, C, H, W] sampled at
    * grid [N, H', W', 2] (x, y) normalized coordinates in [-1, 1] →
    * [N, C, H', W']. Modes: bilinear ("linear"/"bilinear") and
    * "nearest"; padding zeros (out-of-bounds taps contribute 0) and
    * border (clamp). Bicubic/reflection stay loudly unsupported. */
  private def gridSample(x: Tensor, grid: Tensor, mode: String,
      padding: String, alignCorners: Boolean): Tensor = {
    require(x.dims.length == 4,
      s"GridSample input must be [N,C,H,W], got ${x.dims}")
    require(grid.dims.length == 4 && grid.dims(3) == 2,
      s"GridSample grid must be [N,H',W',2], got ${grid.dims}")
    require(grid.dims.head == x.dims.head,
      s"GridSample batch mismatch: ${x.dims} vs ${grid.dims}")
    val bilinear = mode == "linear" || mode == "bilinear"
    require(bilinear || mode == "nearest",
      s"GridSample mode $mode unsupported (linear/nearest only)")
    val border = padding == "border"
    require(border || padding == "zeros",
      s"GridSample padding_mode $padding unsupported (zeros/border)")
    val Seq(n, c, h, w) = x.dims
    val (oh, ow) = (grid.dims(1), grid.dims(2))
    // unnormalize [-1, 1] → pixel space per the align_corners rule
    @inline def unnorm(v: Float, size: Int): Double =
      if (alignCorners) (v + 1.0) / 2.0 * (size - 1)
      else ((v + 1.0) * size - 1.0) / 2.0
    @inline def tap(base: Int, ix: Int, iy: Int): Double =
      if (ix >= 0 && ix < w && iy >= 0 && iy < h)
        x.data(base + iy * w + ix)
      else if (border)
        x.data(base + math.min(math.max(iy, 0), h - 1) * w +
          math.min(math.max(ix, 0), w - 1))
      else 0.0
    val out = new Array[Float](n * c * oh * ow)
    var b = 0
    while (b < n) {
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          val g = (b * oh * ow + oy * ow + ox) * 2
          val px = unnorm(grid.data(g), w)
          val py = unnorm(grid.data(g + 1), h)
          var ch = 0
          while (ch < c) {
            val base = (b * c + ch) * h * w
            val v: Double =
              if (bilinear) {
                val x0 = math.floor(px).toInt
                val y0 = math.floor(py).toInt
                val fx = px - x0
                val fy = py - y0
                tap(base, x0, y0) * (1 - fx) * (1 - fy) +
                  tap(base, x0 + 1, y0) * fx * (1 - fy) +
                  tap(base, x0, y0 + 1) * (1 - fx) * fy +
                  tap(base, x0 + 1, y0 + 1) * fx * fy
              } else
                // nearest rounds half-to-even (rint), matching the
                // reference runtime — same convention as Round
                tap(base, math.rint(px).toInt, math.rint(py).toInt)
            out((b * c + ch) * oh * ow + oy * ow + ox) = v.toFloat
            ch += 1
          }
          ox += 1
        }
        oy += 1
      }
      b += 1
    }
    Tensor(Seq(n, c, oh, ow), out)
  }

  /** Abramowitz & Stegun 7.1.26 rational approximation (|ε| < 1.5e-7
    * — far under float32 resolution over the useful range). */
  private def erf(x: Double): Double = {
    val s = if (x < 0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * ax)
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) +
      1.421413741) * t - 0.284496736) * t + 0.254829592) * t *
      math.exp(-ax * ax)
    s * y
  }

  private def transpose(t: Tensor): Tensor = {
    require(t.dims.length == 2, s"transpose needs 2-D, got ${t.dims}")
    val (r, c) = (t.dims(0), t.dims(1))
    val out = new Array[Float](t.data.length)
    var i = 0
    while (i < r) {
      var j = 0
      while (j < c) { out(j * r + i) = t.data(i * c + j); j += 1 }
      i += 1
    }
    Tensor(Seq(c, r), out)
  }

  private def matmul(a: Tensor, b: Tensor, alpha: Float): Tensor = {
    require(a.dims.length == 2 && b.dims.length == 2,
      s"matmul needs 2-D, got ${a.dims} x ${b.dims}")
    val (m, k) = (a.dims(0), a.dims(1))
    val (k2, n) = (b.dims(0), b.dims(1))
    require(k == k2, s"matmul shape mismatch: ${a.dims} x ${b.dims}")
    val out = new Array[Float](m * n)
    var i = 0
    while (i < m) {
      var p = 0
      while (p < k) {
        val av = a.data(i * k + p) * alpha
        if (av != 0f) {
          var j = 0
          while (j < n) {
            out(i * n + j) += av * b.data(p * n + j)
            j += 1
          }
        }
        p += 1
      }
      i += 1
    }
    Tensor(Seq(m, n), out)
  }

  /** y + beta·c where c is same-shape or a [cols] row vector
    * (unidirectional broadcast — the Gemm bias case). */
  private def addBroadcast(y: Tensor, c: Tensor, beta: Float): Tensor = {
    val out = new Array[Float](y.data.length)
    val cols = y.cols
    if (c.data.length == y.data.length) {
      var i = 0
      while (i < out.length) { out(i) = y.data(i) + beta * c.data(i); i += 1 }
    } else {
      require(c.data.length == cols,
        s"bias ${c.dims} does not broadcast to ${y.dims}")
      var i = 0
      while (i < out.length) {
        out(i) = y.data(i) + beta * c.data(i % cols)
        i += 1
      }
    }
    Tensor(y.dims, out)
  }

  /** numpy-style multidirectional broadcasting for the elementwise
    * ops: shapes align from the right; size-1 dims stretch (stride 0
    * on the stretched side). */
  private def broadcastZip(a: Tensor, b: Tensor,
      f: (Float, Float) => Float): Tensor = {
    if (a.dims == b.dims) {
      val out = new Array[Float](a.data.length)
      var i = 0
      while (i < out.length) { out(i) = f(a.data(i), b.data(i)); i += 1 }
      return Tensor(a.dims, out)
    }
    val rank = math.max(a.dims.length, b.dims.length)
    val ad = Seq.fill(rank - a.dims.length)(1) ++ a.dims
    val bd = Seq.fill(rank - b.dims.length)(1) ++ b.dims
    val od = ad.zip(bd).map { case (x, y) =>
      require(x == y || x == 1 || y == 1,
        s"shapes ${a.dims} and ${b.dims} do not broadcast")
      math.max(x, y)
    }
    val as = strides(ad).zip(ad).map { case (s, d) => if (d == 1) 0 else s }
    val bs = strides(bd).zip(bd).map { case (s, d) => if (d == 1) 0 else s }
    val os = strides(od)
    val out = new Array[Float](od.product)
    var i = 0
    while (i < out.length) {
      var rem = i
      var ai = 0
      var bi = 0
      var d = 0
      while (d < rank) {
        val c = rem / os(d)
        rem %= os(d)
        ai += c * as(d)
        bi += c * bs(d)
        d += 1
      }
      out(i) = f(a.data(ai), b.data(bi))
      i += 1
    }
    Tensor(od, out)
  }

  /** N-D batched matmul with numpy semantics: leading (batch) dims
    * broadcast, the trailing two multiply. A 2-D side broadcasts
    * across every batch (the projection-weight case). */
  private def matmulND(a: Tensor, b: Tensor): Tensor = {
    if (a.dims.length == 2 && b.dims.length == 2) return matmul(a, b, 1f)
    require(a.dims.length >= 2 && b.dims.length >= 2,
      s"MatMul needs rank >= 2, got ${a.dims} x ${b.dims}")
    val (m, k) = (a.dims(a.dims.length - 2), a.dims.last)
    val (k2, nc) = (b.dims(b.dims.length - 2), b.dims.last)
    require(k == k2, s"MatMul shape mismatch: ${a.dims} x ${b.dims}")
    val abatch = a.dims.dropRight(2)
    val bbatch = b.dims.dropRight(2)
    val rank = math.max(abatch.length, bbatch.length)
    val ad = Seq.fill(rank - abatch.length)(1) ++ abatch
    val bd = Seq.fill(rank - bbatch.length)(1) ++ bbatch
    val od = ad.zip(bd).map { case (x, y) =>
      require(x == y || x == 1 || y == 1,
        s"MatMul batch dims ${a.dims} x ${b.dims} do not broadcast")
      math.max(x, y)
    }
    val aStep = m * k
    val bStep = k2 * nc
    val as = strides(ad).zip(ad).map { case (s, d) =>
      if (d == 1) 0 else s * aStep }
    val bs = strides(bd).zip(bd).map { case (s, d) =>
      if (d == 1) 0 else s * bStep }
    val os = strides(od)
    val nBatch = od.product
    val out = new Array[Float](nBatch * m * nc)
    var bi = 0
    while (bi < nBatch) {
      var rem = bi
      var ao = 0
      var bo = 0
      var d = 0
      while (d < rank) {
        val c = rem / os(d)
        rem %= os(d)
        ao += c * as(d)
        bo += c * bs(d)
        d += 1
      }
      val oo = bi * m * nc
      var i = 0
      while (i < m) {
        var p = 0
        while (p < k) {
          val av = a.data(ao + i * k + p)
          if (av != 0f) {
            var j = 0
            while (j < nc) {
              out(oo + i * nc + j) += av * b.data(bo + p * nc + j)
              j += 1
            }
          }
          p += 1
        }
        i += 1
      }
      bi += 1
    }
    Tensor(od ++ Seq(m, nc), out)
  }

  /** Single-direction GRU — the recurrent tier a RAFT-class flow
    * export needs (DPF/filters/videos/raft_filter.py:73 vendors
    * raft_core/, whose update block is a GRU). ONNX GRU semantics at
    * the opset-14 defaults:
    *
    *   z_t = σ(X_t·W_z' + H_{t−1}·R_z' + Wb_z + Rb_z)
    *   r_t = σ(X_t·W_r' + H_{t−1}·R_r' + Wb_r + Rb_r)
    *   h̃_t = tanh(X_t·W_h' + (r_t ⊙ H_{t−1})·R_h' + Wb_h + Rb_h)
    *         (linear_before_reset=1: tanh(X_t·W_h' + Wb_h +
    *          r_t ⊙ (H_{t−1}·R_h' + Rb_h)) — the torch export form)
    *   H_t = (1 − z_t) ⊙ h̃_t + z_t ⊙ H_{t−1}
    *
    * Gate stacking order in W/R/B is [z, r, h]; B = [Wb | Rb].
    * Supported: forward direction, default σ/tanh activations,
    * optional B and initial_h, both linear_before_reset values.
    * sequence_lens, bidirectional/reverse, and custom activations
    * fail loudly. Outputs (both optional, positional):
    * Y [T, 1, B, H] and Y_h [1, B, H]. Math in doubles per element,
    * rounded to float at each gate — deterministic and
    * spec-pinned against hand-computed values. */
  private def evalGru(n: Node, ins: Seq[Tensor]): Seq[Tensor] = {
    val x = ins(0)
    val w = ins(1)
    val r = ins(2)
    val dir = attrS(n, "direction", "forward")
    require(dir == "forward",
      s"GRU direction '$dir' unsupported — single forward direction only")
    require(!n.attrs.contains("activations"),
      "GRU custom activations unsupported — Sigmoid/Tanh defaults only")
    // layout=1 ([B,T,I], the tf2onnx/keras export form) passes every
    // dims check below — rank 3 either way — and would read wrong
    // rows silently; reject rather than mis-evaluate. Same for clip.
    require(attrI(n, "layout", 0L) == 0L,
      "GRU layout=1 (batch-major) unsupported — export with the " +
        "default [T, B, I] layout")
    require(!n.attrs.contains("clip"),
      "GRU clip attribute unsupported — export without cell clipping")
    require(x.dims.length == 3, s"GRU X must be [T, B, I], got ${x.dims}")
    val Seq(tLen, bSz, inSz) = x.dims
    require(r.dims.length == 3 && r.dims.head == 1,
      s"GRU R must be [1, 3H, H] (forward), got ${r.dims}")
    val hid = r.dims(2)
    val hAttr = attrI(n, "hidden_size", hid.toLong)
    require(hAttr == hid.toLong,
      s"GRU hidden_size attr $hAttr disagrees with R dims ${r.dims}")
    require(w.dims == Seq(1, 3 * hid, inSz), s"GRU W dims ${w.dims} " +
      s"!= [1, ${3 * hid}, $inSz]")
    require(r.dims == Seq(1, 3 * hid, hid), s"GRU R dims ${r.dims}")
    val lbr = attrI(n, "linear_before_reset", 0L) != 0L
    val bias =
      if (ins.length > 3 && ins(3).data.nonEmpty) {
        require(ins(3).dims == Seq(1, 6 * hid), s"GRU B dims ${ins(3).dims}")
        ins(3).data
      } else new Array[Float](6 * hid)
    require(ins.length <= 4 || ins(4).data.isEmpty,
      "GRU sequence_lens unsupported — equal-length batches only")
    val hPrev =
      if (ins.length > 5 && ins(5).data.nonEmpty) {
        require(ins(5).dims == Seq(1, bSz, hid),
          s"GRU initial_h dims ${ins(5).dims}")
        ins(5).data.clone()
      } else new Array[Float](bSz * hid)
    def sig(v: Double): Double = 1.0 / (1.0 + math.exp(-v))
    // gate g row j: W row (g·H + j) over input, R row (g·H + j) over
    // hidden; Wb at g·H + j, Rb at (3 + g)·H + j
    val y = new Array[Float](tLen * bSz * hid)
    val zv = new Array[Double](hid)
    val rv = new Array[Double](hid)
    val hNew = new Array[Float](hid)
    var t = 0
    while (t < tLen) {
      var b = 0
      while (b < bSz) {
        val xOff = (t * bSz + b) * inSz
        val hOff = b * hid
        def wx(g: Int, j: Int): Double = {
          var s = bias(g * hid + j).toDouble
          var k = 0
          val row = (g * hid + j) * inSz
          while (k < inSz) { s += w.data(row + k) * x.data(xOff + k); k += 1 }
          s
        }
        def rh(g: Int, j: Int): Double = {
          var s = 0.0
          var k = 0
          val row = (g * hid + j) * hid
          while (k < hid) { s += r.data(row + k) * hPrev(hOff + k); k += 1 }
          s
        }
        var j = 0
        while (j < hid) {
          zv(j) = sig(wx(0, j) + rh(0, j) + bias(3 * hid + j))
          rv(j) = sig(wx(1, j) + rh(1, j) + bias(4 * hid + j))
          j += 1
        }
        j = 0
        while (j < hid) {
          val hCand =
            if (lbr) math.tanh(wx(2, j) +
              rv(j) * (rh(2, j) + bias(5 * hid + j)))
            else {
              // (r ⊙ H_{t−1})·R_h' — reset applied BEFORE the
              // recurrent matmul
              var s = wx(2, j) + bias(5 * hid + j)
              var k = 0
              val row = (2 * hid + j) * hid
              while (k < hid) {
                s += r.data(row + k) * (rv(k) * hPrev(hOff + k))
                k += 1
              }
              math.tanh(s)
            }
          hNew(j) =
            ((1.0 - zv(j)) * hCand + zv(j) * hPrev(hOff + j)).toFloat
          j += 1
        }
        System.arraycopy(hNew, 0, hPrev, hOff, hid)
        System.arraycopy(hNew, 0, y, (t * bSz + b) * hid, hid)
        b += 1
      }
      t += 1
    }
    Seq(Tensor(Seq(tLen, 1, bSz, hid), y),
      Tensor(Seq(1, bSz, hid), hPrev))
  }

  /** Split along an axis into this node's output count (equal parts)
    * or the explicit sizes from the `split` attr (opset 11) / second
    * input (opset 13). */
  private def evalSplit(n: Node, ins: Seq[Tensor]): Seq[Tensor] = {
    val x = ins(0)
    val rank = x.dims.length
    val axRaw = attrI(n, "axis", 0L).toInt
    val ax = if (axRaw < 0) axRaw + rank else axRaw
    require(ax >= 0 && ax < rank, s"Split axis $axRaw for ${x.dims}")
    val d = x.dims(ax)
    val sizes: Seq[Int] =
      (if (ins.length > 1) ins(1).data.map(_.toInt).toSeq
      else attrInts(n, "split", Seq.empty).map(_.toInt)) match {
        case Seq() =>
          val parts = n.outputs.length
          require(parts > 0 && d % parts == 0,
            s"Split: $d not divisible into $parts outputs")
          Seq.fill(parts)(d / parts)
        case s =>
          require(s.sum == d, s"Split sizes $s != axis dim $d")
          s
      }
    val outer = x.dims.take(ax).product
    val inner = x.dims.drop(ax + 1).product
    var off = 0
    sizes.map { sz =>
      val out = new Array[Float](outer * sz * inner)
      var o = 0
      while (o < outer) {
        System.arraycopy(x.data, (o * d + off) * inner,
          out, o * sz * inner, sz * inner)
        o += 1
      }
      off += sz
      Tensor(x.dims.updated(ax, sz), out)
    }
  }

  private def map1(t: Tensor, f: Float => Float): Tensor = {
    val out = new Array[Float](t.data.length)
    var i = 0
    while (i < out.length) { out(i) = f(t.data(i)); i += 1 }
    Tensor(t.dims, out)
  }

  /** last-axis softmax with the max-subtraction stabilization */
  private def softmax(t: Tensor): Tensor = {
    val cols = t.dims.last
    val out = new Array[Float](t.data.length)
    var row = 0
    while (row < t.data.length / cols) {
      val o = row * cols
      var mx = Float.NegativeInfinity
      var j = 0
      while (j < cols) { mx = math.max(mx, t.data(o + j)); j += 1 }
      var sum = 0.0
      j = 0
      while (j < cols) {
        val e = math.exp((t.data(o + j) - mx).toDouble)
        out(o + j) = e.toFloat
        sum += e
        j += 1
      }
      j = 0
      while (j < cols) { out(o + j) = (out(o + j) / sum).toFloat; j += 1 }
      row += 1
    }
    Tensor(t.dims, out)
  }
}

object OnnxModel {
  import java.util.concurrent.ConcurrentHashMap
  import java.util.concurrent.atomic.AtomicLong

  /** The interpreter's op subset — keep in lockstep with the `eval`
    * match ([[OnnxModel.unsupportedOps]] reports against this list;
    * OnnxRuntimeSpec pins that every listed op actually evaluates). */
  val SupportedOps: Set[String] = Set(
    "Gemm", "MatMul", "Add", "Sub", "Mul", "Div", "Pow",
    "Relu", "LeakyRelu", "Sigmoid", "Tanh", "Softmax", "Gelu", "Erf",
    "Exp", "Log", "Sqrt", "Neg", "Abs", "Clip", "Dropout", "Cast",
    "Min", "Max", "Floor", "Ceil", "Round", "Sin", "Cos",
    "Greater", "GreaterOrEqual", "Less", "LessOrEqual", "Equal",
    "Not", "And", "Or", "Where",
    "BatchNormalization", "LayerNormalization",
    "ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin", "ArgMax",
    "Conv", "MaxPool", "AveragePool", "GlobalAveragePool",
    "GridSample", "Transpose", "Concat", "Slice", "Gather", "Split",
    "Unsqueeze", "Squeeze", "Flatten", "Reshape", "Identity",
    "Constant", "ConstantOfShape", "Expand", "Tile", "Range", "GRU",
    "Shape", "InstanceNormalization", "Pad", "Resize")

  private val cache = new ConcurrentHashMap[String, OnnxModel]()
  /** number of cold loads — observable session-per-executor reuse */
  val loads = new AtomicLong(0)

  def parseBytes(bytes: Array[Byte]): OnnxModel =
    new OnnxModel(Onnx.parse(bytes))

  /** Per-JVM (= per-executor) session cache: the model file is read
    * and parsed once per executor regardless of task/batch count —
    * the session-reuse discipline of the reference's ONNX filters
    * (one session per worker, aesthetic_improved_filter.py:22-46). */
  def forPath(path: String,
      conf: org.apache.hadoop.conf.Configuration): OnnxModel =
    cache.computeIfAbsent(path, { p =>
      loads.incrementAndGet()
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val in = fs.open(hp)
      try {
        val len = fs.getFileStatus(hp).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        parseBytes(buf)
      } finally in.close()
    })
}
