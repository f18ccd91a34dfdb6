package graft.onnx

import org.scalatest.funsuite.AnyFunSuite

/** Seeded random-sweep properties for the interpreter's N-D index
  * math (broadcast elementwise, batched MatMul, Transpose, Slice,
  * Concat) against naive coordinate-space references — the newest
  * code with the subtlest stride arithmetic, swept over shapes the
  * hand-written cases don't reach. */
class OnnxPropertySpec extends AnyFunSuite {
  import TestOnnx._

  private val rnd = new scala.util.Random(4242)

  private def randTensor(dims: Seq[Int], salt: Int): Onnx.Tensor =
    Onnx.Tensor(dims, Array.tabulate(dims.product)(i =>
      (((i * 2654435761L + salt * 104729L) % 19) - 9) * 0.31f))

  /** naive multi-dim coordinate enumeration */
  private def coords(dims: Seq[Int]): Iterator[Seq[Int]] =
    dims.foldLeft(Iterator(Seq.empty[Int])) { (acc, d) =>
      acc.flatMap(c => (0 until d).iterator.map(c :+ _))
    }

  private def at(t: Onnx.Tensor, c: Seq[Int]): Float = {
    var off = 0
    var stride = 1
    (c.indices.reverse).foreach { i =>
      off += c(i) * stride
      stride *= t.dims(i)
    }
    t.data(off)
  }

  test("property: broadcast Add matches coordinate-space reference") {
    (0 until 60).foreach { trial =>
      val rank = 1 + rnd.nextInt(4)
      val outDims = Seq.fill(rank)(1 + rnd.nextInt(4))
      // each input independently collapses some dims to 1 and may
      // drop leading dims entirely
      def inputShape(): Seq[Int] = {
        val keep = rnd.nextInt(rank + 1) // leading dims dropped
        outDims.drop(keep).map(d => if (rnd.nextBoolean()) d else 1)
      }
      // rank >= 1 both sides: the wire parser normalizes rank-0
      // initializers to [n], so true scalars are out of model scope
      val aDims = inputShape() match { case Seq() => Seq(1); case d => d }
      val bDims = inputShape() match { case Seq() => Seq(1); case d => d }
      // numpy rule: output rank = max INPUT rank (not the shape the
      // generator started from), align from the right
      val outRank = math.max(aDims.length, bDims.length)
      def merged(d: Seq[Int]): Seq[Int] =
        Seq.fill(outRank - d.length)(1) ++ d
      val effOut = merged(aDims).zip(merged(bDims)).map {
        case (x, y) => math.max(x, y)
      }
      val a = randTensor(aDims, trial * 2 + 1)
      val b = randTensor(bDims, trial * 2 + 2)
      val g = model(
        nodes = Seq(node("Add", Seq("a", "b"), Seq("y"))),
        inits = Seq(tensor("b", bDims, b.data.toSeq)),
        inputs = Seq("a"), outputs = Seq("y"))
      val got = OnnxModel.parseBytes(g).forward(a)
      assert(got.dims == effOut, s"trial $trial: $aDims+$bDims")
      coords(effOut).foreach { c =>
        def pick(t: Onnx.Tensor): Float = {
          val tc = c.drop(effOut.length - t.dims.length)
            .zip(t.dims).map { case (ci, d) => if (d == 1) 0 else ci }
          at(t, tc)
        }
        val want = pick(a) + pick(b)
        assert(math.abs(at(got, c) - want) < 1e-6,
          s"trial $trial at $c: ${at(got, c)} vs $want")
      }
    }
  }

  test("property: batched MatMul matches triple-loop reference") {
    (0 until 60).foreach { trial =>
      val m = 1 + rnd.nextInt(4)
      val k = 1 + rnd.nextInt(4)
      val n = 1 + rnd.nextInt(4)
      val batchRank = rnd.nextInt(3)
      val outBatch = Seq.fill(batchRank)(1 + rnd.nextInt(3))
      def side(tail: Seq[Int]): Seq[Int] = {
        val keep = rnd.nextInt(batchRank + 1)
        outBatch.drop(keep).map(d => if (rnd.nextBoolean()) d else 1) ++ tail
      }
      val aDims = side(Seq(m, k))
      val bDims = side(Seq(k, n))
      val a = randTensor(aDims, trial * 3 + 1)
      val b = randTensor(bDims, trial * 3 + 2)
      val g = model(
        nodes = Seq(node("MatMul", Seq("a", "b"), Seq("y"))),
        inits = Seq(tensor("b", bDims, b.data.toSeq)),
        inputs = Seq("a"), outputs = Seq("y"))
      val got = OnnxModel.parseBytes(g).forward(a)
      val wantBatch =
        if (aDims.length == 2 && bDims.length == 2) Seq.empty[Int]
        else {
          val r = math.max(aDims.length, bDims.length) - 2
          val ab = Seq.fill(r - (aDims.length - 2))(1) ++ aDims.dropRight(2)
          val bb = Seq.fill(r - (bDims.length - 2))(1) ++ bDims.dropRight(2)
          ab.zip(bb).map { case (x, y) => math.max(x, y) }
        }
      assert(got.dims == wantBatch ++ Seq(m, n),
        s"trial $trial: $aDims x $bDims -> ${got.dims}")
      coords(wantBatch).foreach { bc =>
        def mat(t: Onnx.Tensor): Seq[Int] = {
          val tb = t.dims.dropRight(2)
          bc.drop(wantBatch.length - tb.length)
            .zip(tb).map { case (ci, d) => if (d == 1) 0 else ci }
        }
        (0 until m).foreach { i =>
          (0 until n).foreach { j =>
            var want = 0.0
            (0 until k).foreach { p =>
              want += at(a, mat(a) ++ Seq(i, p)).toDouble *
                at(b, mat(b) ++ Seq(p, j))
            }
            val gc = bc ++ Seq(i, j)
            assert(math.abs(at(got, gc) - want) < 1e-4,
              s"trial $trial at $gc: ${at(got, gc)} vs $want")
          }
        }
      }
    }
  }

  test("property: Transpose with random perms round-trips coordinates") {
    (0 until 40).foreach { trial =>
      val rank = 2 + rnd.nextInt(3)
      val dims = Seq.fill(rank)(1 + rnd.nextInt(4))
      val perm = rnd.shuffle((0 until rank).toList)
      val x = randTensor(dims, trial + 7)
      val g = model(
        nodes = Seq(node("Transpose", Seq("x"), Seq("y"),
          Seq(attrInts("perm", perm.map(_.toLong))))),
        inits = Nil, inputs = Seq("x"), outputs = Seq("y"))
      val got = OnnxModel.parseBytes(g).forward(x)
      assert(got.dims == perm.map(dims))
      coords(got.dims).foreach { c =>
        val src = perm.indices.map(d => c(perm.indexOf(d)))
        assert(at(got, c) == at(x, src), s"trial $trial at $c")
      }
    }
  }

  test("property: Slice windows match coordinate filtering") {
    (0 until 40).foreach { trial =>
      val rank = 1 + rnd.nextInt(3)
      val dims = Seq.fill(rank)(2 + rnd.nextInt(4))
      val ax = rnd.nextInt(rank)
      val lo = rnd.nextInt(dims(ax))
      val hi = lo + 1 + rnd.nextInt(dims(ax) - lo)
      val x = randTensor(dims, trial + 13)
      val g = model(
        nodes = Seq(node("Slice",
          Seq("x", "starts", "ends", "axes"), Seq("y"))),
        inits = Seq(
          tensor("starts", Seq(1), Seq(lo.toFloat)),
          tensor("ends", Seq(1), Seq(hi.toFloat)),
          tensor("axes", Seq(1), Seq(ax.toFloat))),
        inputs = Seq("x"), outputs = Seq("y"))
      val got = OnnxModel.parseBytes(g).forward(x)
      assert(got.dims == dims.updated(ax, hi - lo))
      coords(got.dims).foreach { c =>
        val src = c.updated(ax, c(ax) + lo)
        assert(at(got, c) == at(x, src), s"trial $trial at $c")
      }
    }
  }

  test("property: Concat equals coordinate-space stacking on any axis") {
    (0 until 40).foreach { trial =>
      val rank = 1 + rnd.nextInt(3)
      val base = Seq.fill(rank)(1 + rnd.nextInt(4))
      val ax = rnd.nextInt(rank)
      val sizes = Seq.fill(2 + rnd.nextInt(2))(1 + rnd.nextInt(3))
      val parts = sizes.zipWithIndex.map { case (s, i) =>
        randTensor(base.updated(ax, s), trial * 10 + i)
      }
      val g = model(
        nodes = Seq(node("Concat",
          parts.indices.map(i => s"p$i"), Seq("y"),
          Seq(attrInt("axis", ax.toLong)))),
        inits = parts.zipWithIndex.drop(1).map { case (p, i) =>
          tensor(s"p$i", p.dims, p.data.toSeq) },
        inputs = Seq("p0"), outputs = Seq("y"))
      val got = OnnxModel.parseBytes(g).forward(parts.head)
      assert(got.dims == base.updated(ax, sizes.sum))
      coords(got.dims).foreach { c =>
        var rest = c(ax)
        var pi = 0
        while (rest >= sizes(pi)) { rest -= sizes(pi); pi += 1 }
        val want = at(parts(pi), c.updated(ax, rest))
        assert(at(got, c) == want, s"trial $trial at $c")
      }
    }
  }
}
