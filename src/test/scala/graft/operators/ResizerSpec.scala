package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Resizer._

class ResizerSpec extends AnyFunSuite {

  /** seeded random sweep (scalacheck-style properties without the
    * scalatestplus bridge, which is not in the offline cache) */
  private def sweep(n: Int)(body: (Int, Int, Int) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach { _ =>
      body(1 + rnd.nextInt(10000), 1 + rnd.nextInt(10000),
        1 + rnd.nextInt(5000))
    }
  }

  test("fixed mode returns the target unless it would upscale") {
    assert(targetSize(100, 50, Fixed(10, 20)) == (10, 20))
    assert(targetSize(5, 5, Fixed(10, 20)) == (5, 5))
    assert(targetSize(5, 5, Fixed(10, 20), downscaleOnly = false) == (10, 20))
  }

  test("min-size sets the shorter side") {
    assert(targetSize(200, 100, MinSize(50)) == (100, 50))
    assert(targetSize(100, 200, MinSize(50)) == (50, 100))
  }

  test("max-size sets the longer side") {
    assert(targetSize(200, 100, MaxSize(50)) == (50, 25))
    assert(targetSize(100, 200, MaxSize(50)) == (25, 50))
  }

  test("property: downscaleOnly never enlarges (aspect modes)") {
    sweep(500) { (w, h, s) =>
      for (mode <- Seq(MinSize(s), MaxSize(s))) {
        val (tw, th) = targetSize(w, h, mode)
        assert(tw <= w && th <= h, s"$mode on ${w}x$h -> ${tw}x$th")
      }
    }
  }

  test("property: without downscaleOnly the constrained side is exact") {
    sweep(500) { (w, h, s) =>
      val (tw1, th1) = targetSize(w, h, MinSize(s), downscaleOnly = false)
      assert(math.min(tw1, th1) == math.max(1,
        math.round(math.min(w, h) * (s.toDouble / math.min(w, h))).toInt))
      val (tw2, th2) = targetSize(w, h, MaxSize(s), downscaleOnly = false)
      assert(math.max(tw2, th2) >= 1 && math.max(tw2, th2) <= math.max(s, 1))
    }
  }

  test("property: aspect ratio approximately preserved by max mode") {
    sweep(500) { (w, h, s) =>
      if (w > 4 && h > 4) {
        val (tw, th) = targetSize(w, h, MaxSize(s), downscaleOnly = false)
        val srcRatio = w.toDouble / h
        val dstRatio = tw.toDouble / th
        assert(math.abs(srcRatio - dstRatio) / srcRatio <
          1.0 / math.min(tw, th) + 0.05,
          s"${w}x$h -> ${tw}x$th")
      }
    }
  }

  test("property: idempotence — resizing to the computed size is a no-op") {
    sweep(500) { (w, h, s) =>
      val (tw, th) = targetSize(w, h, MinSize(s))
      assert(targetSize(tw, th, MinSize(s)) == (tw, th))
      val (uw, uh) = targetSize(w, h, MaxSize(s))
      assert(targetSize(uw, uh, MaxSize(s)) == (uw, uh))
    }
  }
}
