package graft

import graft.onnx.{Onnx, OnnxModel}

/** Bring-your-own-model gate, step 2 of the tools/export_model.py
  * flow: given any `.onnx` file, report whether the in-repo
  * interpreter can run it (the COMPLETE unsupported-op census, not
  * the first failure) and, if dims are given, measure forward
  * throughput — the number a deployment sizes its executor count by.
  *
  * Usage:
  *   graft.ModelCheck model.onnx                  # op census only
  *   graft.ModelCheck model.onnx 64x3x224x224 3   # + timed forwards
  *
  * Prints one line per fact; the last line is a JSON summary. Exit
  * status 1 when ops are missing, so export scripts can gate on it.
  */
object ModelCheck {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.ModelCheck <model.onnx> [NxCxHxW] [reps]")
    val path = args(0)
    val conf = new org.apache.hadoop.conf.Configuration()
    val m = OnnxModel.forPath(path, conf)
    val missing = m.unsupportedOps
    println(s"model: $path")
    println(s"unsupported ops: " +
      (if (missing.isEmpty) "none — runs on the interpreter"
       else missing.mkString(", ")))
    val timing: Option[(Int, Double)] = args.lift(1)
      .filter { _ =>
        // a model with missing ops can't forward — timing it would
        // die mid-eval with a stack trace instead of the documented
        // JSON summary + exit 1
        if (missing.nonEmpty)
          println("skipping timed forwards — model has unsupported ops")
        missing.isEmpty
      }
      .map { spec =>
      val dims = spec.split("x").map(_.trim.toInt).toSeq
      require(dims.nonEmpty && dims.forall(_ > 0), s"bad dims: $spec")
      val reps = args.lift(2).map(_.toInt).getOrElse(3)
      val n = dims.head
      def input(salt: Int) = Onnx.Tensor(dims,
        Array.tabulate(dims.product)(i =>
          (((i.toLong + salt) * 2654435761L % 255L).toInt / 255.0f)))
      m.forward(input(0)) // warm (JIT) pass, untimed
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        m.forward(input(r))
        (System.nanoTime() - t0) / 1e6
      }
      val best = times.min / n
      println(f"forward: batch $n%d, best of $reps%d reps: " +
        f"${times.min}%.0f ms (${best}%.2f ms/image)")
      (n, best)
    }
    val msJson = timing
      .map { case (n, ms) => f""","batch":$n,"ms_per_image":$ms%.2f""" }
      .getOrElse("")
    println(s"""{"model":"$path","missing_ops":${missing.length}$msJson}""")
    if (missing.nonEmpty) sys.exit(1)
  }
}
