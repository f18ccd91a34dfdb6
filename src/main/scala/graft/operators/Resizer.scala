package graft.operators

/** Pure resize-geometry rules — semantics of the reference's Resizer
  * (DPF/transforms/resizer.py:5-53): given a source (w, h), compute
  * the target size under one of three modes, optionally refusing to
  * upscale. Property-tested (aspect ratio, downscale-only,
  * idempotence) per SURVEY.md §5.
  */
object Resizer {

  sealed trait Mode
  /** exact target size, aspect ratio NOT preserved */
  final case class Fixed(width: Int, height: Int) extends Mode
  /** scale so the SHORTER side equals `size` (aspect preserved) */
  final case class MinSize(size: Int) extends Mode
  /** scale so the LONGER side equals `size` (aspect preserved) */
  final case class MaxSize(size: Int) extends Mode

  /** Target (width, height). With `downscaleOnly`, never enlarges:
    * if the computed size would exceed the source, the source size is
    * returned (resizer.py:31-53). */
  def targetSize(w: Int, h: Int, mode: Mode,
      downscaleOnly: Boolean = true): (Int, Int) = {
    require(w > 0 && h > 0, s"invalid source size ${w}x$h")
    mode match {
      case Fixed(tw, th) =>
        if (downscaleOnly && (tw > w || th > h)) (w, h) else (tw, th)
      case MinSize(s) =>
        val shorter = math.min(w, h)
        if (downscaleOnly && s >= shorter) (w, h)
        else scaleBy(w, h, s.toDouble / shorter)
      case MaxSize(s) =>
        val longer = math.max(w, h)
        if (downscaleOnly && s >= longer) (w, h)
        else scaleBy(w, h, s.toDouble / longer)
    }
  }

  private def scaleBy(w: Int, h: Int, f: Double): (Int, Int) =
    (math.max(1, math.round(w * f).toInt),
      math.max(1, math.round(h * f).toInt))
}
