package graft.operators

/** The ONE RIFF/AVI chunk walker. Three operators parse AVI
  * containers (frame extraction, the video info probe, the MJPEG
  * transforms' fps read); they previously each carried their own
  * copy of the fourcc/size/alignment skeleton, and a size-wrap bug
  * had to be fixed in every copy independently. All container-walk
  * invariants live here once:
  *
  *  - chunk sizes stay `Long` — a size field ≥ 2^31 `.toInt`'d
  *    negative stalls the cursor (infinite loop on corrupt input);
  *  - chunks are word-aligned (`size + (size & 1)`);
  *  - LIST bodies recurse with the list type pushed onto `path`
  *    (head = innermost), clamped to the enclosing extent.
  */
private[operators] object Riff {
  def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Depth-first walk over every non-LIST chunk of a RIFF AVI.
    * `visit(id, bodyOffset, size, path)` returns whether to CONTINUE
    * — header-only readers (fps, info probes) stop without paying
    * O(every movi frame chunk). `size` may exceed the remaining
    * bytes on truncated input; callers bounds-check reads. Returns
    * false (without visiting) when the RIFF/AVI magic is absent. */
  def walkAvi(b: Array[Byte])(
      visit: (String, Long, Long, List[String]) => Boolean): Boolean = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return false
    def go(start: Long, end: Long, path: List[String]): Boolean = {
      var o = start
      var continue = true
      while (continue && o + 8 <= end) {
        val id = fourcc(b, o.toInt)
        val size = u32(b, o.toInt + 4)
        val body = o + 8
        continue =
          if (id == "LIST" && body + 4 <= end)
            go(body + 4, math.min(body + size, end),
              fourcc(b, body.toInt) :: path)
          else visit(id, body, size, path)
        o = body + size + (size & 1)
      }
      continue
    }
    go(12L, b.length.toLong, Nil)
    true
  }
}
