package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import graft.SparkSpec
import graft.core.Modality

/** Real MJPEG-in-AVI frame decode: frames extracted from a hand-built
  * AVI must be byte-decodable JPEGs whose perceptual hash equals the
  * source image's — the proof the adapter feeds REAL pixels (not the
  * md5 stub) to downstream image filters.
  */
class VideoFramesSpec extends SparkSpec {

  /** A flat-color-with-gradient test image; distinct seeds give
    * distinct pHashes. */
  private def image(seed: Int): BufferedImage = {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val r = (x * 4 + seed * 37) % 256
      val g = (y * 5 + seed * 101) % 256
      val b = (seed * 53) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Hand-built MJPEG AVI: RIFF(AVI ) { LIST(hdrl){avih}, LIST(movi)
    * {00dc × frames} } — each 00dc chunk is a complete JPEG. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(0); tag("AVI ") // RIFF size 0: walker uses length
    tag("LIST")
    w32(4 + 8 + 56); tag("hdrl")
    tag("avih"); w32(56)
    w32(33333); w32(0); w32(0); w32(0)
    w32(frames.length.toLong) // total frames
    w32(0); w32(1); w32(0); w32(64); w32(48)
    bos.write(new Array[Byte](16))
    val moviSize = 4 + frames.map(f => 8L + f.length + (f.length & 1)).sum
    tag("LIST"); w32(moviSize); tag("movi")
    frames.foreach { f =>
      tag("00dc"); w32(f.length.toLong); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0) // word alignment pad
    }
    bos.toByteArray
  }

  private val sources = (0 until 5).map(i => jpeg(image(i)))
  private val avi = mjpegAvi(sources)

  test("sampleIndices: evenly spaced, deduplicated, clamped") {
    assert(VideoFrames.sampleIndices(100, 4) == Seq(12, 37, 62, 87))
    assert(VideoFrames.sampleIndices(2, 6) == Seq(0, 1))
    assert(VideoFrames.sampleIndices(0, 3) == Nil)
  }

  test("extracted frame bytes are the original JPEGs, byte-identical") {
    val Right((total, idx, frames)) = VideoFrames.extractSampled(avi, 5)
    assert(total == 5)
    assert(idx == Seq(0, 1, 2, 3, 4))
    frames.zip(sources).foreach { case (got, want) =>
      assert(got.sameElements(want))
    }
  }

  test("pHash of an extracted frame equals pHash of the source JPEG") {
    val ph = PHashFilter(8)
    val Right((_, _, frames)) = VideoFrames.extractSampled(avi, 2)
    // frame 1 of 5 at n=2 picks indices 1 and 3
    val framePh = ph.phashHex(
      ImageIO.read(new ByteArrayInputStream(frames.head)))
    val srcPh = ph.phashHex(
      ImageIO.read(new ByteArrayInputStream(sources(1))))
    assert(framePh == srcPh)
    // and distinct source images give distinct hashes (no constant hash)
    val otherPh = ph.phashHex(
      ImageIO.read(new ByteArrayInputStream(sources(3))))
    assert(framePh != otherPh)
  }

  test("a chunk size >= 2^31 terminates instead of stalling the walk") {
    // size field 0xFFFFFFF8 .toInt'd to -8 used to freeze the cursor
    // (infinite loop) — must now terminate with no frames
    val bos = new ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(0); tag("AVI ")
    tag("LIST"); w32(0xFFFFFFF8L); tag("movi")
    tag("00dc"); w32(0xFFFFFFF8L)
    bos.write(new Array[Byte](64))
    val corrupt = bos.toByteArray
    val res = VideoFrames.extractSampled(corrupt, 2)
    assert(res.isLeft, res.toString)
    assert(Mjpeg.fps(corrupt).isEmpty)
    val probe = VideoInfoFilter().processBatch(Seq(FilterInput("k",
      Map(Modality.Video.name -> corrupt), Map.empty))).head.get
    assert(probe.head == false)
  }

  test("VideoFrameExtractFilter: frames column + error paths") {
    val f = VideoFrameExtractFilter(nFrames = 3)
    val res = f.processBatch(Seq(
      FilterInput("ok", Map(Modality.Video.name -> avi), Map.empty),
      FilterInput("junk", Map(Modality.Video.name -> Array[Byte](1, 2, 3)),
        Map.empty),
      FilterInput("missing", Map.empty, Map.empty)))
    val ok = res(0).get
    assert(ok(0) == true && ok(1) == 5)
    assert(ok(2).asInstanceOf[Seq[Int]].length == 3)
    val frames = ok(3).asInstanceOf[Seq[Array[Byte]]]
    assert(frames.forall(b =>
      ImageIO.read(new ByteArrayInputStream(b)) != null))
    assert(res(1).get.head == false)
    assert(res(2).get.head == false)
  }

  test("ImageFilterAdapter: per-frame pHash arrays match direct hashing") {
    val adapter = ImageFilterAdapter(PHashFilter(8), nFrames = 5)
    val res = adapter.processBatch(Seq(
      FilterInput("v0", Map(Modality.Video.name -> avi), Map.empty),
      FilterInput("bad", Map(Modality.Video.name -> Array[Byte](9)),
        Map.empty)))
    val ok = res(0).get
    assert(ok(0) == true && ok(1) == 5)
    assert(ok(2).asInstanceOf[Seq[Int]] == Seq(0, 1, 2, 3, 4))
    val hashes = ok(3).asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])
    val want = sources.map(s => PHashFilter(8).phashHex(
      ImageIO.read(new ByteArrayInputStream(s))))
    assert(hashes == want)
    val bad = res(1).get
    assert(bad(0) == false && bad.last != null)
  }

  test("adapter composes with the real ONNX scorer: per-frame model scores") {
    // video → frames → real ONNX forward pass per frame batch
    val dir = java.nio.file.Files
      .createTempDirectory("graft-video-onnx").toFile
    val mf = new java.io.File(dir, "head.onnx")
    val os = new java.io.FileOutputStream(mf)
    try os.write(graft.onnx.TestOnnx.mlpBytes) finally os.close()
    val adapter = ImageFilterAdapter(
      OnnxScoreFilter(Some(mf.getAbsolutePath)), nFrames = 3)
    val res = adapter.processBatch(Seq(
      FilterInput("v", Map(Modality.Video.name -> avi), Map.empty)))
    val ok = res.head.get
    assert(ok(0) == true)
    val scores = ok(3).asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double])
    assert(scores.length == 3)
    // each score equals the independent forward pass on that frame
    val Right((_, idx, frames)) = VideoFrames.extractSampled(avi, 3)
    val filter = OnnxScoreFilter(None)
    frames.zip(scores).foreach { case (fb, got) =>
      val img = ImageIO.read(new ByteArrayInputStream(fb))
      val want = graft.onnx.TestOnnx.expectedScore(
        filter.featurize(img).toSeq)
      assert(math.abs(got - want) < 1e-5, s"got $got want $want")
    }
    assert(idx == Seq(0, 2, 4))
  }

  test("adapter composes with the real captioner: per-frame decoded captions") {
    // the VideoLLaVA shape with a REAL (toy-scale) model: video →
    // decoded frames → vision encode → greedy decode per frame
    val dir = java.nio.file.Files
      .createTempDirectory("graft-video-caption").toFile
    def write(name: String, bytes: Array[Byte]): String = {
      val f = new java.io.File(dir, name)
      val os = new java.io.FileOutputStream(f)
      try os.write(bytes) finally os.close()
      f.getAbsolutePath
    }
    val E = 4
    val vocab = OnnxCaptionFilter.DefaultVocab
    val vPath = write("v.onnx", graft.onnx.TestOnnx.tinyCnnEncoder(E, 21))
    val dPath = write("d.onnx", graft.onnx.TestOnnx.tinyCaptionDecoder(
      3 + vocab.length, E, 8, 31))
    val captioner = OnnxCaptionFilter(Some(vPath), Some(dPath),
      vocab, maxTokens = 8)
    val adapter = ImageFilterAdapter(captioner, nFrames = 3)
    val res = adapter.processBatch(Seq(
      FilterInput("v", Map(Modality.Video.name -> avi), Map.empty)))
    val ok = res.head.get
    assert(ok(0) == true)
    val caps = ok(3).asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])
    assert(caps.length == 3)
    caps.foreach(c => c.split(" ").filter(_.nonEmpty)
      .foreach(w => assert(vocab.contains(w), s"$w not in vocab")))
    // per-frame captions equal direct decode of the extracted frames
    val Right((_, _, frames)) = VideoFrames.extractSampled(avi, 3)
    val conf = new org.apache.hadoop.conf.Configuration()
    val vm = graft.onnx.OnnxModel.forPath(vPath, conf)
    val dm = graft.onnx.OnnxModel.forPath(dPath, conf)
    frames.zip(caps).foreach { case (fb, got) =>
      val img = ImageIO.read(new ByteArrayInputStream(fb))
      assert(captioner.decode(vm, dm, img) == got)
    }
  }

  test("adapter schema: inner fields become frame_<name> arrays") {
    val adapter = ImageFilterAdapter(PHashFilter(8), nFrames = 2)
    assert(adapter.resultSchema.fieldNames.toSeq == Seq(
      "is_correct", "n_frames_total", "frame_index",
      "frame_image_phash_8", "error"))
  }
}
