package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Value-level pins for the REAL pure-JVM media codec: Netpbm header
  * grammar, raster extraction, nearest-neighbor sampling arithmetic,
  * concatenated-frame streams, and RIFF/WAVE PCM16 round-trips. */
class JvmMediaCodecSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def p6(w: Int, h: Int, raster: Array[Byte],
                 header: String = null): Array[Byte] = {
    val hd = Option(header).getOrElse(s"P6\n$w $h\n255\n")
    ascii(hd) ++ raster
  }

  test("P6 decode: dims, maxval, raster bytes, channel sums") {
    val raster = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 10).toByte)
    val img = JvmMediaCodec.decodeImage(p6(2, 2, raster)).get
    assert(img.width == 2 && img.height == 2 && img.maxVal == 255 && img.channels == 3)
    assert(img.raster.toSeq == raster.toSeq)
    // channel c holds bytes c, c+3, c+6, c+9 → sums 0+30+60+90 etc.
    assert(img.channelSum(0) == 0 + 30 + 60 + 90)
    assert(img.channelSum(1) == 10 + 40 + 70 + 100)
    assert(img.channelSum(2) == 20 + 50 + 80 + 110)
  }

  test("header grammar: comments, arbitrary whitespace, raster starting with #") {
    val raster = Array[Byte]('#', '1', '2') // raster bytes may LOOK like header
    val weird = "P6 # trailing comment\n# full-line comment\n  2\t1 # dims done\n 255\n"
    val img = JvmMediaCodec.decodeImage(ascii(weird) ++ raster ++ ascii("###")).get
    assert(img.width == 2 && img.height == 1)
    assert(img.raster.toSeq == (raster ++ ascii("###")).take(6).toSeq)
  }

  test("P5 grayscale decodes with 1 channel") {
    val img = JvmMediaCodec.decodeImage(
      ascii("P5\n3 1\n255\n") ++ Array[Byte](5, 10, 15)).get
    assert(img.channels == 1 && img.width == 3)
    assert(img.channelSum(0) == 30)
  }

  test("truncated raster, bad magic, maxval > 255 all reject (no crash)") {
    assert(JvmMediaCodec.decodeImage(p6(4, 4, new Array[Byte](10))).isEmpty)
    assert(JvmMediaCodec.decodeImage(ascii("P7\n1 1\n255\nxyz")).isEmpty)
    assert(JvmMediaCodec.decodeImage(
      ascii("P6\n1 1\n65535\n") ++ new Array[Byte](6)).isEmpty)
  }

  test("nearest-neighbor resize: exact source-pixel selection, 8x8 -> 4x4") {
    // pixel (x,y) value encodes its coordinates: r = y*8+x
    val raster = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8) raster((y * 8 + x) * 3) = (y * 8 + x).toByte
    val img = JvmMediaCodec.decodeImage(p6(8, 8, raster)).get
    val out = JvmMediaCodec.resizeNearest(img, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((out.raster((y * 4 + x) * 3) & 0xff) == (2 * y) * 8 + 2 * x,
        s"output ($x,$y) must sample input (${2 * x},${2 * y})")
    // non-integer ratio: 3x3 -> 2x2 samples floor(x*3/2) ∈ {0, 1}
    val r3 = new Array[Byte](27)
    for (y <- 0 until 3; x <- 0 until 3) r3((y * 3 + x) * 3) = (y * 3 + x).toByte
    val o2 = JvmMediaCodec.resizeNearest(JvmMediaCodec.decodeImage(p6(3, 3, r3)).get, 2, 2)
    assert(Seq(0, 1, 3, 4).map(_.toByte) ==
      (for (p <- 0 until 4) yield o2.raster(p * 3)).toSeq)
  }

  test("encode/decode round-trip preserves everything") {
    val raster = Array.tabulate[Byte](6 * 2 * 3)(i => (i * 7).toByte)
    val img = JvmMediaCodec.decodeImage(p6(6, 2, raster)).get
    val again = JvmMediaCodec.decodeImage(JvmMediaCodec.encodeImage(img)).get
    assert(again == img.copy(raster = again.raster)
      && again.raster.toSeq == img.raster.toSeq)
  }

  test("frame: concatenated P6 stream returns the idx-th standalone image") {
    val f0 = p6(1, 1, Array[Byte](1, 2, 3))
    val f1 = p6(2, 1, Array[Byte](4, 5, 6, 7, 8, 9))
    val f2 = p6(1, 1, Array[Byte](10, 11, 12))
    val stream = f0 ++ f1 ++ f2
    val got1 = JvmMediaCodec.decodeImage(JvmMediaCodec.frame(stream, 1)).get
    assert(got1.width == 2 && got1.raster.toSeq == Seq[Byte](4, 5, 6, 7, 8, 9))
    val got2 = JvmMediaCodec.decodeImage(JvmMediaCodec.frame(stream, 2)).get
    assert(got2.raster.toSeq == Seq[Byte](10, 11, 12))
  }

  test("WAV: decode/encode round-trip and chunk-walking past extra chunks") {
    val pcm = JvmMediaCodec.Pcm(16000, 1,
      Array.tabulate[Short](100)(i => (i * 331 - 16000).toShort))
    val wav = JvmMediaCodec.encodeWav(pcm)
    val back = JvmMediaCodec.decodeWav(wav).get
    assert(back.sampleRate == 16000 && back.channels == 1)
    assert(back.samples.toSeq == pcm.samples.toSeq)
    // splice a LIST chunk between fmt and data: decoder must skip it
    val (head, tail) = wav.splitAt(36) // 12 RIFF + 24 fmt
    val listChunk = "LIST".getBytes ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = head ++ listChunk ++ tail
    assert(JvmMediaCodec.decodeWav(spliced).get.samples.toSeq == pcm.samples.toSeq)
  }

  test("WAV decimate: stride sampling, rate division, stereo frame integrity") {
    val stereo = JvmMediaCodec.Pcm(8000, 2,
      Array.tabulate[Short](20)(_.toShort)) // frames: (0,1),(2,3),...
    val out = JvmMediaCodec.decimate(stereo, 3)
    assert(out.sampleRate == 8000 / 3 && out.channels == 2)
    // frames 0, 3, 6, 9 survive with BOTH channels intact
    assert(out.samples.toSeq == Seq[Short](0, 1, 6, 7, 12, 13, 18, 19))
  }

  test("resample: image shrinks under targetLen via integer factor; wav decimates") {
    val raster = new Array[Byte](8 * 8 * 3)
    val small = JvmMediaCodec.resample(p6(8, 8, raster), 60)
    val img = JvmMediaCodec.decodeImage(small).get
    // ceil(sqrt(192/60)) = 2 → 4x4 → 48 raster bytes + header < original
    assert(img.width == 4 && img.height == 4 && small.length < 192)
    val wav = JvmMediaCodec.encodeWav(
      JvmMediaCodec.Pcm(16000, 1, new Array[Short](1000)))
    val down = JvmMediaCodec.decodeWav(JvmMediaCodec.resample(wav, 500)).get
    assert(down.samples.length * 2 <= 500 && down.sampleRate < 16000)
  }

  test("features: image path uses decoded pixels; garbage falls back to fake") {
    // all-white 2x2 image → channel means = 10^6 ppm exactly
    val white = p6(2, 2, Array.fill[Byte](12)(0xff.toByte))
    val f = JvmMediaCodec.features("image", white, 8)
    assert(f(0) == 1000000f && f(1) == 1000000f && f(2) == 1000000f)
    // luminance 255 lands in the TOP histogram slot ((255*5)/256 = 4 of 0..4)
    assert(f(7) == 1000000f && f(3) == 0f)
    val junk = ascii("not media at all")
    assert(JvmMediaCodec.features("image", junk, 16).toSeq ==
      FakeMediaCodec.features("image", junk, 16).toSeq)
  }

  // ------------------------------------------------ PNG/JPEG (JDK ImageIO)

  private def gradient(w: Int, h: Int): JvmMediaCodec.Image = {
    val raster = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        raster(base) = (x * 255 / math.max(1, w - 1)).toByte
        raster(base + 1) = (y * 255 / math.max(1, h - 1)).toByte
        raster(base + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
        x += 1
      }
      y += 1
    }
    JvmMediaCodec.Image(w, h, 255, 3, raster)
  }

  test("PNG: encode→decode is a byte-exact raster round-trip") {
    val img = gradient(9, 7)
    val png = JvmMediaCodec.encodePng(img)
    assert(JvmMediaCodec.isPng(png) && !JvmMediaCodec.isJpeg(png))
    val back = JvmMediaCodec.decodeJdkImage(png).get
    assert(back.width == 9 && back.height == 7 && back.channels == 3)
    assert(back.raster.toSeq == img.raster.toSeq)
  }

  test("PNG: grayscale P5 source replicates into three equal channels") {
    val p5img = JvmMediaCodec.decodeImage(
      ascii("P5\n3 1\n255\n") ++ Array[Byte](5, 10, 15)).get
    val back = JvmMediaCodec.decodeJdkImage(JvmMediaCodec.encodePng(p5img)).get
    assert(back.channels == 3)
    assert(back.channelSum(0) == 30 && back.channelSum(1) == 30 &&
      back.channelSum(2) == 30)
  }

  test("JPEG: decode recovers dims exactly and a smooth image approximately") {
    val img = gradient(16, 16)
    val jpg = JvmMediaCodec.encodeJpeg(img, quality = 0.95f)
    assert(JvmMediaCodec.isJpeg(jpg) && !JvmMediaCodec.isPng(jpg))
    val back = JvmMediaCodec.decodeJdkImage(jpg).get
    assert(back.width == 16 && back.height == 16)
    // lossy but bounded on a smooth gradient: every pixel within 16/255
    var maxErr = 0
    var i = 0
    while (i < img.raster.length) {
      maxErr = math.max(maxErr,
        math.abs((img.raster(i) & 0xff) - (back.raster(i) & 0xff)))
      i += 1
    }
    assert(maxErr <= 16, s"max per-pixel JPEG error $maxErr")
  }

  test("JPEG decode is deterministic (same payload, same raster)") {
    val jpg = JvmMediaCodec.encodeJpeg(gradient(8, 8))
    val a = JvmMediaCodec.decodeJdkImage(jpg).get
    val b = JvmMediaCodec.decodeJdkImage(jpg).get
    assert(a.raster.toSeq == b.raster.toSeq)
  }

  test("corrupt PNG/JPEG payloads reject (no crash), wrong magic skips ImageIO") {
    val png = JvmMediaCodec.encodePng(gradient(4, 4))
    val truncated = png.take(20)
    assert(JvmMediaCodec.decodeJdkImage(truncated).isEmpty)
    val scrambled = png.clone()
    scrambled(12) = 0x7f // corrupt the IHDR chunk type
    assert(JvmMediaCodec.decodeJdkImage(scrambled).isEmpty)
    assert(JvmMediaCodec.decodeJdkImage(ascii("plain text")).isEmpty)
  }

  test("features routes PNG payloads through the real decoded pixels") {
    // all-white PNG → channel means = 10^6 ppm exactly, same as the PPM path
    val white = JvmMediaCodec.encodePng(
      JvmMediaCodec.Image(2, 2, 255, 3, Array.fill[Byte](12)(0xff.toByte)))
    val f = JvmMediaCodec.features("image", white, 8)
    assert(f(0) == 1000000f && f(1) == 1000000f && f(2) == 1000000f)
    assert(f(7) == 1000000f && f(3) == 0f)
  }

  test("resample re-encodes in the source container (PNG→PNG, JPEG→JPEG)") {
    val big = gradient(64, 64)
    val png = JvmMediaCodec.encodePng(big)
    val smallPng = JvmMediaCodec.resample(png, png.length / 4)
    assert(JvmMediaCodec.isPng(smallPng))
    val backP = JvmMediaCodec.decodeJdkImage(smallPng).get
    assert(backP.width < 64 && backP.height < 64)
    val jpg = JvmMediaCodec.encodeJpeg(big)
    val smallJpg = JvmMediaCodec.resample(jpg, jpg.length / 4)
    assert(JvmMediaCodec.isJpeg(smallJpg))
    assert(JvmMediaCodec.decodeJdkImage(smallJpg).get.width < 64)
  }
}
