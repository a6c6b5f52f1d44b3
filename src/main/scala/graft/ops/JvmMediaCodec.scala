package graft.ops

/** A REAL [[MediaCodec]]: pure-JVM decoders for genuinely standard formats
  * that need no external libraries — Netpbm images (binary P6/P5 with full
  * header grammar: comments, arbitrary whitespace, maxval), PNG and JPEG
  * via the JDK's own ImageIO codecs (`java.desktop`, present in every
  * standard JDK), and RIFF/WAVE PCM16 audio. "Video" is a concatenated P6
  * frame stream (the Netpbm convention `ppmtoy4m` and friends consume:
  * back-to-back images, each self-describing).
  *
  * Everything stays integer-exact so results are bit-reproducible across
  * partitionings and replicable by an independent engine (the
  * `mm_decode_ppm` / `mm_resize_ppm` oracles rebuild the same images in
  * DuckDB and hash-compare the decoded channel sums).
  *
  * Payloads that parse as neither format fall back to
  * [[FakeMediaCodec]]'s deterministic byte arithmetic, so the codec can
  * run over a mixed (or synthetic) corpus without dying mid-partition —
  * the behavior a production decode stage needs when a corrupt payload
  * appears in a 100 TB scan.
  */
object JvmMediaCodec extends MediaCodec {

  /** A decoded raster: `channels` ∈ {1 (P5), 3 (P6)}, row-major,
    * interleaved, one byte per sample (maxval ≤ 255). */
  final case class Image(width: Int, height: Int, maxVal: Int,
                         channels: Int, raster: Array[Byte]) {
    def channelSum(c: Int): Long = {
      var s = 0L
      var i = c
      while (i < raster.length) { s += (raster(i) & 0xff); i += channels }
      s
    }
  }

  /** A decoded PCM16 mono/stereo clip (interleaved samples). */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  // JDK ImageIO touches java.awt; force headless so executors never try
  // to reach a display. Safe to set repeatedly (object init runs once per
  // JVM, i.e. once per executor).
  System.setProperty("java.awt.headless", "true")

  // ---------------------------------------------------------------- netpbm

  /** Parse one P6/P5 image starting at `off`; returns the image and the
    * offset one past its raster (so concatenated streams iterate). The
    * header grammar per the Netpbm spec: magic, then three decimal fields
    * (width, height, maxval) separated by whitespace, `#` comments running
    * to end-of-line allowed anywhere whitespace is, a single whitespace
    * byte after maxval, then `width*height*channels` raster bytes. */
  def decodeImageAt(payload: Array[Byte], off: Int): Option[(Image, Int)] = {
    if (off + 2 > payload.length || payload(off) != 'P') return None
    val channels = payload(off + 1) match {
      case '6' => 3
      case '5' => 1
      case _   => return None
    }
    var p = off + 2
    def skipWsAndComments(): Boolean = {
      var progressed = true
      while (progressed && p < payload.length) {
        progressed = false
        while (p < payload.length && Character.isWhitespace(payload(p))) {
          p += 1; progressed = true
        }
        if (p < payload.length && payload(p) == '#') {
          while (p < payload.length && payload(p) != '\n') p += 1
          progressed = true
        }
      }
      p < payload.length
    }
    def readInt(): Option[Int] = {
      if (!skipWsAndComments()) return None
      var v = 0L
      var any = false
      while (p < payload.length && payload(p) >= '0' && payload(p) <= '9') {
        v = v * 10 + (payload(p) - '0'); p += 1; any = true
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      mv <- readInt()
      // exactly ONE whitespace byte separates maxval from the raster
      // (a raster may begin with any byte value, including '#' or digits)
      if p < payload.length && Character.isWhitespace(payload(p))
      _ = { p += 1 }
      if w > 0 && h > 0 && mv > 0 && mv <= 255
      n = w.toLong * h * channels
      if n <= Int.MaxValue && p + n <= payload.length
    } yield {
      val raster = java.util.Arrays.copyOfRange(payload, p, p + n.toInt)
      (Image(w, h, mv, channels, raster), p + n.toInt)
    }
  }

  def decodeImage(payload: Array[Byte]): Option[Image] =
    decodeImageAt(payload, 0).map(_._1)

  /** Re-encode as binary PPM/PGM (canonical single-space header). */
  def encodeImage(img: Image): Array[Byte] = {
    val magic = if (img.channels == 3) "P6" else "P5"
    val header = s"$magic\n${img.width} ${img.height}\n${img.maxVal}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.raster, 0, out, header.length, img.raster.length)
    out
  }

  /** Nearest-neighbor resize: output pixel (x, y) samples input pixel
    * (⌊x·inW/outW⌋, ⌊y·inH/outH⌋) — pure integer index math, replicated
    * verbatim by the `mm_resize_ppm` oracle. */
  def resizeNearest(img: Image, outW: Int, outH: Int): Image = {
    require(outW > 0 && outH > 0)
    val out = new Array[Byte](outW * outH * img.channels)
    var y = 0
    while (y < outH) {
      val sy = y.toLong * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x.toLong * img.width / outW
        val src = ((sy * img.width + sx) * img.channels).toInt
        val dst = (y * outW + x) * img.channels
        var c = 0
        while (c < img.channels) { out(dst + c) = img.raster(src + c); c += 1 }
        x += 1
      }
      y += 1
    }
    Image(outW, outH, img.maxVal, img.channels, out)
  }

  // ------------------------------------------------------------------ wav

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE container with a PCM16 `fmt ` chunk: walks the
    * chunk list (chunks are word-aligned per the RIFF spec), so extra
    * chunks (`LIST`, `fact`, …) before `data` are fine. */
  def decodeWav(payload: Array[Byte]): Option[Pcm] = {
    if (payload.length < 44 || tag(payload, 0) != "RIFF" ||
      tag(payload, 8) != "WAVE") return None
    var p = 12
    var rate = 0
    var channels = 0
    var bits = 0
    var ok = false
    var data: Array[Short] = null
    while (p + 8 <= payload.length && data == null) {
      val id = tag(payload, p)
      val sz = le32(payload, p + 4)
      if (sz < 0 || p + 8 + sz > payload.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val fmt = le16(payload, p + 8)
          channels = le16(payload, p + 10)
          rate = le32(payload, p + 12)
          bits = le16(payload, p + 22)
          ok = fmt == 1 && bits == 16 && channels >= 1 && rate > 0
        case "data" =>
          if (!ok) return None // fmt must precede data and be PCM16
          val n = sz / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = le16(payload, p + 8 + i * 2).toShort; i += 1 }
          data = s
        case _ => // skip LIST/fact/cue/...
      }
      p += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (data == null) None else Some(Pcm(rate, channels, data))
  }

  /** Canonical 44-byte-header PCM16 WAV encode. */
  def encodeWav(pcm: Pcm): Array[Byte] = {
    val dataLen = pcm.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = pcm.sampleRate * pcm.channels * 2
    out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(pcm.channels.toShort).putInt(pcm.sampleRate)
      .putInt(byteRate).putShort((pcm.channels * 2).toShort).putShort(16)
    out.put("data".getBytes).putInt(dataLen)
    pcm.samples.foreach(out.putShort)
    out.array()
  }

  /** Decimate by integer stride (every `stride`-th FRAME, all channels),
    * output sample rate divided accordingly — the cheap anti-aliasing-free
    * downsample; a production codec would low-pass first, which changes
    * values but not the plumbing. */
  def decimate(pcm: Pcm, stride: Int): Pcm = {
    require(stride >= 1)
    val frames = pcm.samples.length / pcm.channels
    val outFrames = if (frames == 0) 0 else (frames - 1) / stride + 1
    val out = new Array[Short](outFrames * pcm.channels)
    var f = 0
    while (f < outFrames) {
      var c = 0
      while (c < pcm.channels) {
        out(f * pcm.channels + c) = pcm.samples(f * stride * pcm.channels + c)
        c += 1
      }
      f += 1
    }
    Pcm(math.max(1, pcm.sampleRate / stride), pcm.channels, out)
  }

  // ------------------------------------------------ PNG/JPEG (JDK ImageIO)

  /** PNG signature (\x89PNG). */
  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  /** JPEG SOI marker (\xFF\xD8\xFF). */
  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  /** Decode a PNG or JPEG payload through the JDK's own ImageIO codecs
    * (`java.desktop` — shipped with every standard JDK, no external
    * libraries) into the engine's interleaved-RGB raster. PNG decode is
    * bit-exact (lossless container — the `mm_png_roundtrip` oracle proves
    * encode→decode identity per pixel); JPEG is inherently lossy, so it is
    * value-pinned in specs rather than oracle-gated. Non-PNG/JPEG or
    * corrupt streams → None (the skip-don't-die contract). */
  def decodeJdkImage(payload: Array[Byte]): Option[Image] = {
    if (!isPng(payload) && !isJpeg(payload)) return None
    try {
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (bi == null) None
      else {
        val w = bi.getWidth
        val h = bi.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) None
        else {
          val px = bi.getRGB(0, 0, w, h, null, 0, w)
          val raster = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) {
            raster(i * 3) = ((px(i) >> 16) & 0xff).toByte
            raster(i * 3 + 1) = ((px(i) >> 8) & 0xff).toByte
            raster(i * 3 + 2) = (px(i) & 0xff).toByte
            i += 1
          }
          Some(Image(w, h, 255, 3, raster))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def toBufferedImage(img: Image): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // one bulk setRGB (mirroring decodeJdkImage's bulk getRGB): the
    // per-pixel form pays a ColorModel conversion per call
    val px = new Array[Int](img.width * img.height)
    var i = 0
    while (i < px.length) {
      val base = i * img.channels
      px(i) =
        if (img.channels >= 3)
          ((img.raster(base) & 0xff) << 16) |
            ((img.raster(base + 1) & 0xff) << 8) |
            (img.raster(base + 2) & 0xff)
        else { // grayscale replicates into all three channels
          val v = img.raster(base) & 0xff
          (v << 16) | (v << 8) | v
        }
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, px, 0, img.width)
    bi
  }

  /** Encode through the JDK's lossless PNG writer. */
  def encodePng(img: Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(img.raster.length / 2 + 64)
    javax.imageio.ImageIO.write(toBufferedImage(img), "png", out)
    out.toByteArray
  }

  /** Encode through the JDK's baseline JPEG writer at the given quality. */
  def encodeJpeg(img: Image, quality: Float = 0.9f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val out = new java.io.ByteArrayOutputStream(img.raster.length / 4 + 64)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null,
        new javax.imageio.IIOImage(toBufferedImage(img), null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Netpbm first (header sniff is a 2-byte check), then the JDK image
    * containers — the one image-decode entry the pipeline stages use. */
  def decodeAnyImage(payload: Array[Byte]): Option[Image] =
    decodeImage(payload).orElse(decodeJdkImage(payload))

  // -------------------------------------------------------- MediaCodec api

  /** Image → first `channels` slots are per-channel means (ppm-exact Long
    * division, like [[FakeMediaCodec]]'s normalization), remaining slots a
    * luminance histogram in ppm. Audio → per-bucket mean |amplitude| in
    * ppm of full scale. Unknown → byte-bucket histogram (the fake's math),
    * so a mixed corpus never crashes the stage. */
  override def features(mediaType: String, payload: Array[Byte],
                        dim: Int): Array[Float] =
    decodeAnyImage(payload) match {
      case Some(img) =>
        val feats = new Array[Float](dim)
        val n = math.max(1, img.width.toLong * img.height)
        var c = 0
        while (c < math.min(img.channels, dim)) {
          // mean in ppm of maxval: channelSum·10^6 / (n·maxVal), exact
          feats(c) = (img.channelSum(c) * 1000000L / (n * img.maxVal)).toFloat
          c += 1
        }
        val histSlots = dim - img.channels
        if (histSlots > 0) {
          val counts = new Array[Long](histSlots)
          var i = 0
          while (i < img.raster.length) {
            // luminance = mean of the pixel's channels (integer floor)
            var lum = 0
            var k = 0
            while (k < img.channels) { lum += img.raster(i + k) & 0xff; k += 1 }
            counts((lum / img.channels) * histSlots / 256) += 1L
            i += img.channels
          }
          var j = 0
          while (j < histSlots) {
            feats(img.channels + j) = (counts(j) * 1000000L / n).toFloat; j += 1
          }
        }
        feats
      case None => decodeWav(payload) match {
        case Some(pcm) =>
          val feats = new Array[Float](dim)
          val n = pcm.samples.length
          if (n > 0) {
            val sums = new Array[Long](dim)
            val cnts = new Array[Long](dim)
            var i = 0
            while (i < n) {
              val b = i.toLong * dim / n
              sums(b.toInt) += math.abs(pcm.samples(i).toLong)
              cnts(b.toInt) += 1L
              i += 1
            }
            var j = 0
            while (j < dim) {
              if (cnts(j) > 0)
                feats(j) = (sums(j) * 1000000L / (cnts(j) * 32768L)).toFloat
              j += 1
            }
          }
          feats
        case None => FakeMediaCodec.features(mediaType, payload, dim)
      }
    }

  /** Concatenated-P6-stream frame extraction: walk `frameIdx` images in,
    * return that image re-encoded standalone. Non-stream payloads fall
    * back to the fake's byte slice. */
  override def frame(payload: Array[Byte], frameIdx: Int): Array[Byte] = {
    var off = 0
    var i = 0
    while (i <= frameIdx) {
      decodeImageAt(payload, off) match {
        case Some((img, next)) =>
          if (i == frameIdx) return encodeImage(img)
          off = next
        case None =>
          return FakeMediaCodec.frame(payload, frameIdx)
      }
      i += 1
    }
    Array.emptyByteArray // unreachable
  }

  /** Image → nearest-neighbor scale so the re-encoded size ≈ targetLen
    * (aspect preserved via a single integer scale factor); WAV → decimate
    * so the data chunk ≈ targetLen; unknown → the fake's byte stride. */
  override def resample(payload: Array[Byte], targetLen: Int): Array[Byte] =
    decodeImage(payload) match {
      case Some(img) =>
        if (payload.length <= targetLen) payload
        else {
          // shrink both dims by the smallest integer factor that brings
          // raster bytes under targetLen: ceil(sqrt(raster/target))
          val ratio = img.raster.length.toDouble / math.max(1, targetLen)
          val f = math.max(1, math.ceil(math.sqrt(ratio)).toInt)
          encodeImage(resizeNearest(img,
            math.max(1, img.width / f), math.max(1, img.height / f)))
        }
      case None => decodeJdkImage(payload) match {
        case Some(img) =>
          if (payload.length <= targetLen) payload
          else {
            // compressed output size tracks raster size only loosely;
            // scale by the ENCODED ratio (conservative) and re-encode in
            // the source's own container
            val ratio = payload.length.toDouble / math.max(1, targetLen)
            val f = math.max(1, math.ceil(math.sqrt(ratio)).toInt)
            val small = resizeNearest(img,
              math.max(1, img.width / f), math.max(1, img.height / f))
            if (isJpeg(payload)) encodeJpeg(small) else encodePng(small)
          }
        case None => decodeWav(payload) match {
          case Some(pcm) =>
            if (payload.length <= targetLen) payload
            else {
              val stride = math.max(1,
                (pcm.samples.length * 2 + targetLen - 1) / math.max(1, targetLen))
              encodeWav(decimate(pcm, stride))
            }
          case None => FakeMediaCodec.resample(payload, targetLen)
        }
      }
    }
}
