package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-partition media codec: the ONLY seam a real deployment replaces.
  * Implementations are shipped to executors (Serializable); heavy native
  * state (decoder contexts, models) must live behind a `@transient lazy
  * val` so it initializes once per executor, not per row. */
trait MediaCodec extends Serializable {
  /** Decode + featurize one payload into a `dim`-float vector. */
  def features(mediaType: String, payload: Array[Byte], dim: Int): Array[Float]
  /** Decode one frame of a video payload. */
  def frame(payload: Array[Byte], frameIdx: Int): Array[Byte]
  /** Decode → downsample → re-encode a payload to ~`targetLen` encoded
    * bytes (thumbnailing / audio downsampling). */
  def resample(payload: Array[Byte], targetLen: Int): Array[Byte]
}

/** STUB: deterministic stand-in codec (no media libraries exist in this
  * offline environment). "Features" are the byte-bucket histogram
  * normalized to PARTS-PER-MILLION INTEGERS (count·10^6 ÷ n in exact Long
  * arithmetic, stored as float — every value ≤ 10^6 is float-exact), so
  * the whole feature computation is integer math an external engine can
  * replicate bit-for-bit (the `mm_features_ppm` oracle twin does); a
  * float-division normalization would hang the gate on cross-engine
  * rounding. A "frame" is a fixed-width byte slice. Swapping in a real
  * decoder = one new `MediaCodec` class; none of the pipeline below
  * changes. */
object FakeMediaCodec extends MediaCodec {
  override def features(mediaType: String, payload: Array[Byte],
                        dim: Int): Array[Float] = {
    val counts = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) % dim) += 1L
      i += 1
    }
    val n = math.max(1, payload.length).toLong
    val feats = new Array[Float](dim)
    var j = 0
    while (j < dim) { feats(j) = (counts(j) * 1000000L / n).toFloat; j += 1 }
    feats
  }
  override def frame(payload: Array[Byte], frameIdx: Int): Array[Byte] =
    payload.slice(frameIdx * 8, math.min(payload.length, frameIdx * 8 + 8))

  /** Stride downsample: every ceil(len/targetLen)-th byte. Pure integer
    * index arithmetic — the `mm_resample_str` oracle twin reproduces it
    * character-for-character. */
  override def resample(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    val len = payload.length
    if (len <= targetLen) payload
    else {
      val stride = (len + targetLen - 1) / targetLen
      val out = new Array[Byte]((len - 1) / stride + 1)
      var i = 0
      while (i * stride < len) { out(i) = payload(i * stride); i += 1 }
      out
    }
  }
}

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media payloads ride as opaque `binary` columns next to a
  * typed metadata struct; decode / feature-extraction / resize /
  * frame-sampling run as partition-local batch transforms.
  *
  * The actual codec calls live behind [[MediaCodec]], defaulting to the
  * deterministic [[FakeMediaCodec]]; the Spark-side contract — schema,
  * batching, partition locality, output shapes — is real and tested, so a
  * real decoder is a one-class swap.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))), nullable = false)))

  /** Build a deterministic media table from any (id, text) source: the
    * payload is the text's bytes (a stand-in for real encoded media), the
    * metadata derives deterministically from the id. */
  def fakeMediaTable(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      col(textCol).cast("binary").as("payload"),
      struct(
        (pmod(col(idCol), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col(idCol), lit(3)) * 120 + 240).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col(idCol), lit(8)) + 1).cast("int").as("n_frames")).as("meta"))

  private val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** "Decode + feature-extract": partition-local batched transform over
    * the binary payloads → fixed-width float feature vector. This is the
    * `mapInPandas`-shaped stage: one worker-side function consuming an
    * iterator of rows, amortizing any per-partition model/codec setup. */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      codec: MediaCodec = FakeMediaCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "media_type", "payload").mapPartitions { rows =>
      // per-partition batch: the codec's lazy state initializes once here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        Row(r.getLong(0), r.getString(1), bytes.length,
          codec.features(r.getString(1), bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame — the
    * video-to-frames explode, shape-preserving. The explode/filter stay
    * columnar (codegen'd); only the per-frame decode goes through the
    * codec (a UDF — frame decode is opaque native code in any real
    * implementation). */
  def sampleFrames(media: DataFrame, everyNth: Int = 2,
                   codec: MediaCodec = FakeMediaCodec): DataFrame = {
    val decodeFrame = udf((payload: Array[Byte], idx: Int) =>
      codec.frame(payload, idx))
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1)))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
      .select(
        col("media_id"), col("frame_idx"),
        decodeFrame(col("payload"), col("frame_idx")).as("frame_bytes"))
  }

  private val resampleSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes_in", IntegerType, nullable = false),
    StructField("resampled", BinaryType, nullable = false)))

  /** Payload resize: decode → downsample → re-encode through the codec,
    * batched per partition like [[extractFeatures]] (one codec/model
    * initialization per partition, not per row). Output payloads are
    * ~`targetLen` bytes — the thumbnail/low-rate-audio materialization
    * step of a multimodal curation pipeline. */
  def resampleMedia(media: DataFrame, targetLen: Int = 64,
                    codec: MediaCodec = FakeMediaCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(resampleSchema)
    media.select("media_id", "media_type", "payload").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        Row(r.getLong(0), r.getString(1), bytes.length,
          codec.resample(bytes, targetLen))
      }
    }(enc)
  }

  private val imageStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** REAL image decode → integer channel statistics, optionally through a
    * nearest-neighbor resize first: payloads parse as binary PPM/PGM or
    * PNG/JPEG via [[JvmMediaCodec]] (not the fake byte arithmetic), rows
    * that fail to parse are dropped (the production skip-corrupt-payload
    * behavior), and the emitted sums are exact integers an independent
    * engine can rebuild from the same pixel bytes — `mm_decode_ppm` /
    * `mm_resize_ppm` do. Same partition-local batched seam as
    * [[extractFeatures]]. */
  def imageStats(media: DataFrame,
                 resizeTo: Option[(Int, Int)] = None): DataFrame = {
    val enc = RowEncoder.encoderFor(imageStatsSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        JvmMediaCodec.decodeAnyImage(r.getAs[Array[Byte]](1)).map { img0 =>
          val img = resizeTo.fold(img0) { case (w, h) =>
            JvmMediaCodec.resizeNearest(img0, w, h) }
          Row(r.getLong(0), img.width.toLong, img.height.toLong,
            img.channelSum(0),
            if (img.channels > 1) img.channelSum(1) else img.channelSum(0),
            if (img.channels > 2) img.channelSum(2) else img.channelSum(0))
        }
      }
    }(enc)
  }

  private val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** Difference-hash (dHash) perceptual fingerprint: decode, per-pixel
    * brightness as the CHANNEL SUM (division-free — strictly
    * order-equivalent to the mean, so any engine replicates it in exact
    * integers), one bit per horizontally-adjacent strict increase,
    * packed row-major ((w−1)·h bits; requires (w−1)·h ≤ 64). The hash
    * is invariant to global brightness shifts — adding a constant to
    * every channel preserves every comparison — which is what makes
    * re-encoded or exposure-nudged copies of an image COLLIDE to one
    * fingerprint while distinct images scatter: grouping by `dhash` is
    * image-level near-dedup the way MinHash banding is text-level.
    * Near-misses (1–2 bit flips — a recompression artifact nudging one
    * comparison) pair through [[imageNearDups]] — same fingerprint
    * column, banded hamming-ball grouping instead of equality. */
  private def dHashOf(img: JvmMediaCodec.Image): Long = {
    require((img.width - 1) * img.height <= 64,
      s"dhash needs (w-1)*h <= 64 bits, got ${img.width}x${img.height}" +
        " — resize first (resizeNearest)")
    def gray(x: Int, y: Int): Int = {
      val base = (y * img.width + x) * img.channels
      var s = 0; var c = 0
      while (c < img.channels) { s += img.raster(base + c) & 0xff; c += 1 }
      s
    }
    var h = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width - 1) {
        if (gray(x + 1, y) > gray(x, y))
          h |= 1L << (y * (img.width - 1) + x)
        x += 1
      }
      y += 1
    }
    h
  }

  def imageDHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(dhashSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        JvmMediaCodec.decodeAnyImage(r.getAs[Array[Byte]](1))
          .map(img => Row(r.getLong(0), dHashOf(img)))
      }
    }(enc)
  }

  /** Near-miss image dedup: pairs of images whose dHash fingerprints
    * sit within `maxDist` hamming bits — the copies exact
    * grouping-by-dhash misses, because an exposure nudge PLUS a lossy
    * re-encode flips a comparison or two instead of none. Candidates
    * come from [[DedupOps.hammingPairs64]]'s 4×16-bit band equi-join
    * (complete for maxDist ≤ 3 by pigeonhole, never a cartesian pass;
    * bounded like `cosinePairsLsh` via the same `maxBucket` hot-bucket
    * guard), verified by exact `bit_count(xor)`. Input is
    * [[imageDHash]]'s output; at 100 TB the only data-sized work is the
    * 4-row-per-image band shuffle. */
  def imageNearDups(hashes: DataFrame, maxDist: Int = 2,
                    maxBucket: Int = 0): DataFrame =
    DedupOps.hammingPairs64(
      hashes.select(col("media_id").as("id"), col("dhash").as("sh")),
      maxDist, maxBucket)

  private val clipHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** Per-frame dHash of a concatenated-P6 clip: walk the frame stream
    * with the real parser, one (media_id, frame_idx, dhash) row per
    * frame — the clip's bag-of-frame-fingerprints. */
  def clipFrameHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(clipHashSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var off = 0
        var idx = 0L
        var more = true
        while (more) {
          JvmMediaCodec.decodeImageAt(payload, off) match {
            case Some((img, next)) =>
              out += Row(r.getLong(0), idx, dHashOf(img))
              off = next; idx += 1
            case None => more = false
          }
        }
        out
      }
    }(enc)
  }

  /** Clip-level near-dup from frame fingerprints: pairs of clips
    * sharing ≥ `minShared` DISTINCT frame hashes — robust to trimming
    * and re-ordering the way whole-payload hashing isn't, because the
    * clip is matched as a BAG of frames. The join is an equi-join on
    * the fingerprint; `maxDf` drops boilerplate frames first (intro
    * cards, black frames — the stop-gram guard of the video world: a
    * frame in everything would otherwise quadratically pair everything),
    * mirroring jaccardPairs' `maxDf`. */
  def clipNearDups(frameHashes: DataFrame, minShared: Int,
                   maxDf: Int = 64): DataFrame = {
    val fh = frameHashes.select("media_id", "dhash").distinct()
    val keep = fh.groupBy("dhash").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("dhash")
    val kept = fh.join(keep, "dhash")
    val a = kept.select(col("dhash"), col("media_id").as("id_a"))
    val b = kept.select(col("dhash"), col("media_id").as("id_b"))
    a.join(b, "dhash")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  private val pngStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("chk", LongType, nullable = false)))

  /** PNG encode→decode round-trip gate: each (PPM) payload decodes with
    * the Netpbm parser, re-encodes through the JDK's REAL PNG writer,
    * decodes back through the REAL PNG reader, and emits exact integer
    * stats over the round-tripped raster — per-channel sums plus a
    * position-weighted checksum (a swapped, dropped, or channel-rotated
    * byte can't cancel). PNG is lossless, so an oracle that rebuilds the
    * source raster arithmetically (`mm_png_roundtrip`) hash-proves the
    * whole encode→decode identity per byte per row. */
  def pngRoundTripStats(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(pngStatsSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        JvmMediaCodec.decodeImage(r.getAs[Array[Byte]](1)).map { src =>
          val png = JvmMediaCodec.encodePng(src)
          val img = JvmMediaCodec.decodeJdkImage(png).getOrElse(
            throw new IllegalStateException(
              s"PNG round-trip parse failed for id ${r.getLong(0)}"))
          var chk = 0L
          var i = 0
          while (i < img.raster.length) {
            chk += (img.raster(i) & 0xff).toLong * (i % 7 + 1)
            i += 1
          }
          Row(r.getLong(0), img.width.toLong, img.height.toLong,
            img.channelSum(0), img.channelSum(1), img.channelSum(2), chk)
        }
      }
    }(enc)
  }

  private val wavStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("chk", LongType, nullable = false)))

  /** WAV encode→decode round-trip gate: per id, derive
    * `64 + id % 64` PCM16 samples from pure integer arithmetic
    * (`((id·31 + k)·131071) mod 65536 − 32768` — replicable by any
    * engine), push them through [[JvmMediaCodec]]'s RIFF encoder AND
    * parser, and emit integer stats over the DECODED samples (position-
    * weighted checksum so a reorder or off-by-one can't cancel out).
    * Equal hashes against an oracle computing the same formula directly
    * prove the container round-trip preserved every sample. */
  def wavRoundTripStats(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(wavStatsSchema)
    ids.select(col(idCol).cast("long").as("id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (64 + id % 64).toInt
        val samples = Array.tabulate[Short](n)(k =>
          (((id * 31 + k) * 131071L) % 65536L - 32768L).toShort)
        val wav = JvmMediaCodec.encodeWav(JvmMediaCodec.Pcm(16000, 1, samples))
        val pcm = JvmMediaCodec.decodeWav(wav).getOrElse(
          throw new IllegalStateException(s"round-trip parse failed for id $id"))
        var sumAbs = 0L
        var chk = 0L
        var k = 0
        while (k < pcm.samples.length) {
          sumAbs += math.abs(pcm.samples(k).toLong)
          chk += pcm.samples(k).toLong * (k % 7 + 1)
          k += 1
        }
        Row(id, pcm.samples.length.toLong, pcm.sampleRate.toLong, sumAbs, chk)
      }
    }(enc)
  }

  private val ahashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false)))

  /** Audio envelope hash — the WAV sibling of [[imageDHash]]: decode
    * PCM16, split into `frames` equal windows (tail truncated), frame
    * loudness = Σ|sample| in exact Longs, one bit per adjacent-frame
    * strict increase. Comparisons survive multiplication of every
    * sample by a positive constant, so VOLUME-SCALED copies of a clip
    * collide to one fingerprint while different clips scatter —
    * grouping by `ahash` is clip-level near-dedup. `frames` ≤ 64;
    * clips shorter than `frames` samples refuse loudly (an empty-frame
    * hash would collide everything silent-ish). */
  def audioEnvelopeHash(media: DataFrame, frames: Int = 32): DataFrame = {
    require(frames >= 2 && frames <= 64, s"frames must be 2..64, got $frames")
    val enc = RowEncoder.encoderFor(ahashSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        JvmMediaCodec.decodeWav(r.getAs[Array[Byte]](1)).map { pcm =>
          val n = pcm.samples.length
          require(n >= frames,
            s"ahash needs >= $frames samples, got $n for id ${r.getLong(0)}")
          val flen = n / frames
          val e = new Array[Long](frames)
          var f = 0
          while (f < frames) {
            var s = 0L
            var k = f * flen
            val end = k + flen
            while (k < end) { s += math.abs(pcm.samples(k).toLong); k += 1 }
            e(f) = s
            f += 1
          }
          var h = 0L
          var i = 0
          while (i < frames - 1) {
            if (e(i + 1) > e(i)) h |= 1L << i
            i += 1
          }
          Row(r.getLong(0), h)
        }
      }
    }(enc)
  }

  /** Gate fixture for [[audioEnvelopeHash]]: per id, `n` PCM16 samples
    * from `((seed·31 + k)·(seed·7 + k + 1)) mod 16001 − 8000` —
    * QUADRATIC in k with seed-dependent coefficients, because a linear
    * recurrence makes every seed a phase shift of one periodic ramp and
    * envelopes collide across seeds (measured: 38 distinct hashes for
    * 100 seeds; the quadratic gives 100/100). Scaled by `1 + id mod 3`
    * (≤ ±24000 — never clips) and pushed through the REAL RIFF
    * encoder: ids sharing `id mod seedMod` share a base clip at
    * different volumes — planted near-dup groups any engine re-derives
    * arithmetically. */
  def wavNearDupTable(ids: DataFrame, seedMod: Int, n: Int = 256,
                      idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    ids.select(col(idCol).cast("long").as("id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val seed = id % seedMod
        val scale = 1 + id % 3
        val samples = Array.tabulate[Short](n)(k =>
          (((seed * 31 + k) * (seed * 7 + k + 1) % 16001L - 8000L)
            * scale).toShort)
        Row(id, JvmMediaCodec.encodeWav(JvmMediaCodec.Pcm(16000, 1, samples)))
      }
    }(enc)
  }

  /** "Resize": metadata-only transform (dimension halving) + payload
    * passthrough — the cheap-path op that must not decode. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("meta",
      struct(
        least(col("meta.width"), lit(maxW)).as("width"),
        least(col("meta.height"), lit(maxH)).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))
}
