package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = MultimodalOps.fakeMediaTable(
    spark.read.parquet(s"$sfTiny/documents.parquet"))

  test("media table has the binary+metadata schema") {
    // compare names+types (source nullability varies by parquet metadata)
    assert(media.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      MultimodalOps.mediaSchema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val r = media.orderBy("media_id").head()
    assert(Set("image", "audio", "video").contains(r.getString(1)))
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("feature extraction is deterministic, batched, and shaped") {
    val f1 = MultimodalOps.extractFeatures(media, dim = 16)
      .orderBy("media_id").collect()
    val f2 = MultimodalOps.extractFeatures(media.repartition(7), dim = 16)
      .orderBy("media_id").collect()
    assert(f1.length == media.count())
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[Float](3) == b.getSeq[Float](3),
        "features must not depend on partitioning")
    }
    // histogram features are a ppm-integer probability vector over byte
    // buckets: each truncating division loses < 1 ppm, so the sum sits
    // within dim of 10^6
    f1.take(5).foreach { r =>
      val feats = r.getSeq[Float](3)
      assert(feats.length == 16)
      assert(feats.forall(f => f == math.floor(f) && f >= 0 && f <= 1000000),
        "ppm features must be exact non-negative integers")
      assert(math.abs(feats.sum - 1000000.0f) < 16)
    }
  }

  test("frame sampling explodes every-other frame with sliced payloads") {
    val frames = MultimodalOps.sampleFrames(media, everyNth = 2)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val meta = media.select($"media_id", $"meta.n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    meta.foreach { case (id, nf) =>
      val expected = (0 until nf).count(_ % 2 == 0)
      assert(byId(id)._1 == expected, s"media $id with $nf frames")
      assert(byId(id)._2 % 2 == 0)
    }
  }

  test("a custom MediaCodec swaps in as one class; pipeline unchanged") {
    object ConstCodec extends MediaCodec {
      override def features(mediaType: String, payload: Array[Byte],
                            dim: Int): Array[Float] = {
        val a = new Array[Float](dim)
        a(0) = payload.length.toFloat // prove the payload reached the codec
        a
      }
      override def frame(payload: Array[Byte], frameIdx: Int): Array[Byte] =
        Array(frameIdx.toByte)
      override def resample(payload: Array[Byte], targetLen: Int): Array[Byte] =
        payload.take(targetLen)
    }
    val feats = MultimodalOps.extractFeatures(media, dim = 4, codec = ConstCodec)
      .orderBy("media_id").head()
    assert(feats.getSeq[Float](3) ==
      Seq(feats.getInt(2).toFloat, 0.0f, 0.0f, 0.0f))
    val fr = MultimodalOps.sampleFrames(media, everyNth = 2, codec = ConstCodec)
      .filter(col("frame_idx") === 2).head()
    assert(fr.getAs[Array[Byte]]("frame_bytes").toSeq == Seq(2.toByte))
  }

  test("REAL codec through the Spark seams: P6 videos frame-sample and resample") {
    // build genuine media: each "video" is 4 concatenated 2x2 P6 frames
    // whose red channel encodes (media_id, frame_idx)
    def p6Frame(id: Int, f: Int): Array[Byte] =
      s"P6\n2 2\n255\n".getBytes("US-ASCII") ++
        Array.tabulate[Byte](12)(i => if (i % 3 == 0) (id * 16 + f).toByte else 0)
    val vids = (1 to 5).map { id =>
      (id.toLong, "video", (0 until 4).map(p6Frame(id, _)).reduce(_ ++ _),
        (2, 2, 16000, 4))
    }.toDF("media_id", "media_type", "payload", "m")
      .select($"media_id", $"media_type", $"payload",
        struct($"m._1".as("width"), $"m._2".as("height"),
          $"m._3".as("sample_rate"), $"m._4".as("n_frames")).as("meta"))
    val frames = MultimodalOps.sampleFrames(vids, everyNth = 2,
      codec = JvmMediaCodec)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        JvmMediaCodec.decodeImage(r.getAs[Array[Byte]](2)).get))
    assert(frames.length == 5 * 2) // frames 0 and 2 of each video
    frames.foreach { case (id, f, img) =>
      assert(img.width == 2 && img.height == 2)
      assert((img.raster(0) & 0xff) == id * 16 + f,
        "the DECODED frame must be the payload's idx-th image")
    }
    // resample through the same partition-batched seam: every payload is a
    // parseable image again, smaller, with the real resizer's dims
    val big = (1 to 3).map { id =>
      (id.toLong, "image",
        s"P6\n8 8\n255\n".getBytes("US-ASCII") ++ new Array[Byte](192))
    }.toDF("media_id", "media_type", "payload")
    val rs = MultimodalOps.resampleMedia(big, targetLen = 60,
      codec = JvmMediaCodec).collect()
    rs.foreach { r =>
      val img = JvmMediaCodec.decodeImage(r.getAs[Array[Byte]](3)).get
      assert(img.width == 4 && img.height == 4)
    }
  }

  test("dHash: brightness-shift invariant, content-sensitive, resize-gated") {
    def ppm(bytes: Array[Int]): Array[Byte] =
      ("P6\n8 8\n255\n".getBytes("US-ASCII") ++ bytes.map(_.toByte))
    val base = Array.tabulate(192)(i => 40 + (i * 37) % 150)
    val brighter = base.map(_ + 20) // +20 on every channel, no saturation
    val edited = base.clone(); edited(5) = 255; edited(20) = 0 // real change
    val df = Seq(
      (1L, ppm(base)), (2L, ppm(brighter)), (3L, ppm(edited))
    ).toDF("media_id", "payload")
    val h = MultimodalOps.imageDHash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "global brightness shift must not change dHash")
    assert(h(1L) != h(3L), "edited pixels must change dHash")
    // oversized rasters refuse loudly instead of truncating the hash
    val big = ("P6\n16 16\n255\n".getBytes("US-ASCII") ++
      Array.fill(16 * 16 * 3)(7.toByte))
    val err = intercept[org.apache.spark.SparkException] {
      MultimodalOps.imageDHash(
        Seq((9L, big)).toDF("media_id", "payload")).collect()
    }
    assert(err.getMessage.contains("dhash") ||
      Option(err.getCause).exists(_.getMessage.contains("dhash")))
  }

  test("ahash: volume-invariant, content-sensitive, short clips refuse") {
    def wav(samples: Array[Short]): Array[Byte] =
      JvmMediaCodec.encodeWav(JvmMediaCodec.Pcm(16000, 1, samples))
    val base = Array.tabulate[Short](256)(k =>
      (((7 * 31 + k) * (7 * 7 + k + 1)) % 16001 - 8000).toShort)
    val louder = base.map(s => (s * 3).toShort)
    val edited = base.clone()
    // reshape the middle of the envelope: frames 5..20 silenced except a
    // loud frame 10 — forces a strict peak where base had ramp structure
    (40 until 168).foreach(i => edited(i) = 0)
    (80 until 88).foreach(i => edited(i) = 30000)
    val df = Seq(
      (1L, wav(base)), (2L, wav(louder)), (3L, wav(edited))
    ).toDF("media_id", "payload")
    val h = MultimodalOps.audioEnvelopeHash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "volume scaling must not change the envelope hash")
    assert(h(1L) != h(3L), "an edited frame must change the envelope hash")
    val err = intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioEnvelopeHash(
        Seq((9L, wav(Array.fill[Short](8)(5)))).toDF("media_id", "payload"))
        .collect()
    }
    assert(err.getMessage.contains("ahash") ||
      Option(err.getCause).exists(_.getMessage.contains("ahash")))
  }

  test("clip near-dup: trim-robust, boilerplate-guarded, order-insensitive") {
    def frame(seed: Int): Array[Byte] = {
      val ras = Array.tabulate(192)(i => (40 + (i * 31 + seed * 97) % 160).toByte)
      "P6\n8 8\n255\n".getBytes("US-ASCII") ++ ras
    }
    def clip(seeds: Seq[Int]): Array[Byte] =
      seeds.flatMap(frame).toArray
    val intro = 999
    val df = Seq(
      (1L, clip(intro +: (0 to 6))),          // full clip
      (2L, clip(intro +: (2 to 6))),          // clip 1 trimmed by 2 frames
      (3L, clip((6 to 0 by -1).map(identity) :+ intro)), // re-ordered copy of 1
      (4L, clip(intro +: (20 to 26)))         // unrelated content
    ).toDF("media_id", "payload")
    val fh = MultimodalOps.clipFrameHashes(df)
    assert(fh.filter(col("media_id") === 1L).count() == 8,
      "the walker must emit one row per concatenated frame")
    val pairs = MultimodalOps.clipNearDups(fh, minShared = 5, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // intro frame appears in all 4 clips: df=4 > 3 → guarded away, so
    // it never contributes a shared count
    assert(pairs.get((1L, 2L)).contains(5L), s"trimmed copy must pair: $pairs")
    assert(pairs.get((1L, 3L)).contains(7L), s"re-ordered copy must pair: $pairs")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)),
      s"unrelated clips must not pair: $pairs")
  }

  test("resize caps dimensions without touching payloads") {
    val out = MultimodalOps.resize(media, 320, 240)
    assert(out.filter($"meta.width" > 320 || $"meta.height" > 240).count() == 0)
    val before = media.select(xxhash64($"payload")).as[Long].collect().sorted
    val after = out.select(xxhash64($"payload")).as[Long].collect().sorted
    assert(before.toSeq == after.toSeq)
  }
}
