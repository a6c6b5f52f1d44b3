package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media payloads ride as opaque `binary` columns next to a
  * typed metadata struct; decode / feature-extraction / resize /
  * frame-sampling run as partition-local batch transforms.
  *
  * The actual codec calls are STUBBED with a deterministic fake (no media
  * libraries exist in this environment — marked `// STUB:` below); the
  * Spark-side contract — schema, batching, partition locality, output
  * shapes — is real and tested, so swapping in a real decoder changes one
  * function body, not the pipeline.
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
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "media_type", "payload").mapPartitions { rows =>
      // per-partition setup happens once (a real impl loads the codec here)
      rows.map { r =>
        val id = r.getLong(0)
        val tpe = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        // STUB: deterministic fake "decode" — byte-histogram moments in
        // `dim` buckets stand in for real image/audio features.
        val feats = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) {
          feats((bytes(i) & 0xff) % dim) += 1.0f
          i += 1
        }
        val n = math.max(1, bytes.length).toFloat
        var j = 0
        while (j < dim) { feats(j) = feats(j) / n; j += 1 }
        Row(id, tpe, bytes.length, feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame, payload sliced
    * deterministically — the video-to-frames explode, shape-preserving. */
  def sampleFrames(media: DataFrame, everyNth: Int = 2): DataFrame = {
    val frames = media
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1)))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
    // STUB: a real impl decodes frame `frame_idx`; the fake slices bytes.
    frames.select(
      col("media_id"), col("frame_idx"),
      col("payload").substr((col("frame_idx") * 8 + 1).cast("int"), lit(8))
        .as("frame_bytes"))
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
