package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension tier): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run as per-partition batch functions.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment) behind [[FakeCodec]] — a deterministic stand-in — but the
  * Spark-side plumbing is real: schema, `mapPartitions` batching,
  * partition-preserving layout, and metadata projection are exactly what a
  * real decoder would plug into.
  *
  * Scale notes: binary payloads stay columnar in parquet; metadata-only
  * queries never touch the payload column (column pruning). Decode is
  * per-partition (one codec init per partition, not per row), and the
  * output schema is fixed so downstream stays in whole-stage codegen.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Build a media table from the `documents` testdata: the UTF-8 bytes of
    * `text` play the opaque payload (deterministic fake "image bytes"), and
    * the metadata struct is computed with codegen'd built-ins.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("media_type"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** STUB codec: deterministic fake decode. A real deployment swaps this
    * object for one backed by an actual codec library; the signature — a
    * whole partition of payloads in, fixed-schema features out — is the
    * contract `mapPartitions` needs.
    */
  object FakeCodec {
    /** "Decode" → (width, height, n_frames): pure function of the bytes. */
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (n % 640 + 1, n % 480 + 1, n % 30 + 1)
    }
    /** "Feature vector": 8 deterministic byte-statistics. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
    /** "Resize": scale decoded dimensions to fit a bounding box,
      * preserving aspect ratio — the arithmetic a real resizer performs on
      * real dimensions.
      */
    def resize(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
      val scale = math.min(maxW.toDouble / w, maxH.toDouble / h)
      if (scale >= 1.0) (w, h)
      else (math.max((w * scale).toInt, 1), math.max((h * scale).toInt, 1))
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract, batched per partition. One codec "session"
    * per partition; rows stream through without materializing the whole
    * partition.
    */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // real codec: open once per partition here
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, f) = FakeCodec.decode(payload)
          Row(id, w, h, f, FakeCodec.features(payload).toSeq)
        }
      }(enc)
  }

  /** Frame sampling: every `stride`-th frame index per media, exploded —
    * the row-multiplying shape a video pipeline needs, done with
    * codegen'd `sequence`+`explode`, no UDF.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 5): DataFrame =
    decoded.select(col("media_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1,
        lit(stride))).as("frame_idx"))

  /** Resize: aspect-preserving fit into (maxW, maxH), pure column
    * arithmetic (the codec only runs at decode; resize operates on decoded
    * dimensions and stays codegen'd).
    */
  def resized(decoded: DataFrame, maxW: Int = 224,
      maxH: Int = 224): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"))
    decoded.select(col("media_id"), col("width"), col("height"),
      when(scale >= 1.0, col("width"))
        .otherwise(greatest(floor(col("width") * scale).cast("int"),
          lit(1))).as("out_width"),
      when(scale >= 1.0, col("height"))
        .otherwise(greatest(floor(col("height") * scale).cast("int"),
          lit(1))).as("out_height"))
  }
}
