package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for LLM training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition so heavyweight
  * codec state is initialized once per task, not once per row.
  *
  * The actual codecs are STUBBED behind [[Decoder]] (this environment ships
  * no image/audio libraries — see the builder brief): `FakeDecoder` is a
  * deterministic stand-in so the Spark-side plumbing (schema, partitioning,
  * batch shape, null handling) is real and tested. A production deployment
  * swaps in a JNI/JavaCV-backed `Decoder` without touching the pipeline.
  *
  * Scale notes: payloads stay in the `binary` column end-to-end — no
  * base64 inflation, no driver collection. `decodeFeatures` is a
  * mapPartitions (narrow, no shuffle); downstream joins against metadata
  * should broadcast the metadata side or bucket both by content id.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),        // "jpeg" | "wav" | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  /** One decoded feature record. `md5` is the full-payload digest. */
  case class MediaFeatures(contentId: Long, nBytes: Long, md5: String,
                           featureDim: Int, features: Array[Float])

  /** Per-partition decoder contract. Implementations must be Serializable
    * and cheap to construct once per partition. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], format: String): Array[Float]
  }

  /** Deterministic stand-in for the real codec: hashes the payload into a
    * fixed-dim pseudo-feature vector. Replaces `???` so tests can assert the
    * pipeline end-to-end. */
  class FakeDecoder(dim: Int = 16) extends Decoder {
    override def decode(payload: Array[Byte], format: String): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic FNV-ish fold
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      var b = 0
      while (b < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(b) = ((h >>> 33).toInt % 1000) / 1000.0f
        b += 1
      }
      out
    }
  }

  /** Wrap raw payloads into the canonical media frame:
    * (content_id, payload binary, meta struct). */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
                   mediaType: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("content_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"), lit(format).as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  /** Decode payloads to feature vectors, one decoder instance per partition
    * (the mapInPandas-batch analog in Scala: iterator-to-iterator, constant
    * memory, codec init amortized across the partition). */
  def decodeFeatures(media: DataFrame, decoder: Decoder)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("content_id").cast("long"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // decoder state initialized once per task
        val d = decoder
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, payload, fmt) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          md.reset()
          // full-payload digest: a prefix digest would collide distinct media
          // sharing a container header
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          val feats = d.decode(bytes, fmt)
          MediaFeatures(id, bytes.length.toLong, hex, feats.length, feats)
        }
      }
      .toDF("content_id", "n_bytes", "md5", "feature_dim", "features")
  }

  /** Frame-sampling plan for video payloads: emit (content_id, frame_idx)
    * rows every `everyMs` within the clip duration — the downstream decode
    * then touches only sampled frames. Pure column arithmetic, no UDF. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(1L), (col("meta.duration_ms") / everyMs).cast("long")))
      .select(col("content_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_ms", col("frame_idx") * everyMs)
}
