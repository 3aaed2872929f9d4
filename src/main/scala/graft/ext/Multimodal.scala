package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus batched feature extraction.
  *
  * The decode step itself is STUBBED (no image/audio libs in this
  * environment): `StubDecoder.decode` is a deterministic fake that derives
  * "features" from the payload bytes. Everything around it — the schema, the
  * binary column handling, the partition-local batch loop (the Scala
  * equivalent of `mapInPandas`: decode amortized over a batch per call, not
  * per row), and the feature output shape — is real and tested, so swapping
  * a real JNI/FFmpeg decoder in changes one function.
  */
object Multimodal {

  /** A media row: opaque payload + metadata that travels with it. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  /** Extracted features for one media item. */
  case class MediaFeatures(media_id: Long, kind: String, payload_len: Int,
      feature: Array[Float], frame_hash: String)

  /** Synthesize a media table from the documents fixture: text bytes stand
    * in for an encoded image payload; n_chars-derived fake dimensions. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  object StubDecoder {
    /** Deterministic fake decode: real decoders return a fixed-size float
      * tensor per frame; we derive one from payload bytes. Marked stub. */
    def decode(payload: Array[Byte], dims: Int = 8): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** Deterministic fake frame-sample hash (first-16-bytes hex). */
    def frameHash(payload: Array[Byte]): String =
      payload.take(16).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Frame sampling over a binary payload: every `stride`-th full frame of
    * `frameSize` bytes, identified by its content hash. Pure column ops —
    * `sequence`+`explode` generate frame indices distributed, `substring`
    * slices the payload bytes inside whole-stage codegen, no UDF and no
    * per-row driver work. This is the video-keyframe-sampling shape: a real
    * decoder swaps the byte-slice for a codec call, the plumbing
    * (index generation, slicing, hashing, output schema) is unchanged. */
  def frameSample(media: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames", floor(length(col(payloadCol)) / frameSize).cast("int"))
      .filter(col("n_frames") >= 1) // only payloads with at least one full frame
      .select(col(idCol),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"),
        col(payloadCol))
      .select(col(idCol), col("frame_idx"),
        md5(expr(s"substring($payloadCol, frame_idx * $frameSize + 1, $frameSize)"))
          .as("frame_md5"))

  /** Partition-local batched feature extraction — the mapInPandas shape:
    * rows are pulled in batches of `batchSize`, the (stub) decoder runs once
    * per batch, and features stream out. No shuffle; scales linearly with
    * partitions. */
  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real decoders amortize model/codec setup per batch here
          batch.iterator.map { case (id, kind, payload) =>
            MediaFeatures(id, kind, payload.length,
              StubDecoder.decode(payload), StubDecoder.frameHash(payload))
          }
        }
      }
  }
}
