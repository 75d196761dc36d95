package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (media) column plumbing: images/audio/video ride as opaque
  * `binary` columns with typed metadata. The DECODE step is a clearly
  * marked deterministic STUB (no image/audio libs in this container); the
  * Spark-side plumbing — schema, batched per-partition decode, metadata
  * struct shape — is real and tested, so a real decoder (e.g. mapInPandas
  * with PIL on a Python cluster, or a JNI decoder here) drops in at
  * `MediaDecodeStub.decode`.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_ref: String, content: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      media_ref: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** STUB decoder: deterministic pseudo-metadata + an 8-dim "feature"
    * derived from content bytes. Replace with a real decoder at the same
    * signature; everything downstream (schema, batching) is unchanged. */
  object MediaDecodeStub {
    def decode(r: MediaRow): MediaMeta = {
      val n = r.content.length
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < n) { h = h * 1099511628211L + (r.content(i) & 0xff); i += 1 }
      val feat = new Array[Float](8)
      var j = 0
      while (j < 8) {
        feat(j) = ((graft.functions.Hashing.splitmix64(h ^ j) >>> 40).toInt / 16777216.0f)
        j += 1
      }
      MediaMeta(r.doc_id, r.media_ref, n.toLong,
        width = 16 + (n % 64), height = 16 + (n % 48),
        n_frames = 1 + (n % 7), feature = feat)
    }
  }

  /** Synthesize a media table from `documents` (UTF-8 bytes of text as the
    * opaque payload) — deterministic, SQL-predictable byte lengths. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit("media://"), col("doc_id")).as("media_ref"),
      encode(col("text"), "UTF-8").as("content"))

  /** Batched per-partition decode (one decoder instance per task; rows
    * stream through — the Spark analogue of mapInPandas batches). */
  def decodeAll(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map(MediaDecodeStub.decode)
    }.toDF()
  }

  /** Metadata projection used by the oracle check (integer-valued). */
  def metaForOracle(media: DataFrame): DataFrame =
    decodeAll(media).select(col("doc_id"), col("media_ref"),
      col("n_bytes"), col("width"), col("height"), col("n_frames"))

  final case class RoutedMeta(
      doc_id: Long, media_ref: String, branch: String,
      n_pages: Int, width: Int, height: Int)

  /** Media-branch routing on media_ref (the north-rule "PDF/layout branch"):
    * *.pdf payloads go to the layout-parse stub (page count), images to the
    * dimension stub, anything else passes through untouched. The routing,
    * schema and batching are real; the parsers are deterministic STUBS
    * (no PDF/image libs in this sandbox). */
  def routeAndParse(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val n = r.content.length
        if (r.media_ref.endsWith(".pdf"))
          RoutedMeta(r.doc_id, r.media_ref, "pdf_layout", 1 + n % 5, 0, 0)
        else if (r.media_ref.endsWith(".jpg") || r.media_ref.endsWith(".png"))
          RoutedMeta(r.doc_id, r.media_ref, "image", 0, 16 + n % 64, 16 + n % 48)
        else
          RoutedMeta(r.doc_id, r.media_ref, "passthrough", 0, 0, 0)
      }
    }.toDF()
  }
}
