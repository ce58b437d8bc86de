package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition (builder-prompt
  * first-class component).
  *
  * The decode itself is a STUB — this container has no image/audio libraries —
  * marked by `decodeStub`, a deterministic fake keyed on payload bytes. What
  * IS real and tested: the typed Dataset schema, the mapPartitions batch
  * shape (decoder init once per partition, rows streamed through it), and the
  * partition-size guidance. Swapping `decodeStub` for a real JNI/FFI decoder
  * changes no plumbing.
  *
  * Scale notes: payloads dominate row size, so partition budgeting is by
  * bytes, not rows — repartition so `sum(n_bytes)/partition ≈ 128–512 MB`.
  * Feature extraction is embarrassingly parallel; the expensive init
  * (model/codec load) amortizes per partition, which is exactly what
  * mapPartitions (or mapInPandas on the Python side) gives.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                           n_frames: Int, checksum: Long)

  /** STUB — stands in for an image/audio decoder (??? in a container with
    * codecs; deterministic fake here so tests pin the plumbing). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (n % 64 + 1, n * 7 % 64 + 1, n % 10 + 1) // (width, height, frames)
  }

  /** documents.text → MediaRecord dataset (text bytes stand in for media). */
  def asMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRecord]
  }

  /** Per-partition feature extraction: decoder state is initialized once per
    * partition, then rows stream through — the real batch shape for any
    * native decoder. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // decoder/codec init would happen HERE, once per partition
      it.map { r =>
        val (w, h, fr) = decodeStub(r.payload)
        val checksum = r.payload.take(8).foldLeft(0L)((a, b) => a + (b & 0xff))
        MediaFeatures(r.doc_id, r.payload.length, w, h, fr, checksum)
      }
    }
  }
}
