package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing — opaque binary payloads with typed metadata,
  * batch feature extraction via typed mapPartitions.
  *
  * The actual media decoders (JPEG/PNG/audio/video) are STUBBED with a
  * deterministic fake: the image/audio libraries are not present in this
  * container. Everything Spark-side is real and tested — binary columns,
  * fixed-size per-partition batching (the shape a native/Python decoder
  * would be fed), typed output schema, determinism. Swapping `decodeStub`
  * for a real decoder changes no plumbing.
  */
object Multimodal {

  /** An opaque media payload row (payload = raw bytes, e.g. jpeg/wav/mp4). */
  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Int,
      sha256: String,
      width: Int,
      height: Int,
      frames: Int,
      embedding: Array[Float])

  val EmbeddingDim = 8

  /** Deterministic fake decode: metadata and a tiny "embedding" derived
    * purely from the payload bytes (SHA-256 — DuckDB-expressible, so the
    * driver's oracle can replay it). REAL DECODER GOES HERE. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val d = MessageDigest.getInstance("SHA-256").digest(row.payload)
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    val width = (d(0) & 0x3f) + 1
    val height = (d(1) & 0x2f) + 1
    val frames = row.modality match {
      case "video" => (d(2) & 0x17) + 1
      case "audio" => (d(2) & 0x07) + 1
      case _       => 1
    }
    val emb = Array.tabulate(EmbeddingDim)(i => ((d(i) & 0xff) - 128) / 128.0f)
    MediaFeatures(row.doc_id, row.modality, row.payload.length, hex,
      width, height, frames, emb)
  }

  /** Batched per-partition extraction: the decoder sees fixed-size batches
    * (what a vectorized/native decoder wants), Spark sees a typed Dataset. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would process N payloads
        // in one native/vectorized call
        batch.iterator.map(decodeStub)
      }
    }
  }
}
