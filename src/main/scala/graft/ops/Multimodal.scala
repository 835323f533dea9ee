package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque bytes + typed metadata. In a real corpus the
  * blob is an image/audio/video payload; here it is synthesized
  * deterministically from `documents.text` (UTF-8 bytes) so the whole
  * path — binary column, typed Dataset, batched per-partition decode —
  * is real and oracle-checkable even though no codec libraries exist in
  * this container. */
final case class MediaRow(doc_id: Long, kind: String, blob: Array[Byte])

final case class MediaFeatures(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    chk: Long)

/** Multimodal-column plumbing for training-data pipelines.
  *
  * The DECODE STEP IS A STUB (clearly marked below): real image/audio
  * decoding would replace `fakeDecode` with a library call on the same
  * `Array[Byte]`; everything around it — the binary column schema, the
  * typed Dataset, the batch shape (64 blobs per decode call, the shape a
  * vectorized decoder or GPU preprocessor wants), partition-local
  * processing with no shuffle — is the production layout. At 100 TB the
  * blobs live in Parquet binary columns exactly like this, and decode
  * parallelism is partition parallelism. */
object Multimodal {

  val DecodeBatch = 64

  /** Binary media table derived from documents: blob = UTF-8 bytes of
    * text; kind cycles image/audio/video by doc_id. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    TrainOps.docs(spark, sfDir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("blob"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg /
    * ffmpeg. Derives pseudo-metadata from an md5 of the raw bytes, so the
    * DuckDB oracle can recompute it from the same bytes. A real
    * implementation keeps this exact signature: a batch of blobs in, a
    * batch of features out. */
  private def fakeDecode(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(m.blob)
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      MediaFeatures(m.doc_id, m.kind, m.blob.length.toLong,
        (64 + h % 512).toInt, (64 + (h / 512) % 512).toInt, h % 997)
    }

  /** Feature extraction: partition-local, batched — no shuffle; decode
    * cost scales linearly with executors. */
  def extractFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap(g => fakeDecode(g.toSeq))
    }.toDF().orderBy("doc_id")
  }

  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
}
