package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A multimodal record: opaque binary payload + typed metadata — the
  * image/audio/video column model for a training-data pipeline.
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

/** Extracted media metadata (the decode output schema). */
case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long,
    n_frames: Long, content_sha: String)

/** Multimodal-column plumbing: treat media as `binary` payloads with typed
  * metadata, decode/feature-extract as a per-partition batch operator.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (dimensions derived from payload bytes — clearly
  * marked below); everything Spark-side is real and tested: the binary
  * schema, the typed `Dataset[MediaRecord]` → `Dataset[MediaMeta]`
  * `mapPartitions` shape (partition-batched, the JVM analog of
  * `mapInPandas`), and the pure-SQL fingerprint/metadata path that the
  * oracle checks. Payload bytes here are the fixture text UTF-8 encoded —
  * the plumbing is payload-agnostic.
  *
  * Scale notes: decode is a map-side `mapPartitions` — zero shuffle; batch
  * amortization happens per partition (the reason `mapInPandas`/Arrow
  * batches exist). Binary payloads stay columnar in parquet; metadata
  * columns prune independently of the payload (a metadata-only query never
  * reads payload bytes).
  */
object MultimodalOps {

  /** The fixture corpus as binary media records (text bytes as payload). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRecord]
  }

  /** STUBBED DECODE — deterministic fake dimensions from byte length (a real
    * deployment swaps this body for an image/audio codec call; signature and
    * batch shape stay identical).
    */
  private def fakeDecode(byteLen: Long): (Long, Long, Long) =
    (64L + byteLen % 512L, 64L + (byteLen * 7L) % 512L, 1L + byteLen % 16L)

  /** Typed per-partition decode: `Dataset[MediaRecord] → Dataset[MediaMeta]`
    * via `mapPartitions` — the partition-batched UDF shape. The ScalaTest
    * suite asserts this path emits exactly the same rows as the SQL path
    * ([[mediaMeta]]), pinning the plumbing.
    */
  def decodeMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val (w, h, f) = fakeDecode(r.payload.length.toLong)
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        digest.reset()
        MediaMeta(r.doc_id, r.payload.length.toLong, w, h, f, sha)
      }
    }
  }

  /** Pure-SQL metadata extraction over the binary column — oracle-checkable
    * (octet_length / sha256 / modular fake dims compute identically in
    * DuckDB). `q_multimodal_meta`.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("content_sha"),
        substring(hex(col("payload")), 1, 32).as("head_hex"))
      .withColumn("width", lit(64L) + col("byte_len") % 512L)
      .withColumn("height", lit(64L) + (col("byte_len") * 7L) % 512L)
      .withColumn("n_frames", lit(1L) + col("byte_len") % 16L)
      .orderBy(col("doc_id").asc)
}
