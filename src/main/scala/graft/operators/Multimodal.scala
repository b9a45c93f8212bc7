package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[StubCodec]]); everything around it
  * — binary schema, typed Dataset plumbing, partition-iterator batch
  * shape, frame explosion — is real and oracle-tested. Payloads are
  * synthesized from `documents.text` (UTF-8 bytes) so the oracle can
  * reproduce byte lengths and digests.
  *
  * Scale notes: per-row decode runs inside `mapPartitions` so a real codec
  * would amortize init per PARTITION (the per-row-UDF anti-pattern
  * re-initializes per row); frames explode through a generator, never a
  * collect.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, n_frames: Long,
      width: Long, height: Long, head_char: String)

  val FrameBytes = 256

  /** Synthesized media table: payload = UTF-8 bytes of the document text,
    * kind round-robins image/audio/video. */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** The stubbed codec: deterministic pseudo-decode of a payload.
    * A real deployment would replace [[decode]] with an actual codec call
    * — the signature (bytes in, features out, called per partition batch)
    * is the real contract. */
  object StubCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val n = row.payload.length.toLong
      // fake dimensions derived from content length — stands in for a
      // parsed header; deterministic so the oracle can replicate
      val width = 16L * (1L + n % 64L)
      val height = 16L * (1L + n % 48L)
      val frames = n / FrameBytes + 1L
      val head = if (row.payload.isEmpty) "" else new String(row.payload, 0, 1, "UTF-8")
      MediaFeatures(row.doc_id, row.kind, n, frames, width, height, head)
    }
  }

  /** Feature extraction over the binary column — mapPartitions so codec
    * init (here: none) amortizes per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would init here, once per partition
      rows.map(StubCodec.decode)
    }
  }

  /** Oracled query: metadata + stub-decoded features per media row. */
  def mmExtractFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(media(spark, dir)).toDF().orderBy(col("doc_id"))

  val mmExtractFeaturesSql: String = """
    SELECT doc_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) // 256 + 1 AS n_frames,
           16 * (1 + octet_length(encode(text)) % 64) AS width,
           16 * (1 + octet_length(encode(text)) % 48) AS height,
           substring(text, 1, 1) AS head_char
    FROM documents ORDER BY doc_id"""

  /** Frame sampling for "video" rows: every FrameBytes-sized chunk becomes
    * a (doc_id, frame_idx, frame_digest) row via a generator explode. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 2) // the "video" rows
    docs
      .withColumn("last_frame", expr(s"cast((length(text) - 1) div $FrameBytes as bigint)"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("last_frame"))).as("frame_idx"))
      // md5 over the frame's character slice (ASCII corpus: chars == bytes)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("text").substr((col("frame_idx") * FrameBytes + 1).cast("int"),
          lit(FrameBytes))).as("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmFrameSampleSql: String = s"""
    SELECT doc_id, frame_idx,
           md5(substring(text, (frame_idx * $FrameBytes + 1)::INT, $FrameBytes)) AS frame_digest
    FROM (
      SELECT doc_id, text, unnest(range(0, (length(text) - 1) // $FrameBytes + 1)) AS frame_idx
      FROM documents WHERE doc_id % 3 = 2)
    ORDER BY doc_id, frame_idx"""
}
