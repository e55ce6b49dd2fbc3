package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batch over partitions.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container
  * has no media libraries — behind [[MultimodalCodec.decodeStub]], a
  * deterministic fake keyed on the payload bytes. Everything around it
  * is the real Spark shape a production pipeline needs:
  *   - payloads as `BinaryType` columns (never strings — no charset
  *     corruption, parquet stores them raw);
  *   - scalar metadata (byte length, checksum) via codegen'd built-ins;
  *   - batch decode via typed `mapPartitions` (the JVM analogue of
  *     `mapInPandas`: amortizes codec init per partition, streams rows);
  *   - fixed-width feature vectors out, ready for [[Similarity]] ops.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, n_bytes: Long, width: Int,
                        height: Int, features: Array[Float])

  /** Deterministic fake decoder: real codecs are not available in this
    * environment. Derives stable "dimensions" and a 8-dim "feature
    * vector" from the bytes. Swap for a real codec (e.g. TwelveMonkeys
    * ImageIO) in production — the pipeline shape does not change.
    * Dimensions are keyed on the MD5 of the payload (not a JVM-private
    * hash) so the driver's DuckDB oracle can recompute them exactly —
    * the decode output is hash-checked, not just row-counted. */
  object MultimodalCodec {
    def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      val width = 64 + Integer.parseInt(hex.substring(0, 4), 16) % 512
      val height = 64 + Integer.parseInt(hex.substring(4, 8), 16) % 512
      val feats = Array.tabulate(8) { i =>
        val slice = payload.drop(i * (payload.length / 8 max 1))
          .take(payload.length / 8 max 1)
        if (slice.isEmpty) 0.0f
        else slice.map(_ & 0xFF).sum.toFloat / (255.0f * slice.length)
      }
      (width, height, feats)
    }
  }

  /** Build a media table from documents: payload = UTF-8 bytes of the
    * text standing in for an encoded image. The binary column is the
    * real thing; only its contents are synthetic here. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Scalar metadata over the binary column — codegen'd built-ins only;
    * this is the oracle-checked surface (octet_length/md5 are portable). */
  def metadataQuery(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum"))
      .orderBy("doc_id")

  /** Batch decode + feature extraction via typed mapPartitions.
    * Partition-granular: codec state would be initialized once per
    * partition; rows stream through without collecting. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[DecodedRow] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      // (real pipeline: open codec/session here, once per partition)
      rows.map { r =>
        val (w, h, f) = MultimodalCodec.decodeStub(r.payload)
        DecodedRow(r.doc_id, r.payload.length.toLong, w, h, f)
      }
    }
  }

  case class ResizedRow(doc_id: Long, width: Int, height: Int,
                        thumb: Array[Byte])

  /** Batch "resize" via typed mapPartitions — same shape as
    * [[decodeFeatures]]: a real pipeline would decode, scale to
    * (targetW, targetH), and re-encode per partition-initialized codec.
    * The stub downsamples the payload bytes to a fixed-length thumb
    * deterministically (every ceil(n/len)-th byte), so output size and
    * content are stable and testable; swap the body for a real scaler
    * without touching the plumbing. */
  def resizeThumbs(spark: SparkSession, dir: String, targetW: Int,
                   targetH: Int, thumbLen: Int = 64): Dataset[ResizedRow] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      // (real pipeline: codec + scaler initialized here, per partition)
      rows.map { r =>
        val n = r.payload.length
        val step = math.max(1, n / thumbLen)
        val thumb = Array.tabulate(math.min(thumbLen, n))(i =>
          r.payload(math.min(i.toLong * step, (n - 1).toLong).toInt))
        ResizedRow(r.doc_id, targetW, targetH, thumb)
      }
    }
  }

  /** "Frame sampling" analogue over binary payloads: take fixed-offset
    * byte slices (as a video frame sampler takes every k-th frame).
    * Pure built-ins — substring works on BinaryType. */
  def sampleSlices(spark: SparkSession, dir: String, sliceLen: Int,
                   nSlices: Int): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(nSlices - 1)),
          i => substring(col("payload"),
            (i * sliceLen + 1).cast("int"), lit(sliceLen))).as("slices"))
}
