package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal column plumbing (builder-prompt component): media as an
  * opaque `binary` payload column + typed metadata, with
  * decode/feature-extract as a partition-batched typed transform.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decoder (clearly marked) — the Spark-side
  * contract is real and tested: schema (binary payload + metadata
  * struct), per-partition batching via `mapPartitions` (the shape a
  * vectorized decode UDF needs: amortize codec init per batch, stream
  * rows, never materialize a partition), and a typed output row. At
  * 100 TB payloads stay columnar at rest (parquet binary), the decode
  * stage is map-only, and feature rows are narrow — the expensive
  * bytes never shuffle.
  */
object Multimodal {

  /** Typed decoded-feature row (what a real image/audio decoder would
    * emit: dimensions + a small feature summary, never the raw bytes). */
  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Long,
      mean_byte: Double,
      head_hex: String)

  /** Attach the opaque payload + typed metadata (UTF-8 text bytes stand
    * in for an image/audio blob). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("media_meta"))

  /** STUB decoder — deterministic fake standing in for a codec
    * (image decode / audio resample / frame sample). Real per-batch
    * shape: one iterator pass, codec state initialized once per
    * partition, constant memory. */
  def decodeStub(spark: SparkSession, withBlob: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    withBlob.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // (a real decoder would open its codec context here, once)
        rows.map { case (id, bytes) =>
          MediaFeature(
            doc_id = id,
            n_bytes = bytes.length.toLong,
            mean_byte = if (bytes.isEmpty) 0.0
            // Long accumulator: an Int sum wraps negative past ~8 MB of
            // 0xFF bytes, and real media payloads exceed that
            else math.rint(bytes.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble /
              bytes.length * 1e6) / 1e6,
            head_hex = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString)
        }
      }
  }

  val defs: Seq[Q] = Seq(

    // Binary-column plumbing stats — oracle-checked (DuckDB encode()
    // gives the same UTF-8 bytes).
    Q("multimodal_blob_stats",
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       ascii(substr(text, 1, 1)) AS first_byte,
        |       'application/octet-stream' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      withPayload(Tables.documents(s, dir)).select(
        col("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        ascii(col("payload").cast("string")).as("first_byte"),
        col("media_meta.mime").as("mime"))
        .orderBy("doc_id")
    },

    // Typed mapPartitions decode path (stubbed codec) — no oracle;
    // MultimodalSpec cross-checks mean_byte/head_hex against
    // independently computed values.
    Q.noOracle("multimodal_decode_features") { (s, dir) =>
      decodeStub(s, withPayload(Tables.documents(s, dir))).toDF().orderBy("doc_id")
    },
  )
}
