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

    // Resize + frame-sample plumbing (the remaining two media
    // transforms of the builder-prompt quartet). The payload domain is
    // text bytes, so the stubs are honest byte/token arithmetic with
    // the REAL pipeline shape: "resize" = 2× downsample by keeping
    // odd-position chars (one regexp pass — `(.).`→`$1` has identical
    // semantics in Java regex and RE2, including the kept trailing odd
    // char); "frame sample" = every 4th token. Both are scan-fused
    // map work; outputs are fingerprints + sizes, never the media
    // bytes — at 100 TB sampled frames ship as narrow feature rows.
    Q("multimodal_resize_sample",
      """WITH r AS (
        |  SELECT doc_id, text,
        |         regexp_replace(text, '(.).', '\1', 'g') AS resized,
        |         string_split(text, ' ') AS l
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, text, resized,
        |         array_to_string(list_transform(range(1, len(l) + 1, 4), i -> l[i]), ' ') AS frames,
        |         CAST(len(range(1, len(l) + 1, 4)) AS BIGINT) AS n_frames
        |  FROM r)
        |SELECT doc_id,
        |       length(text) AS orig_chars,
        |       length(resized) AS resized_chars,
        |       CAST(concat('0x', substr(md5(resized), 1, 8)) AS BIGINT) AS resized_fp,
        |       n_frames,
        |       CAST(concat('0x', substr(md5(frames), 1, 8)) AS BIGINT) AS frames_fp
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      def fp(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c), 1, 8), 16, 10).cast("long")
      val toks = split(col("text"), " ")
      val frameIdx = sequence(lit(1), size(toks), lit(4))
      Tables.documents(s, dir)
        .withColumn("resized", regexp_replace(col("text"), "(.).", "$1"))
        .withColumn("frames",
          array_join(transform(frameIdx, i => element_at(toks, i)), " "))
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("orig_chars"),
          length(col("resized")).cast("long").as("resized_chars"),
          fp(col("resized")).as("resized_fp"),
          size(frameIdx).cast("long").as("n_frames"),
          fp(col("frames")).as("frames_fp"))
        .orderBy("doc_id")
    },
  )
}
