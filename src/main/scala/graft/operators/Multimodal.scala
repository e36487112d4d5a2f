package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.model.{Portable, Tables}

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata. The container has no image/audio codecs, so DECODE IS A
  * DETERMINISTIC STUB — dimensions are derived from the content hash — but
  * the Spark-side plumbing (schema, batch-shaped partition iteration,
  * column contracts) is real and exercised both ways:
  *
  *  - [[meta]]: pure column algebra (the oracle-checked query);
  *  - [[metaMapPartitions]]: the `mapPartitions` variant shaped exactly like
  *    a real decoder (per-partition init, fixed-size batches) — the seam
  *    where an image library or a Pandas-UDF-style vectorized decode plugs
  *    in. Spec-tested equal to [[meta]].
  */
object Multimodal {
  import Portable._

  val BatchSize = 64

  /** The blob fixture: document text bytes standing in for media content. */
  private def blobs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_kind"))

  def meta(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir)
      .withColumn("content_hash", md5(col("blob")))
      .withColumn("h", hex2big(col("content_hash")))
      .select(
        col("doc_id"), col("media_kind"),
        expr("octet_length(blob)").as("n_bytes"),
        col("content_hash"),
        (col("h") % 1024 + 16).cast("int").as("width"),
        (expr("h div 1024") % 1024 + 16).cast("int").as("height"),
        lit(3).as("channels"))

  private val metaSql: String =
    s"""WITH blobs AS (
       |  SELECT doc_id, text, encode(text) AS blob,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_kind
       |  FROM documents
       |),
       |hashed AS (
       |  -- DuckDB's md5 is VARCHAR-only; the blob is utf-8 text bytes, so
       |  -- md5(text) is the same digest Spark computes over the binary.
       |  SELECT doc_id, media_kind, blob, md5(text) AS content_hash,
       |         ${hex2bigSql("md5(text)")} AS h
       |  FROM blobs
       |)
       |SELECT doc_id, media_kind,
       |       CAST(octet_length(blob) AS INT) AS n_bytes,
       |       content_hash,
       |       CAST(h % 1024 + 16 AS INT) AS width,
       |       CAST((h // 1024) % 1024 + 16 AS INT) AS height,
       |       3 AS channels
       |FROM hashed""".stripMargin

  /** The pluggable decode seam: iterate each partition in fixed-size batches
    * (real decoders amortize codec init per partition and vectorize per
    * batch — same shape as `mapInPandas`). The stub derives dimensions from
    * the md5, matching [[meta]] bit-for-bit; replace `decodeBatch` with a
    * real codec call to productionize.
    */
  def metaMapPartitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = blobs(spark, dir)
      .select(col("doc_id"), col("blob"), col("media_kind"))
      .as[(Long, Array[Byte], String)]
    rows.mapPartitions { it =>
      // per-partition init (a real decoder opens its codec context here)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { case (id, blob, kind) =>
          md.reset()
          val hex = md.digest(blob).map("%02x".format(_)).mkString
          val h = java.lang.Long.parseLong(hex.take(15), 16)
          (id, kind, blob.length, hex,
            (h % 1024 + 16).toInt, (h / 1024 % 1024 + 16).toInt, 3)
        }
      }
    }.toDF("doc_id", "media_kind", "n_bytes", "content_hash",
      "width", "height", "channels")
  }

  /** Frame sampling for video blobs: a deterministic stub standing in for
    * "decode container, sample N frames evenly" — duration and fps derive
    * from the content, the sample grid is uniform in integer milliseconds.
    * The real decoder replaces the duration/fps derivation only; the
    * explode + grid shape (what a training pipeline joins against) is the
    * operator.
    */
  val MaxFrames = 16

  def frames(spark: SparkSession, dir: String): DataFrame =
    meta(spark, dir)
      .filter(col("media_kind") === "video")
      .withColumn("duration_ms", (col("n_bytes") * 10 + 1000).cast("long"))
      .withColumn("fps", (col("width") % 4 + 1).cast("long"))
      .withColumn("n_frames",
        least(expr("duration_ms * fps div 1000"), lit(MaxFrames.toLong)))
      .select(col("doc_id"), col("duration_ms"), col("fps"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"),
        col("n_frames"))
      .select(col("doc_id"), col("duration_ms"), col("fps"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * expr("duration_ms div n_frames")).as("frame_ts_ms"))

  private val framesSql: String =
    s"""WITH blobs AS (
       |  SELECT doc_id, text, encode(text) AS blob
       |  FROM documents WHERE doc_id % 3 = 2
       |),
       |m AS (
       |  SELECT doc_id,
       |         CAST(octet_length(blob) * 10 + 1000 AS BIGINT) AS duration_ms,
       |         CAST((${hex2bigSql("md5(text)")} % 1024 + 16) % 4 + 1 AS BIGINT) AS fps
       |  FROM blobs
       |),
       |f AS (
       |  SELECT doc_id, duration_ms, fps,
       |         least(duration_ms * fps // 1000, $MaxFrames) AS n_frames
       |  FROM m
       |)
       |SELECT doc_id, duration_ms, fps,
       |       CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS frame_idx,
       |       CAST(unnest(generate_series(0, n_frames - 1)) * (duration_ms // n_frames) AS BIGINT) AS frame_ts_ms
       |FROM f""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("multimodal_meta", meta, Some(metaSql)),
    Op("multimodal_frames", frames, Some(framesSql))
  )
}
