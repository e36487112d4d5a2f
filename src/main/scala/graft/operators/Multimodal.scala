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

  def ops: Seq[Op] = Seq(
    Op("multimodal_meta", meta, Some(metaSql))
  )
}
