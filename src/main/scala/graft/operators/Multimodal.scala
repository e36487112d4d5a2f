package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The blob projection over an arbitrary documents frame — row-local,
    * so it runs unchanged on a document STREAM (`stream_phash`).
    */
  private[graft] def blobsFrom(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_kind"))

  /** The blob fixture: document text bytes standing in for media content. */
  private def blobs(spark: SparkSession, dir: String): DataFrame =
    blobsFrom(Tables.documents(spark, dir))

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

  // ------------------------------------------------- real-codec seam (r13)

  /** The SAME seam with a REAL codec: `javax.imageio` ships in the JDK
    * (no external dependency), so the decode→resize→features chain can be
    * proven with genuine PNG bytes — Round13Spec plants solid-color
    * fixtures with known pixels and asserts dims and channel means. The
    * oracle-gated bulk path keeps the deterministic digest stub (the
    * fixture blobs are text, not media); these kernels are what replaces
    * each stub's derivation when real media arrives, with schema and
    * batch shape identical.
    */
  /** ImageIO.read returns NULL (not an exception) for bytes no installed
    * codec claims — surface that as a named error carrying the row key,
    * not an opaque executor NPE three operators downstream.
    */
  private def decodeOrFail(id: Long, blob: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    if (img == null) throw new IllegalArgumentException(
      s"doc_id=$id: undecodable image blob (${blob.length} bytes, no codec matched)")
    img
  }

  private[graft] def decodeImageMeta(spark: SparkSession,
      pngBlobs: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = pngBlobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
    rows.mapPartitions { it =>
      // per-partition init amortizes in a real pipeline; ImageIO readers
      // are created per call (they are not thread-safe to share)
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { case (id, blob) =>
          val img = decodeOrFail(id, blob)
          (id, blob.length, img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents)
        }
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "channels")
  }

  /** Aspect-fit RASTER resize — the real pixel kernel behind [[resize]]'s
    * geometry: the SAME exact-integer output dims, then an actual
    * Graphics2D scale; emits the resized raster's per-channel means so
    * the spec can pin pixel correctness (a solid color must survive
    * scaling exactly).
    */
  private[graft] def resizeImage(spark: SparkSession, pngBlobs: DataFrame,
      box: Int = ResizeBox): DataFrame = {
    import spark.implicits._
    val rows = pngBlobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { case (id, blob) =>
          val img = decodeOrFail(id, blob)
          val (w, h) = (img.getWidth, img.getHeight)
          val (ow, oh) = if (w >= h) (box, h * box / w) else (w * box / h, box)
          val out = new java.awt.image.BufferedImage(ow, oh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.drawImage(img, 0, 0, ow, oh, null)
          g.dispose()
          var (sr, sg, sb) = (0L, 0L, 0L)
          // bulk row read: per-pixel getRGB pays a color-model conversion
          // per call — one getRGB(int[]) per image is ~an order faster
          val px = out.getRGB(0, 0, ow, oh, null, 0, ow)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          val n = ow.toLong * oh
          (id, ow, oh, math.max(w, h) < box, sr / n, sg / n, sb / n)
        }
      }
    }.toDF("doc_id", "out_w", "out_h", "upscaled", "mean_r", "mean_g", "mean_b")
  }

  /** Real feature lanes from decoded pixels — a drop-in for [[features]]'
    * digest stub: per-channel means scaled to the 16-bit lane width
    * (×257 maps 0..255 onto 0..65535 exactly; scale-before-divide keeps
    * the sub-integer mean resolution the lane has room for), dims/bytes in the
    * remaining lanes. Same wide f0..f7 shape the ANN family consumes.
    */
  private[graft] def imageFeatures(spark: SparkSession,
      pngBlobs: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = pngBlobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { case (id, blob) =>
          val img = decodeOrFail(id, blob)
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          val n = w.toLong * h
          (id, sr * 257 / n, sg * 257 / n, sb * 257 / n,
            w.toLong, h.toLong, img.getColorModel.getNumComponents.toLong,
            blob.length.toLong % 65536)
        }
      }
    }.toDF("doc_id", "f0", "f1", "f2", "f3", "f4", "f5", "f6")
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

  // ------------------------------------------------------------------ resize

  /** Aspect-fit resize planning into the training canvas: the geometry a
    * pipeline actually joins and filters on — output dims, upscale flag —
    * in EXACT integer math (long side pinned to [[ResizeBox]], short side
    * floor-scaled), so both engines agree without any float rounding. The
    * pixel kernel itself is the same pluggable seam as decode
    * ([[metaMapPartitions]]); a real resizer changes no column contract.
    */
  val ResizeBox = 224

  def resize(spark: SparkSession, dir: String): DataFrame =
    meta(spark, dir)
      .select(col("doc_id"), col("media_kind"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(ResizeBox))
          .otherwise(expr(s"width * $ResizeBox div height")).cast("int").as("out_w"),
        when(col("width") >= col("height"), expr(s"height * $ResizeBox div width"))
          .otherwise(lit(ResizeBox)).cast("int").as("out_h"),
        (greatest(col("width"), col("height")) < ResizeBox).as("upscaled"))

  private val resizeSql: String =
    s"""SELECT doc_id, media_kind, width, height,
       |       CAST(CASE WHEN width >= height THEN $ResizeBox
       |                 ELSE width * $ResizeBox // height END AS INT) AS out_w,
       |       CAST(CASE WHEN width >= height THEN height * $ResizeBox // width
       |                 ELSE $ResizeBox END AS INT) AS out_h,
       |       greatest(width, height) < $ResizeBox AS upscaled
       |FROM ($metaSql)""".stripMargin

  // ---------------------------------------------------------------- features

  /** Feature extraction: a fixed-length per-blob feature vector in
    * FIXED-POINT integer lanes (16 bits each, the repo's no-float-sums
    * policy) — here derived deterministically from the content digest,
    * because the container ships no codecs; a real extractor (CLIP
    * embedding, mel-spectrogram stats, ...) replaces the digest derivation
    * at the [[metaMapPartitions]] seam and keeps the schema. Wide form
    * (f0..f7) so a downstream `array(f0, ..)` feeds the ANN family
    * directly.
    */
  val FeatureDims = 8

  /** 4-hex-digit chunk of a hex column -> 0..65535, both engines. */
  private def hexChunk(h: Column, start: Int): Column =
    conv(substring(h, start, 4), 16, 10).cast("long")

  private def hexChunkSql(h: String, start: Int): String =
    "CAST(" + (0 until 4).map { k =>
      s"(strpos('0123456789abcdef', substr($h, ${start + k}, 1)) - 1) * ${BigInt(16).pow(3 - k)}"
    }.mkString(" + ") + " AS BIGINT)"

  /** The lane projection over an arbitrary blob frame — row-local, so it
    * runs unchanged on a STREAM ([[blobsFrom]]'s streaming counterpart).
    */
  private[graft] def featuresFrom(blobsDf: DataFrame): DataFrame = {
    val hashed = blobsDf.withColumn("content_hash", md5(col("blob")))
    hashed.select(
      col("doc_id") +: col("media_kind") +:
        (0 until FeatureDims).map(k =>
          hexChunk(col("content_hash"), k * 4 + 1).as(s"f$k")): _*)
  }

  def features(spark: SparkSession, dir: String): DataFrame =
    featuresFrom(blobs(spark, dir))

  private val featuresSql: String =
    s"""WITH blobs AS (
       |  SELECT doc_id, md5(text) AS content_hash,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_kind
       |  FROM documents
       |)
       |SELECT doc_id, media_kind,
       |       ${(0 until FeatureDims).map(k => s"${hexChunkSql("content_hash", k * 4 + 1)} AS f$k").mkString(",\n       ")}
       |FROM blobs""".stripMargin

  // ------------------------------------------------- multimodal_decode_real

  /** Planted-PNG dial: dims land in [144, 303] so the fixture CROSSES the
    * [[ResizeBox]]=224 boundary — both up- and down-scales exercise the
    * real raster kernel, and the `upscaled` flag carries signal.
    */
  val PlantDimMod = 160
  val PlantDimBase = 144

  /** Deterministic REAL-PNG fixture: each doc's text digest seeds a solid
    * `(pr, pg, pb)` image of `(pw × ph)` pixels, encoded row-locally into
    * genuine PNG bytes with `javax.imageio` — the blobs the real-codec
    * seam decodes back. Solid color is the point: every derived quantity
    * (dims, aspect-fit geometry, per-channel means, feature lanes) is
    * EXACTLY recomputable from the digest alone, so DuckDB can oracle the
    * whole decode→resize→features chain without any codec.
    */
  private[graft] def plantedPngBlobs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mm = PlantDimMod.toLong
    val seeds = Tables.documents(spark, dir)
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("h", hex2big(md5(col("blob"))))
      .select(col("doc_id"),
        (col("h") % mm + PlantDimBase).cast("int").as("pw"),
        (expr(s"h div $mm") % mm + PlantDimBase).cast("int").as("ph"),
        (expr(s"h div ${mm * mm}") % 256).cast("int").as("pr"),
        (expr(s"h div ${mm * mm * 256L}") % 256).cast("int").as("pg"),
        (expr(s"h div ${mm * mm * 256L * 256L}") % 256).cast("int").as("pb"))
      .as[(Long, Int, Int, Int, Int, Int)]
      // the documents parquet is a handful of files; left alone, every
      // pixel loop downstream runs on that few cores. The seed rows are
      // six ints — repartitioning them is free, and spreads the codec
      // work across the executor threads
      .repartition(spark.sparkContext.defaultParallelism)
    seeds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { case (id, w, h, r, g, b) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gfx = img.createGraphics()
          gfx.setColor(new java.awt.Color(r, g, b))
          gfx.fillRect(0, 0, w, h)
          gfx.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
    }.toDF("doc_id", "blob")
  }

  /** `multimodal_decode_real`: the REAL-codec chain as an oracle-gated
    * operator — genuine PNG encode ([[plantedPngBlobs]]) → genuine decode
    * ([[decodeImageMeta]]) → genuine raster resize ([[resizeImage]]) →
    * genuine pixel features ([[imageFeatures]]), with every output column
    * an exact integer DuckDB recomputes from the planting digest (solid
    * color: the means ARE the planted color, the aspect-fit dims are the
    * `resize` integer formula, the lanes are mean×257). This is the r13
    * spec-only javax.imageio seam promoted to a driver-gated key: if any
    * kernel drifted (codec, interpolation, truncation), the hash check
    * goes red.
    *
    * Plan shape: three row-local mapPartitions passes over the planted
    * frame (encode is recomputed per kernel — lineage, no pin), then two
    * |docs|-row joins on doc_id. No data-sized exchange beyond those.
    */
  def decodeReal(spark: SparkSession, dir: String): DataFrame = {
    val blobs = plantedPngBlobs(spark, dir)
    val metaDf = decodeImageMeta(spark, blobs)
      .select(col("doc_id"), col("width"), col("height"), col("channels"))
    val rz = resizeImage(spark, blobs)
      .select(col("doc_id"), col("out_w"), col("out_h"), col("upscaled"),
        col("mean_r"), col("mean_g"), col("mean_b"))
    val ft = imageFeatures(spark, blobs)
      .select(col("doc_id"), col("f0"), col("f1"), col("f2"))
    metaDf.join(rz, Seq("doc_id")).join(ft, Seq("doc_id"))
  }

  private val decodeRealSql: String = {
    val mm = PlantDimMod.toLong
    s"""WITH ph AS (
       |  SELECT doc_id, ${hex2bigSql("md5(text)")} AS h FROM documents
       |),
       |geo AS (
       |  SELECT doc_id,
       |         CAST(h % $mm + $PlantDimBase AS INT) AS width,
       |         CAST((h // $mm) % $mm + $PlantDimBase AS INT) AS height,
       |         3 AS channels,
       |         CAST((h // ${mm * mm}) % 256 AS BIGINT) AS pr,
       |         CAST((h // ${mm * mm * 256L}) % 256 AS BIGINT) AS pg,
       |         CAST((h // ${mm * mm * 256L * 256L}) % 256 AS BIGINT) AS pb
       |  FROM ph
       |)
       |SELECT doc_id, width, height, channels,
       |       CAST(CASE WHEN width >= height THEN $ResizeBox
       |                 ELSE width * $ResizeBox // height END AS INT) AS out_w,
       |       CAST(CASE WHEN width >= height THEN height * $ResizeBox // width
       |                 ELSE $ResizeBox END AS INT) AS out_h,
       |       greatest(width, height) < $ResizeBox AS upscaled,
       |       pr AS mean_r, pg AS mean_g, pb AS mean_b,
       |       pr * 257 AS f0, pg * 257 AS f1, pb * 257 AS f2
       |FROM geo""".stripMargin
  }

  // --------------------------------------------------------- multimodal_dedup

  /** Content-hash dedup WITHIN each modality — the first stage every
    * image/audio corpus pipeline runs (byte-identical re-crawls and
    * mirror copies dominate media duplication; perceptual near-dup comes
    * after and plugs into the same seam the decoder does). Groups on
    * md5(blob) per media_kind, keeps the lowest doc_id as canonical.
    * Scale shape: digests are computed map-side and ONE exchange on
    * (media_kind, content_hash) carries 16-byte hashes + ids — blob
    * bytes never cross the wire.
    */
  def dedupBlobs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_kind", "content_hash")
    blobs(spark, dir)
      .withColumn("content_hash", md5(col("blob")))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col("doc_id"), col("media_kind"), col("content_hash"),
        col("canonical_id"), col("n_copies"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  private val dedupBlobsSql: String =
    s"""WITH blobs AS (
       |  SELECT doc_id, md5(text) AS content_hash,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_kind
       |  FROM documents
       |)
       |SELECT doc_id, media_kind, content_hash,
       |       CAST(min(doc_id) OVER w AS BIGINT) AS canonical_id,
       |       CAST(count(*) OVER w AS BIGINT) AS n_copies,
       |       doc_id = min(doc_id) OVER w AS keep
       |FROM blobs
       |WINDOW w AS (PARTITION BY media_kind, content_hash)""".stripMargin

  // --------------------------------------------------------- multimodal_phash

  /** Perceptual hash width: top byte of each of the first [[PhashLanes]]
    * feature lanes → a 48-bit hash. */
  val PhashLanes = 6
  /** Banding for the near-dup self-join: 4 × 12-bit bands — pigeonhole
    * complete for hamming ≤ [[PhashMaxHam]]. */
  val PhashBands = 4
  val PhashMaxHam = 3
  /** Every [[PhashPlantMod]]-th blob is re-emitted with one feature-lane
    * bit perturbed (the near-duplicate plant — a re-encode/resize of the
    * same content under a real extractor). */
  val PhashPlantMod = 12
  val PhashPlantBase = 3000000L

  /** Perceptual near-dup WITHIN each modality — the stage after
    * `multimodal_dedup`: byte-identical copies hash equal, but re-encodes,
    * resizes and watermarked variants do not; a PERCEPTUAL hash (top bits
    * of the feature lanes, here the digest-derived stub lanes —
    * [[features]]' real-extractor seam supplies pHash/aHash bits in
    * production) changes only a few bits under such perturbations. The
    * detection is the SimHash machinery applied to media: [[PhashBands]]
    * bands of the 48-bit hash, self-join per (media_kind, band, sig) —
    * pigeonhole-complete for hamming ≤ [[PhashMaxHam]] — then an exact
    * `bit_count(xor)` re-check. The fixture plants a 1-bit-perturbed copy
    * of every 12th blob so recall is observable; byte-identical texts
    * surface at hamming 0. Scale shape: banded, never all-pairs; the only
    * exchanges carry 8-byte hashes + ids, never blobs.
    */
  /** The banded phash frame `(doc_id, media_kind, phash, band, sig)` —
    * shared by [[phashPairs]] and `sketch_occupancy`'s `phash_band`
    * family so the audited buckets are exactly the joined ones.
    */
  /** The banded projection over a lane frame — PURE row-local algebra
    * (plant, hash, band explode), so it runs unchanged on a STREAM
    * (`stream_phash`). The plant-collision guard lives in the batch
    * wrapper [[phashBanded]] (an eager agg has no streaming form; the
    * live path inherits the batch-audited fixture).
    */
  private[graft] def bandedFrom(lanes: DataFrame): DataFrame = {
    val planted = lanes.filter(col("doc_id") % PhashPlantMod === 0)
      .withColumn("doc_id", col("doc_id") + PhashPlantBase)
      .withColumn("f3", expr("CAST(f3 ^ 256 AS BIGINT)"))
    val hashed = lanes.unionByName(planted)
      .withColumn("phash", expr((0 until PhashLanes)
        .map(k => s"(f$k DIV 256) * ${1L << (8 * k)}L").mkString(" + ")))
    hashed.select(col("doc_id"), col("media_kind"), col("phash"),
      explode(array((0 until PhashBands).map(j =>
        struct(lit(j).as("band"),
          expr(s"(phash DIV ${1L << (12 * j)}L) % 4096").as("sig"))): _*)).as("bs"))
      .select(col("doc_id"), col("media_kind"), col("phash"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  private[graft] def phashBanded(spark: SparkSession, dir: String): DataFrame = {
    val lanes = features(spark, dir)
    // plant ids live above every real doc_id; a fixture grown past the
    // base would silently collide planted with genuine documents in BOTH
    // engines — fail loudly instead (one scalar agg over the lane frame)
    val maxId = lanes.agg(max("doc_id")).head.getLong(0)
    require(maxId < PhashPlantBase,
      s"multimodal_phash: max(doc_id)=$maxId >= plant base $PhashPlantBase — " +
        "raise PhashPlantBase before running against this fixture")
    bandedFrom(lanes)
  }

  /** The candidate join + exact recheck over a banded frame — shared by
    * the batch [[phashPairs]] and `stream_phash`'s drained-state readoff.
    */
  private[graft] def pairsFromBanded(banded: DataFrame): DataFrame =
    banded.as("a").join(banded.as("b"),
        col("a.media_kind") === col("b.media_kind") &&
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.media_kind").as("media_kind"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(pa ^ pb) AS INT)"))
      .filter(col("hamming") <= PhashMaxHam)
      .select("doc_a", "doc_b", "media_kind", "hamming")

  def phashPairs(spark: SparkSession, dir: String): DataFrame =
    pairsFromBanded(phashBanded(spark, dir))

  /** The banded phash frame as prefix-parameterized CTEs (final CTE =
    * `${p}b`) — composed by the `multimodal_phash` oracle AND
    * `sketch_occupancy`'s `phash_band` family, so the audited buckets
    * cannot drift from the joined ones.
    */
  private[graft] def phashBandCtes(p: String): String = {
    val laneCols = (0 until FeatureDims)
      .map(k => s"${hexChunkSql("md5(text)", k * 4 + 1)} AS f$k").mkString(",\n       |       ")
    val phashExpr = (0 until PhashLanes)
      .map(k => s"(f$k // 256) * ${1L << (8 * k)}").mkString(" + ")
    val bandSelects = (0 until PhashBands).map(j =>
      s"SELECT doc_id, media_kind, phash, $j AS band, (phash // ${1L << (12 * j)}) % 4096 AS sig FROM ${p}h")
      .mkString("\n       |  UNION ALL\n       |  ")
    s"""${p}l AS (
       |  SELECT doc_id,
       |       CASE WHEN doc_id % 3 = 0 THEN 'image'
       |            WHEN doc_id % 3 = 1 THEN 'audio'
       |            ELSE 'video' END AS media_kind,
       |       $laneCols
       |  FROM documents
       |),
       |${p}all AS (
       |  SELECT doc_id, media_kind, f0, f1, f2, f3, f4, f5 FROM ${p}l
       |  UNION ALL
       |  SELECT doc_id + $PhashPlantBase, media_kind,
       |         f0, f1, f2, CAST(xor(f3, 256) AS BIGINT), f4, f5
       |  FROM ${p}l WHERE doc_id % $PhashPlantMod = 0
       |),
       |${p}h AS (
       |  SELECT doc_id, media_kind, CAST($phashExpr AS BIGINT) AS phash FROM ${p}all
       |),
       |${p}b AS (
       |  $bandSelects
       |)""".stripMargin
  }

  /** The banded candidate-pair CTE `ph_p` (expects `ph_b` in scope) —
    * shared by the `multimodal_phash` and `multimodal_phash_cluster`
    * oracles so the pair definition cannot drift from the clustered one.
    */
  private val phashPairCte: String =
    s"""ph_p AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.media_kind AS media_kind, a.phash AS pa, b.phash AS pb
       |  FROM ph_b a JOIN ph_b b
       |    ON a.media_kind = b.media_kind AND a.band = b.band
       |   AND a.sig = b.sig AND a.doc_id < b.doc_id
       |)""".stripMargin

  private[graft] lazy val phashPairsSql: String =
    s"""WITH ${phashBandCtes("ph_")},
       |$phashPairCte
       |SELECT doc_a, doc_b, media_kind,
       |       CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
       |FROM ph_p
       |WHERE bit_count(xor(pa, pb)) <= $PhashMaxHam""".stripMargin

  // ------------------------------------------------- multimodal_phash_cluster

  /** Near-dup GROUPS from the perceptual pairs — `dedup_cluster`'s stage
    * applied to media: connected components over `multimodal_phash`'s
    * hamming-≤[[PhashMaxHam]] edges via the SAME pointer-doubled
    * [[graft.operators.Dedup.componentsFrom]] engine, so a CHAIN of
    * re-encodes/resizes (A≈B, B≈C but A-C past the pair threshold)
    * collapses to one canonical representative (keep = lowest id).
    * Universe = every hashed blob including the planted perturbations, so
    * singletons keep themselves; pairs are within-modality, so components
    * never bridge modalities. Scale shape inherits the banded pair join
    * and the O(log diameter) label loop — exchanges carry ids only.
    */
  def phashCluster(spark: SparkSession, dir: String): DataFrame =
    Dedup.componentsFrom(spark, dir,
      phashPairs(spark, dir).select("doc_a", "doc_b"),
      "doc_a", "doc_b",
      phashBanded(spark, dir).select("doc_id").distinct(),
      "doc_id", "phash_labels")

  private lazy val phashClusterSql: String =
    s"""WITH RECURSIVE ${phashBandCtes("ph_")},
       |$phashPairCte,
       |ph_pairs AS (
       |  SELECT doc_a, doc_b FROM ph_p
       |  WHERE bit_count(xor(pa, pb)) <= $PhashMaxHam
       |),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM ph_pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM ph_pairs
       |),
       |reach(v, r) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.v, reach.r FROM edges e JOIN reach ON reach.v = e.u
       |),
       |comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY 1),
       |m AS (
       |  SELECT h.doc_id, coalesce(c.cluster_id, h.doc_id) AS cluster_id
       |  FROM ph_h h LEFT JOIN comp c ON h.doc_id = c.v
       |),
       |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members FROM m GROUP BY 1)
       |SELECT m.doc_id, m.cluster_id, s.n_members,
       |       m.doc_id = m.cluster_id AS keep
       |FROM m JOIN sizes s USING (cluster_id)""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("multimodal_phash", phashPairs, Some(phashPairsSql)),
    Op("multimodal_phash_cluster", phashCluster, Some(phashClusterSql)),
    Op("multimodal_meta", meta, Some(metaSql)),
    Op("multimodal_decode_real", decodeReal, Some(decodeRealSql)),
    Op("multimodal_frames", frames, Some(framesSql)),
    Op("multimodal_resize", resize, Some(resizeSql)),
    Op("multimodal_features", features, Some(featuresSql)),
    Op("multimodal_dedup", dedupBlobs, Some(dedupBlobsSql))
  )
}
