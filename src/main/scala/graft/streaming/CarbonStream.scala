package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.model.Tables

/** Structured-Streaming ingest: the Spark-native replacement for cassabon's
  * accumulate/flush goroutine loop (reference listener package feeding
  * datastore/metricmanager.go:run via channels).
  *
  * Any line-shaped source (socket, file, Kafka) streams in, parses to
  * (path, value, ts), and a windowed aggregation maintains the open rollup
  * windows; the window close boundary becomes `stat_time`, exactly the
  * batch semantics. [[rollupQuery]] runs the real streaming engine over the
  * events fixture via the file source and lands in a memory sink — so the
  * driver's DuckDB oracle (identical to the batch 60 s average rollup)
  * verifies the STREAMING path end-to-end. Watermarked update-mode flushing
  * is exercised in the ScalaTest spec via MemoryStream.
  */
object CarbonStream {

  /** Stateful streaming queries get one state-store instance PER shuffle
    * partition, and every micro-batch commits a delta file per instance —
    * so partition count is a per-commit IO cost, not just parallelism. The
    * batch default (32, matched to local[32]) wastes 4x the checkpoint IO
    * these key cardinalities (~10k) need; on a real cluster this knob is
    * sized to executor count x a small factor, exactly as here.
    */
  val StreamShufflePartitions = 8

  /** The default HDFS-backed state store keeps every state version ON-HEAP
    * per executor — fine for the ~10k-key fixtures, but at a 100 TB
    * ingest the keyed-state working set is what bounds how long a
    * stateful query can run. RocksDB keeps state off-heap/on-disk with
    * changelog checkpointing, so state size is bounded by executor DISK,
    * not heap — the run-forever posture. Opt in per session with
    * `spark.graft.stateStore.rocksdb=true` (or env
    * `SPARK_GRAFT_ROCKSDB=1`); the flag is read at `start()` time by
    * [[withStreamPartitions]], so batch plans and existing benchmarks are
    * untouched.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val RocksDbFlag = "spark.graft.stateStore.rocksdb"
  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  private def rocksDbEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(RocksDbFlag)
      .orElse(sys.env.get("SPARK_GRAFT_ROCKSDB"))
      .exists(v => v == "true" || v == "1")

  /** Run `body` with the session's shuffle partitions temporarily lowered
    * to [[StreamShufflePartitions]] and, when [[RocksDbFlag]] is set, the
    * RocksDB state-store provider selected (streaming plans bind both
    * values at `start()`), restoring the batch settings afterwards.
    */
  def withStreamPartitions[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevProvider = spark.conf.getOption(ProviderConf)
    spark.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions.toString)
    if (rocksDbEnabled(spark)) spark.conf.set(ProviderConf, RocksDbProvider)
    try body finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevProvider match {
        case Some(p) => spark.conf.set(ProviderConf, p)
        case None => spark.conf.unset(ProviderConf)
      }
    }
  }

  /** Resolve a drained memory-sink table and DROP its temp view: Dataset
    * analysis is eager, so the returned frame stays bound to the sink's
    * rows, while the catalog entry (and with it the only long-lived
    * reference keeping every emitted row on the driver once the caller
    * drops the frame) goes away — repeated verify/bench runs would
    * otherwise accumulate one UUID-named view + row copy per invocation.
    */
  def drainMemorySink(spark: SparkSession, sink: String): DataFrame = {
    val out = spark.table(sink)
    spark.catalog.dropTempView(sink)
    out
  }

  /** The canonical events schema with `ts` ALREADY in the epoch-nanos
    * bigint contract — what a TIMESTAMP(NANOS) file reads as under
    * nanosAsLong, and what [[graft.sources.RollupStore]]-style staged
    * slices written from normalized frames carry on disk. Used when
    * schema inference has no files to look at (below).
    */
  private val eventsNanosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val streamSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), StructType]()

  /** File-source events stream with `ts` normalized to an epoch-nanosecond
    * bigint — the [[Tables.events]] contract. The file stream source needs
    * an explicit schema, and the on-disk flavor varies by fixture
    * generation (TIMESTAMP(NANOS)-as-long vs TIMESTAMP(MICROS) — see
    * [[Tables.normalizeTs]]), so infer it from a batch footer read with the
    * same glob rather than hardcoding either flavor. The inference is
    * cached per (dir, glob) — fixtures don't change flavor mid-session —
    * and an EMPTY source (the continuous-ingest pattern: start the stream,
    * slices land later) falls back to [[eventsNanosSchema]] instead of
    * failing at stream construction, since files staged later by this
    * engine carry normalized nanos columns.
    *
    * Like [[Tables.events]], sets the session-wide nanosAsLong conf and
    * leaves it set — the streaming parquet reader consults it on every
    * micro-batch, so restoring it mid-query would corrupt a NANOS read.
    */
  def eventsStream(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // only SUCCESSFUL inference is cached: an empty-dir fallback must be
    // re-tried next call, so a raw fixture landing later is re-inferred
    // with its true flavor instead of silently read through the fallback
    val onDisk = Option(streamSchemaCache.get((dir, glob))).getOrElse {
      try {
        val s = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
        streamSchemaCache.put((dir, glob), s)
        s
      } catch { case _: org.apache.spark.sql.AnalysisException => eventsNanosSchema }
    }
    val rd = spark.readStream.schema(onDisk).option("pathGlobFilter", glob)
    val withTrigger = maxFilesPerTrigger.fold(rd)(n =>
      rd.option("maxFilesPerTrigger", n.toString))
    Tables.normalizeTs(withTrigger.parquet(dir))
  }

  /** Parse raw carbon plaintext lines (`path value ts`, the TCP/UDP
    * listener wire format — reference listener/carbon_plaintext.go:60-200)
    * from ANY line-shaped source into the `(path, value, ts)` metric
    * stream the rollup forms consume. `lineCol` defaults to `value`, the
    * socket source's column; Kafka callers pass the cast payload column.
    * Invalid lines are DROPPED here (the live listener discards them and
    * bumps a counter — the batch `carbon_parse` operator is where they
    * stay observable); the split/try_cast validation IS the batch one —
    * both project from `Carbon.withParsedLine`, so they cannot drift.
    */
  def parseCarbonLines(lines: DataFrame, lineCol: String = "value"): DataFrame =
    graft.operators.Carbon.withParsedLine(lines, lineCol)
      .filter(col("valid"))
      .select(expr("try_element_at(p, 1)").as("path"),
        col("v").as("value"), col("t").as("ts"))

  /** events stream -> carbon metric stream (same mapping as Tables.metrics).
    * `keepId` additionally carries `event_id` for consumers that need the
    * LAST-rollup tiebreak key (`stream_series_fill`'s flush aggregation).
    */
  def toMetrics(events: DataFrame, keepId: Boolean = false): DataFrame = {
    val base = Seq(
      concat(lit("servers."), col("event_type"), lit(".u"),
        (col("user_id") % 8).cast("string")).as("path"),
      col("value"),
      expr("ts DIV 1000000000").as("ts"))
    events.select((if (keepId) base :+ col("event_id") else base): _*)
  }

  /** 60 s average rollup over a metric stream: the streaming accumulate.
    * `update`/`append` callers add a watermark; complete-mode callers don't.
    */
  def windowedRollup(metrics: DataFrame, watermark: Option[String] = None): DataFrame = {
    // averages in exact integer cents (values are 2-decimal), one division:
    // deterministic across engines/partitionings — same policy as the batch
    // rollups (see operators/Rollups.scala)
    val t = metrics
      .withColumn("tts", timestamp_seconds(col("ts")))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    watermark.fold(t)(w => t.withWatermark("tts", w))
      .groupBy(col("path"), window(col("tts"), "60 seconds").as("w"))
      .agg(sum("cents").as("cs"), count(lit(1)).as("n"))
      .select(col("path"),
        unix_timestamp(col("w.end")).as("stat_time"),
        (col("cs") / (lit(100.0) * col("n"))).as("stat"))
  }

  /** Run the streaming rollup over the events fixture (file source, memory
    * sink, complete mode), block until drained, return the result table.
    */
  def rollupQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = eventsStream(spark, dir)
    val sink = "stream_rollup_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = windowedRollup(toMetrics(events))
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    drainMemorySink(spark, sink)
  }

  /** The streaming quantile sketch: the bin-count histogram IS the
    * streaming-maintainable state (integer counts, order-immune partials
    * — exactly why `value_quantiles_sketch` chose it over exact
    * `percentile`, whose buffer a stream can't bound). One complete-mode
    * groupBy(event_type, bin) runs live; the quantile readoff happens on
    * the drained bin frame via the SAME [[graft.operators.Carbon
    * .quantilesFromBins]] the batch op uses. Oracle = the batch sketch
    * SQL verbatim: a finite stream must land on identical estimates.
    */
  def quantilesQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Carbon
    val events = eventsStream(spark, dir)
    val sink = "stream_quantiles_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = events
        .groupBy(col("event_type"),
          floor(col("value") / Carbon.QuantileBinW).cast("long").as("bin"))
        .agg(count(lit(1)).as("c"))
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    Carbon.quantilesFromBins(drainMemorySink(spark, sink))
  }

  /** The streaming cardinality sketch: the 64 HLL registers per event type
    * ARE the streaming-maintainable state — `max(rank)` partials are
    * order-immune and merge across micro-batches exactly like flush
    * slices, where exact `count(DISTINCT)`'s key-universe state a stream
    * cannot bound. One complete-mode groupBy(event_type, r) runs live; the
    * estimate readoff happens on the drained register frame via the SAME
    * [[graft.operators.OpsStats.hllFinalize]] the batch op uses (the
    * exact-count side is the batch-computed measurement harness, like
    * `ann_recall`'s brute-force truth — the stream maintains only the
    * sketch). Oracle = the batch sketch SQL verbatim: a finite stream
    * must land on identical registers, hence identical estimates.
    */
  def cardinalityQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.OpsStats
    val events = eventsStream(spark, dir)
    val sink = "stream_cardinality_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = OpsStats.hllRegisterRows(events)
        .groupBy(col("event_type"), col("r"))
        .agg(max("rank").as("m"))
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    OpsStats.hllFinalize(drainMemorySink(spark, sink), exact)
  }

  /** The live path index: the reference's index manager consumes the path
    * channel CONTINUOUSLY (datastore/indexmanager.go:120-160 — every
    * stored metric's path is PUT to the index as it arrives), and this is
    * that loop as a streaming aggregation. The prefix explode is map-only
    * per micro-batch (each batch explodes only its NEW paths), and the
    * node state merges by `max(depth)`/`max(leaf)` — order-immune, so a
    * node first seen as a prefix and later as a full path converges to
    * leaf=true regardless of arrival order. State is |index nodes|, the
    * same bound the reference's index carries. Complete-mode memory sink
    * for the harness; a deployment would use the update-mode changelog.
    * Oracle = `index_build`'s SQL verbatim (finite stream == batch build).
    */
  def indexQuery(spark: SparkSession, dir: String): DataFrame = {
    val paths = toMetrics(eventsStream(spark, dir)).select("path")
    val sink = "stream_index_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = graft.operators.Index.indexFrom(paths)
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    drainMemorySink(spark, sink)
  }

  /** The live top-volume paths: per-path integer counters are the
    * streaming-maintainable state (sum-merge across micro-batches, state
    * bounded by the path catalog — the reference accumulator's own
    * bound), where a global sort cannot run continuously. One
    * complete-mode groupBy(path) count runs live; the top-10 rank happens
    * on the drained catalog-sized count frame via the SAME
    * [[graft.operators.Carbon.topFromCounts]] the batch op uses. Oracle =
    * `top_paths`' SQL verbatim.
    */
  def topPathsQuery(spark: SparkSession, dir: String): DataFrame = {
    val metrics = toMetrics(eventsStream(spark, dir))
    val sink = "stream_top_paths_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = metrics
        .groupBy("path").agg(count(lit(1)).as("points"))
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    graft.operators.Carbon.topFromCounts(drainMemorySink(spark, sink))
  }

  /** The live heavy hitters — the ONLY aggregation in this engine whose
    * streaming state is CONSTANT in the key cardinality: each arriving
    * point increments its `CmsDepth` count-min bucket counters, so the
    * state is the depth × 2^bits counter frame itself (integer, sum-merge
    * across micro-batches like flush slices), where `stream_top_paths`'
    * per-key counters grow with the catalog. The readoff probes the
    * drained counter frame with the batch-computed path catalog via the
    * SAME [[graft.operators.Carbon.cmsTopFrom]] the batch op uses (the
    * exact side is the measurement harness — the `stream_cardinality`
    * pattern). Oracle = `heavy_hitters_sketch`'s SQL verbatim.
    */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Carbon
    val bits = Carbon.CmsBucketBits
    val bs = Carbon.cmsBuckets(bits)
    val metrics = toMetrics(eventsStream(spark, dir))
      .withColumn("h", graft.model.Portable.hash60(col("path")))
      .select(explode(array((0 until Carbon.CmsDepth).map(j =>
        struct(lit(j).as("j"), bs(j).as("bucket"))): _*)).as("jb"))
      .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    val sink = "stream_cms_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = metrics
        .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    Carbon.cmsTopFrom(drainMemorySink(spark, sink),
      Carbon.pathCounts(spark, dir), bits)
  }

  /** The live outlier detector: `series_anomaly`'s per-path moment state
    * `(n, Σcents, Σcents²)` is EXACTLY what a stream can maintain — three
    * order-immune bigint partials per path (state = |paths| rows), where
    * any rank/sort-based outlier rule could not run continuously. One
    * complete-mode groupBy(path) runs live; the z-score verdict readoff
    * happens on the drained moment frame via the SAME
    * [[graft.operators.Series.anomalyFrom]] the batch op uses, probing
    * the batch point set (the `stream_cardinality` readoff pattern).
    * Oracle = `series_anomaly`'s SQL verbatim: a finite stream must land
    * on identical moments, hence identical flags.
    */
  def anomalyQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Series
    val live = Series.centsFrom(toMetrics(eventsStream(spark, dir)))
    val sink = "stream_anomaly_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = Series.statsFrom(live)
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    Series.anomalyFrom(Series.centsFrom(Tables.metrics(spark, dir)),
      drainMemorySink(spark, sink))
  }

  /** Oracle: identical to the batch 60 s average rollup — finite stream in
    * complete mode must equal the batch aggregation.
    */
  private val rollupSql: String =
    s"""WITH ${Tables.metricsSql},
       |c AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS cents FROM metrics)
       |SELECT path, ts - ts % 60 + 60 AS stat_time,
       |       CAST(sum(cents) AS BIGINT) / (100.0 * count(*)) AS stat
       |FROM c GROUP BY 1, 2""".stripMargin

  /** The SCALE form of the streaming rollup: watermark + APPEND mode into a
    * parquet file sink. Complete mode re-emits the entire result every
    * trigger and a memory sink accumulates it on the driver — fine for a
    * verification harness, unusable at 100 TB. Append emits each window
    * ONCE, when the watermark passes its end, and the file sink scales with
    * executors; state is evicted as windows close, so steady-state memory
    * is bounded by the open-window count.
    *
    * Determinism: the watermark is EVENT-time (max seen tts minus the 0 s
    * delay), so which windows flush is a pure function of the data — every
    * window except those still open past the final watermark, i.e.
    * `stat_time <= max(ts)` with stat_time = window end. That predicate is
    * the oracle's WHERE clause; the never-emitted tail windows are exactly
    * cassabon's still-accumulating buckets at shutdown without the
    * terminating flush (metricstore.go:108-116 writes them only because
    * `terminating` forces statTime=now).
    */
  def rollupAppendQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = eventsStream(spark, dir)
    // Harness-local BY DESIGN: this temp dir is the verification replay's
    // file-sink target for a single-process run, not operator state — a
    // real deployment points the file sink + checkpointLocation at shared
    // storage. (Contrast dedup_cluster's label spill, which IS operator
    // state and therefore goes through graft.model.Spill.)
    val out = java.nio.file.Files
      .createTempDirectory("stream_rollup_append").toString
    withStreamPartitions(spark) {
      val q = windowedRollup(toMetrics(events), watermark = Some("0 seconds"))
        .writeStream
        .format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/chk")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    spark.read.parquet(s"$out/data")
  }

  private val rollupAppendSql: String =
    s"""WITH ${Tables.metricsSql},
       |c AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS cents FROM metrics)
       |SELECT path, ts - ts % 60 + 60 AS stat_time,
       |       CAST(sum(cents) AS BIGINT) / (100.0 * count(*)) AS stat
       |FROM c GROUP BY 1, 2
       |HAVING stat_time <= (SELECT max(ts) FROM metrics)""".stripMargin

  /** The full INGEST→STORE loop: cassabon's accumulate/flush cycle
    * (datastore/metricstore.go:85-185 — accumulate deltas per flush
    * interval, flush to the store, re-accumulate on collision) re-expressed
    * without any streaming state at all. Each micro-batch computes its
    * MERGEABLE partial rollup state (graft.operators.Rollups.mergeableFrom
    * — commutative five-method state, all windows, one batch-local
    * aggregation) and APPENDS it to the partitioned store; readers finalize
    * with [[graft.sources.RollupStore.readFinalized]] (associative
    * `mergeAll` + `finalize`). Because the state algebra is associative,
    * the finalized store provably equals the single-pass batch `rollups`
    * REGARDLESS of how ingest was sliced into flush cycles — the spec
    * replays the fixture in 3 micro-batches and asserts bit-equality.
    *
    * Versus the append-mode windowed form ([[rollupAppendQuery]]): no
    * watermark, no state store, no still-open-window tail — a late point
    * lands as one more state row and merges in at read; compaction (rewrite
    * a partition through `mergeAll`) amortizes read cost exactly like the
    * reference's re-accumulation on flush collision. At 100 TB each flush
    * cycle is a map-side-combined aggregation of just that cycle's points,
    * and the store stays partition-pruned on (tbl, stat_date).
    */
  /** Start (and return) the LIVE flush query — the daemon's ingest arm:
    * each staged source file becomes one micro-batch, reduced to its
    * mergeable rollup state and appended to the store as one slice. The
    * caller owns the query's lifetime (`graft.Daemon` runs it CONCURRENTLY
    * with the HTTP server and store maintenance; [[streamRollupsToStore]]
    * is the drain-and-stop batch harness). Safe beside a live `compact`:
    * appends under a young lease skip recovery, and the additive swap
    * cannot touch files it didn't fold.
    */
  def startRollupFlush(spark: SparkSession, srcDir: String, store: String,
      glob: String = "*.parquet",
      config: () => Seq[graft.model.RollupDef] =
        () => graft.model.RollupConfig.reference)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // one flush cycle per staged file
    val events = eventsStream(spark, srcDir, glob, maxFilesPerTrigger = Some(1))
    // Tables.metrics' mapping plus event_id — the five-method mergeable
    // state needs it for the LAST tiebreak key ([[toMetrics]] serves the
    // average-only windowed forms and deliberately drops it).
    val metrics = events.select(
      concat(lit("servers."), col("event_type"), lit(".u"),
        (col("user_id") % 8).cast("string")).as("path"),
      col("value"),
      expr("ts DIV 1000000000").as("ts"),
      col("event_id"))
    metrics.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // config() is read PER FLUSH CYCLE — the daemon's SIGHUP reload
        // swaps it between cycles, never inside one
        graft.sources.RollupStore.appendStateSlice(
          graft.operators.Rollups.mergeableWith(batch, config()), store)
      }
      .start()
  }

  /** The flush query over STAGED METRIC slices — the [[graft.UdpListener]]
    * bridge: each staged `(path, value, ts, event_id)` parquet file is one
    * flush cycle, appended to the store as mergeable state. Identical
    * foreachBatch to [[startRollupFlush]]; the events→metrics mapping is
    * simply absent because the socket already delivers metric rows.
    */
  def startMetricRollupFlush(spark: SparkSession, srcDir: String, store: String,
      glob: String = "*.parquet",
      config: () => Seq[graft.model.RollupDef] =
        () => graft.model.RollupConfig.reference)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("path", StringType), StructField("value", DoubleType),
      StructField("ts", LongType), StructField("event_id", LongType)))
    spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.RollupStore.appendStateSlice(
          graft.operators.Rollups.mergeableWith(batch, config()), store)
      }
      .start()
  }

  def streamRollupsToStore(spark: SparkSession, srcDir: String, store: String,
      glob: String = "*.parquet"): Unit =
    withStreamPartitions(spark) {
      val q = startRollupFlush(spark, srcDir, store, glob)
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }

  /** The LIVE form of `series_fill`: the dashboard gap-repaired range read
    * served from stream state instead of a batch aggregation. The state is
    * the fetch scenario's (tbl, path) rollup slice maintained by the SAME
    * flush aggregation the batch store writes
    * ([[graft.operators.Rollups.rollupsFrom]], reused unchanged — every
    * aggregate in it is commutative, so complete mode maintains it), with
    * the stream pre-filtered to the fetch path: state = that path's
    * window slots only, not the catalog. Readoff = the SAME grid+gap-fill
    * ([[graft.operators.MetricQuery.fetchFrom]]) and repair window
    * ([[graft.operators.Series.fillLastFrom]]) the batch pair uses.
    * Oracle = `series_fill`'s SQL verbatim.
    */
  def fillQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{MetricQuery, Rollups, Series}
    val live = Rollups.rollupsFrom(
      toMetrics(eventsStream(spark, dir), keepId = true)
        .filter(col("path") === MetricQuery.FetchPath))
      .filter(col("tbl") === MetricQuery.FetchTable)
    val sink = "stream_fill_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = live
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    Series.fillLastFrom(
      MetricQuery.fetchFrom(spark, dir, drainMemorySink(spark, sink)))
  }

  /** The live trend fit: `series_linreg`'s per-path moment tuple
    * `(n, Σx, Σy, Σxy, Σx², x_last)` is ONE order-immune aggregate — six
    * numbers per path that sum/max-merge across micro-batches like flush
    * slices (state = |paths| rows, the `stream_anomaly` bound), where any
    * sort- or window-based fit could not run continuously. One
    * complete-mode groupBy(path) runs live; the slope/fit/forecast readoff
    * happens on the drained moment frame via the SAME
    * [[graft.operators.Series.linregFrom]] the batch op uses. Oracle =
    * `series_linreg`'s SQL verbatim: a finite stream must land on
    * identical moments, hence an identical fit.
    */
  def linregQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Series
    val live = Series.centsFrom(toMetrics(eventsStream(spark, dir)))
    val sink = "stream_linreg_" + UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(spark) {
      val q = Series.linregMomentsFrom(live)
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    Series.linregFrom(drainMemorySink(spark, sink))
  }

  def ops: Seq[Op] = Seq(
    Op("stream_series_fill", fillQuery,
      Some(graft.operators.Series.fillLastSql)),
    Op("stream_rollup", rollupQuery, Some(rollupSql)),
    Op("stream_rollup_append", rollupAppendQuery, Some(rollupAppendSql)),
    Op("stream_quantiles", quantilesQuery,
      Some(graft.operators.Carbon.valueQuantilesSketchSql)),
    Op("stream_cardinality", cardinalityQuery,
      Some(graft.operators.OpsStats.cardinalitySketchSql)),
    Op("stream_index", indexQuery,
      Some(graft.operators.Index.buildSql)),
    Op("stream_top_paths", topPathsQuery,
      Some(graft.operators.Carbon.topPathsSql)),
    Op("stream_heavy_hitters", heavyHittersQuery,
      Some(graft.operators.Carbon.heavyHittersSql(
        graft.operators.Carbon.CmsBucketBits))),
    Op("stream_anomaly", anomalyQuery,
      Some(graft.operators.Series.anomalySql)),
    Op("stream_linreg", linregQuery,
      Some(graft.operators.Series.linregSql))
  )
}
