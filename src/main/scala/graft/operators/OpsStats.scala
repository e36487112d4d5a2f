package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.model.Tables

/** Write-side operational stats — the statsd emissions of a full
  * accumulate → flush → write cycle, made queryable (the view a cassabon
  * operator's dashboard is built from).
  *
  * Reference semantics:
  *  - `metricmgr.db.insert` is incremented by the batch's statement count on
  *    every successful batch write (datastore/metricmanager.go:221), so its
  *    total equals the number of rows in the rollup write set.
  *  - `metricmgr.db.retry` counts failed batch writes sent back to the queue
  *    (metricmanager.go:213); with no injected failures the deterministic
  *    total is 0 — the row exists so the counter is part of the contract.
  *  - `path.count` is a gauge of distinct paths seen, reported at each flush
  *    (datastore/metricstore.go:89).
  *  - `metricmgr.db.batches` is this engine's visibility addition: how many
  *    Cassandra batches the write set becomes. The reference's batchWriter
  *    opens a batch per (expression, window, stat_time) flush group and
  *    flushes every `cassandra.batchsize` statements
  *    (datastore/batchwriter.go:43-52, datastore/metricstore.go:120-153;
  *    config/cassabon.yaml.template:50 ships batchsize=2), so the count is
  *    sum over groups of ceil(rows / batchsize).
  *
  * Scale posture: everything derives from the rollup write set (one row per
  * (tbl, path, window) — already aggregated), with two global aggregations
  * over it; the stats frame itself is 4 rows.
  */
object OpsStats {

  val BatchSize = 2L // cassandra.batchsize, config/cassabon.yaml.template:50

  def writeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val writeSet = Rollups.rollups(spark, dir)
      // batch groups are per (expression, window-table, stat_time): the
      // flush loop Prepares one batchWriter per closed (expr, window) arm,
      // and every row it appends shares that arm's stat_time
      .withColumn("expr", Rollups.exprKey(col("path")))
    val batchStats = writeSet
      .groupBy("expr", "tbl", "stat_time")
      .agg(count(lit(1)).as("rows"))
      .agg(
        sum("rows").as("inserted"),
        sum(ceil(col("rows") / lit(BatchSize.toDouble)).cast("long")).as("batches"))
    val pathCount = Tables.metrics(spark, dir)
      .agg(countDistinct("path").as("path_count"))
    batchStats.crossJoin(pathCount).select(explode(array(
      struct(lit("metricmgr.db.insert").as("stat"), col("inserted").as("value")),
      struct(lit("metricmgr.db.retry").as("stat"), lit(0L).as("value")),
      struct(lit("metricmgr.db.batches").as("stat"), col("batches").as("value")),
      struct(lit("path.count").as("stat"), col("path_count").as("value")))).as("s"))
      .select(col("s.stat").as("stat"), col("s.value").as("value"))
  }

  /** Oracle: the same counters computed from the shared `rollups` CTE chain
    * (the write set), unioned in the same long (stat, value) shape.
    */
  private val writeStatsSql: String =
    s"""WITH ${Rollups.rollupsCtes},
       |groups AS (
       |  SELECT r.tbl, r.stat_time, d.expr, count(*) AS rows
       |  FROM rollups r
       |  JOIN (SELECT DISTINCT path, expr FROM dispatched) d USING (path)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT 'metricmgr.db.insert' AS stat, CAST(sum(rows) AS BIGINT) AS value FROM groups
       |UNION ALL
       |SELECT 'metricmgr.db.retry', 0
       |UNION ALL
       |SELECT 'metricmgr.db.batches', CAST(sum(CAST(ceil(rows / ${BatchSize}.0) AS BIGINT)) AS BIGINT) FROM groups
       |UNION ALL
       |SELECT 'path.count', CAST(count(DISTINCT path) AS BIGINT) FROM metrics""".stripMargin

  /** The daemon's per-second runtime self-telemetry
    * (logging/stats.go:82-107), split by its two natures.
    *
    * This is the LIVE half: the same gauge vocabulary stats.go emits,
    * read off this engine's JVM/Spark runtime — inherently
    * nondeterministic (heap, GC, thread counts), so it is a library call
    * with a response-shape spec (Round10Spec), like the HTTP API, not an
    * oracle-gated operator. `goroutines` maps to live JVM threads (the
    * scheduler/worker population of a Spark driver), `executors` is the
    * Spark-native addition a cluster dashboard needs; the memory.* names
    * follow stats.go:83-91 over the JVM heap, and memory.gc /
    * memory.gc_pause are cumulative collector count/time (the reference
    * derives per-second deltas from exactly these cumulative MemStats
    * fields — delta-ing is the emitter's job, here left to the scraper).
    */
  def liveGauges(spark: SparkSession): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    val gcs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    Seq(
      // JVM-WIDE live thread count: Thread.activeCount() only estimates the
      // CURRENT thread group, and a Spark driver's scheduler/netty threads
      // live in other groups — the MX bean counts the population this
      // gauge documents
      "goroutines" -> java.lang.management.ManagementFactory
        .getThreadMXBean.getThreadCount.toLong,
      "executors" -> spark.sparkContext.getExecutorMemoryStatus.size.toLong,
      "memory.alloc" -> heap.getUsed,
      "memory.heap.size" -> heap.getCommitted,
      "memory.heap.in_use" -> heap.getUsed,
      "memory.heap.idle" -> (heap.getCommitted - heap.getUsed),
      "memory.sys" -> Runtime.getRuntime.totalMemory(),
      "memory.gc" -> gcs.map(_.getCollectionCount).sum,
      "memory.gc_pause" -> gcs.map(_.getCollectionTime).sum)
  }

  /** Push the live gauges to a statsd sink — the reference's emission
    * transport (logging/stats.go:24-41 opens a statsd client against
    * `host:port` with a name prefix; sendMemoryStats Gauges through it
    * every second). Wire format is statsd's gauge line
    * `prefix.name:value|g`, one UDP datagram per gauge
    * (go-statsd-client's unbatched default), fire-and-forget: statsd's
    * contract is that loss is acceptable and blocking is not, so send
    * errors are swallowed — the deterministic ledger (`runtime_stats`)
    * is the auditable half, this is the best-effort dashboard feed.
    */
  def emit(spark: SparkSession, host: String, port: Int,
      prefix: String = "cassabon"): Unit = {
    val socket = new java.net.DatagramSocket()
    try {
      val addr = java.net.InetAddress.getByName(host)
      liveGauges(spark).foreach { case (name, value) =>
        val line = s"$prefix.$name:$value|g".getBytes("UTF-8")
        try socket.send(new java.net.DatagramPacket(line, line.length, addr, port))
        catch { case _: java.io.IOException => () }
      }
    } finally socket.close()
  }

  /** The DETERMINISTIC half of the daemon's self-telemetry: the workload
    * ledger the runtime gauges converge to on a given corpus — per-
    * subsystem row counts (listener points, path catalog, index nodes and
    * leaves, open rollup windows) plus the config-derived table count.
    * These are exactly the numbers a cassabon dashboard derives from its
    * counters after draining the same input, so they CAN be oracle-gated,
    * and are. Each count folds map-side to one row before the 1-row
    * crossJoins, so the frame costs one pass over each subsystem's
    * already-audited plan.
    */
  def runtimeStats(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.metrics(spark, dir)
      .agg(count(lit(1)).as("points"), countDistinct("path").as("paths"))
    val idx = Index.build(spark, dir)
      .agg(count(lit(1)).as("nodes"), sum(col("leaf").cast("long")).as("leaves"))
    val win = Rollups.rollups(spark, dir).agg(count(lit(1)).as("windows"))
    m.crossJoin(idx).crossJoin(win).select(explode(array(
      struct(lit("points.received").as("stat"), col("points").as("value")),
      struct(lit("path.count").as("stat"), col("paths").as("value")),
      struct(lit("index.nodes").as("stat"), col("nodes").as("value")),
      struct(lit("index.leaves").as("stat"), col("leaves").as("value")),
      struct(lit("rollup.windows").as("stat"), col("windows").as("value")),
      struct(lit("rollup.tables").as("stat"),
        lit(graft.model.RollupConfig.tables.size.toLong).as("value")))).as("s"))
      .select(col("s.stat").as("stat"), col("s.value").as("value"))
  }

  /** Oracle: the same ledger off the shared CTE chains — `rollups` (which
    * carries `metrics`) plus the index node chain — as scalar subqueries.
    */
  private val runtimeStatsSql: String =
    s"""WITH ${Rollups.rollupsCtes},
       |${Index.indexNodesCtes("paths AS (SELECT DISTINCT path FROM metrics)")}
       |SELECT 'points.received' AS stat, CAST(count(*) AS BIGINT) AS value FROM metrics
       |UNION ALL
       |SELECT 'path.count', CAST(count(DISTINCT path) AS BIGINT) FROM metrics
       |UNION ALL
       |SELECT 'index.nodes', CAST(count(*) AS BIGINT) FROM index_nodes
       |UNION ALL
       |SELECT 'index.leaves', CAST(sum(CAST(leaf AS BIGINT)) AS BIGINT) FROM index_nodes
       |UNION ALL
       |SELECT 'rollup.windows', CAST(count(*) AS BIGINT) FROM rollups
       |UNION ALL
       |SELECT 'rollup.tables', ${graft.model.RollupConfig.tables.size}""".stripMargin

  // ---------------------------------------------------------------------
  // cardinality_sketch
  // ---------------------------------------------------------------------

  /** HyperLogLog registers (m = 64) and small-range-correction threshold
    * `2.5 m`. 64 registers put the standard error around 1.04/√64 ≈ 13%
    * — the gauge class of answer stats.go's count gauges want, from
    * 64 BYTES of mergeable state per group.
    */
  val HllRegs = 64
  private val HllAlpha = 0.709 // alpha_m for m = 64 (Flajolet et al. 2007)

  /** The 100 TB-shaped register count: m = 1024 puts the standard error
    * at 1.04/√1024 ≈ 3.3% from 1 KB of mergeable state per group — one
    * constant away from the demo width, measured by `sketch_occupancy`'s
    * `hll_register`/`hll_register_prod` families and Round12Spec's
    * accuracy law (wider ⇒ smaller rel_err on the same corpus).
    */
  val HllRegsProd = 1024

  /** alpha_m, Flajolet et al. 2007 §4 (the m ≥ 128 closed form plus the
    * published small-m constants the demo width uses).
    */
  private[graft] def hllAlphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => HllAlpha
    case _ => 0.7213 / (1 + 1.079 / m)
  }

  /** Per-(type, user) register coordinates at width `m` — the DISTINCT
    * key census `sketch_occupancy` audits (a register's occupancy is how
    * many distinct keys share it; the estimate error the width dial
    * bounds is a function of exactly that crowding).
    */
  private[graft] def hllRegisterAssign(spark: SparkSession, dir: String,
      m: Int): DataFrame = {
    import graft.model.Portable
    Tables.events(spark, dir).select("event_type", "user_id").distinct()
      .withColumn("h", Portable.hash60(col("user_id").cast("string")))
      .select(col("event_type"), (col("h") % m).as("r"))
  }

  /** The register-assignment frame as oracle CTEs: defines
    * `<p>assign(event_type, r)` over the raw `events` parquet.
    */
  private[graft] def hllAssignCtes(p: String, m: Int): String = {
    import graft.model.Portable
    val h = Portable.hex2bigSql("md5(CAST(user_id AS VARCHAR))")
    s"""${p}keys AS (SELECT DISTINCT event_type, user_id FROM events),
       |${p}assign AS (SELECT event_type, $h % $m AS r FROM ${p}keys)""".stripMargin
  }

  /** The SCALE form of a distinct count: exact `count(DISTINCT …)` is a
    * full shuffle of the key universe; the HLL register frame is 64 small
    * integers per group — mergeable by `max` exactly like the rollup
    * state algebra (the third mergeable sketch beside the quantile
    * histogram and the occupancy frames). Everything is portable integer
    * algebra until the last step: register = hash60 % m, rank = leading
    * zeros of the remaining 54 bits via `length(bin(w))` (binary-string
    * length, exact in both engines — no float log), and the harmonic sum
    * is EXACT: Σ 2^(55−M_r) in bigint (≤ 64·2^55, no overflow, order-
    * immune). Only the final estimate divides (one deterministic double
    * expression, round 6); the small-range branch (`E ≤ 2.5m`, linear
    * counting) computes identically on both engines — the sf0.01 fixture
    * lands in it, sf0.1 in the raw-estimate branch, so BOTH are
    * oracle-gated. `n_exact`/`rel_err` ride along as the measurement
    * harness (the ann_recall pattern): the op reports its own error.
    */
  def cardinalitySketch(spark: SparkSession, dir: String): DataFrame =
    cardinalitySketchWith(spark, dir, HllRegs)

  /** The width-parameterized form — the production preset is
    * `cardinalitySketchWith(…, HllRegsProd)`; Round12Spec pins the
    * accuracy law (wider ⇒ rel_err shrinks on the same corpus).
    */
  private[graft] def cardinalitySketchWith(spark: SparkSession, dir: String,
      m: Int): DataFrame = {
    val rows = hllRegisterRowsWith(Tables.events(spark, dir), m)
    val regs = rows.groupBy("event_type", "r").agg(max("rank").as("m"))
    val exact = rows.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    hllFinalizeWith(regs, exact, m)
  }

  /** Per-event register coordinates: (r, rank) for each row — the map-only
    * projection BOTH the batch sketch and the streaming twin
    * (`stream_cardinality`) run before their `max(rank)` registers. Pure
    * deterministic expressions, so it runs unchanged on a streaming frame.
    */
  private[graft] def hllRegisterRows(events: DataFrame): DataFrame =
    hllRegisterRowsWith(events, HllRegs)

  /** Rank budget at width `m`: `w = h DIV m` keeps `60 − log₂m` hash
    * bits, so ranks run 1..(that + 1) — 55 at the demo width, 51 at the
    * production 1024.
    */
  private[graft] def hllMaxRank(m: Int): Int =
    61 - (63 - java.lang.Long.numberOfLeadingZeros(m.toLong))

  private[graft] def hllRegisterRowsWith(events: DataFrame, m: Int): DataFrame = {
    import graft.model.Portable
    require(m >= 16 && Integer.bitCount(m) == 1, s"register count $m must be a power of two >= 16")
    val maxRank = hllMaxRank(m)
    events
      .withColumn("h", Portable.hash60(col("user_id").cast("string")))
      .withColumn("r", col("h") % m)
      .withColumn("w", expr(s"h DIV $m"))
      .withColumn("rank",
        expr(s"CASE WHEN w = 0 THEN $maxRank ELSE $maxRank - length(bin(w)) END"))
  }

  /** The estimate readoff over a drained register frame `(event_type, r,
    * m)` plus the exact-count measurement frame — shared by batch and
    * streaming so the two ops cannot diverge in the finalization algebra.
    */
  private[graft] def hllFinalize(regs: DataFrame, exact: DataFrame): DataFrame =
    hllFinalizeWith(regs, exact, HllRegs)

  private[graft] def hllFinalizeWith(regs: DataFrame, exact: DataFrame,
      m: Int): DataFrame = {
    val maxRank = hllMaxRank(m)
    // the harmonic sum stays exact at any width: m · 2^maxRank = 2^61
    val perType = regs.groupBy("event_type").agg(
      count(lit(1)).as("used"),
      sum(expr(s"shiftleft(cast(1 as bigint), cast($maxRank - m as int))")).as("s_present"))
    perType.join(exact, "event_type")
      .withColumn("v", lit(m.toLong) - col("used"))
      .withColumn("s", col("s_present")
        + col("v") * expr(s"shiftleft(cast(1 as bigint), $maxRank)"))
      .withColumn("e_raw",
        lit(hllAlphaFor(m)) * lit((m.toLong * m).toDouble)
          * expr(s"shiftleft(cast(1 as bigint), $maxRank)") / col("s"))
      .withColumn("est", round(
        when(col("e_raw") <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")), 6))
      .select(col("event_type"), col("n_exact"), col("est"),
        round(abs(col("est") - col("n_exact")) / col("n_exact"), 6).as("rel_err"))
  }

  private[graft] val cardinalitySketchSql: String = {
    import graft.model.Portable
    val h = Portable.hex2bigSql("md5(CAST(user_id AS VARCHAR))")
    s"""WITH hh AS (SELECT event_type, user_id, $h AS h FROM events),
       |rr AS (SELECT event_type, user_id, h % $HllRegs AS r, h // $HllRegs AS w FROM hh),
       |rk AS (SELECT event_type, user_id, r,
       |              CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rank FROM rr),
       |regs AS (SELECT event_type, r, max(rank) AS m FROM rk GROUP BY 1, 2),
       |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS used,
       |              CAST(sum(CAST(1 AS BIGINT) << (55 - m)) AS BIGINT) AS s_present
       |       FROM regs GROUP BY 1),
       |ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
       |       FROM events GROUP BY 1),
       |j AS (SELECT p.event_type, n_exact, used, $HllRegs - used AS v,
       |             s_present + ($HllRegs - used) * (CAST(1 AS BIGINT) << 55) AS s
       |      FROM pt p JOIN ex USING (event_type)),
       |e AS (SELECT event_type, n_exact, v,
       |             $HllAlpha * ${(HllRegs * HllRegs).toDouble} * (CAST(1 AS BIGINT) << 55) / s AS e_raw
       |      FROM j),
       |f AS (SELECT event_type, n_exact,
       |             round(CASE WHEN e_raw <= ${2.5 * HllRegs} AND v > 0
       |                        THEN ${HllRegs.toDouble} * ln(${HllRegs.toDouble} / v)
       |                        ELSE e_raw END, 6) AS est
       |      FROM e)
       |SELECT event_type, n_exact, est,
       |       round(abs(est - n_exact) / n_exact, 6) AS rel_err
       |FROM f""".stripMargin
  }

  def ops: Seq[Op] = Seq(
    Op("write_stats", writeStats, Some(writeStatsSql)),
    Op("runtime_stats", runtimeStats, Some(runtimeStatsSql)),
    Op("cardinality_sketch", cardinalitySketch, Some(cardinalitySketchSql))
  )
}
