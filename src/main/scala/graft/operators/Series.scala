package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Op
import graft.model.Tables

/** Graphite-style series query functions over the metric stream — the
  * read-side vocabulary a cassabon deployment's dashboards actually call
  * (cassabon stores what graphite-web then transforms; reference
  * datastore/metricquery.go:87-230 serves the raw series these functions
  * consume). `series_derivative`/`series_moving_avg` live in
  * [[Rollups]] since r3; this family adds the counter, accumulation,
  * top-k, gap-repair, and outlier forms.
  *
  * Portability: values are 2-decimal, so all arithmetic runs in exact
  * integer cents ([[graft.model.Portable]] rules); any float a row shows
  * is produced by ONE IEEE division from exact integers, bit-identical
  * across engines. The anomaly test squares cent-scale products, so its
  * compare is lifted to 38-digit decimals (Spark) / HUGEINT (DuckDB) —
  * int64 would overflow the squared terms around sf10.
  *
  * Scale shape: every op is one map-side projection plus at most one
  * exchange — either a per-path window sort (series keyed by path, the
  * same partitioning every stage reuses) or a 40-row aggregate that
  * broadcasts back. Nothing here widens at 100 TB beyond the path count.
  */
object Series {

  private val centsCte =
    "c AS (SELECT path, ts, event_id, value, CAST(round(value * 100) AS BIGINT) AS cents FROM metrics)"

  private def cents(spark: SparkSession, dir: String): DataFrame =
    centsFrom(Tables.metrics(spark, dir))

  // ------------------------------------------------- nonNegativeDerivative

  /** Graphite's `nonNegativeDerivative`: per-path rate of change where a
    * NEGATIVE delta (a counter reset/wrap) yields null instead of a
    * negative rate — the form dashboards use over monotonically-increasing
    * counters. Same-timestamp pairs also yield null (no divide).
    */
  def nonNegDerivative(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
    cents(spark, dir)
      .withColumn("prev_c", lag("cents", 1).over(w))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .select(col("path"), col("ts"), col("event_id"),
        ((col("cents") - col("prev_c")) /
          when(col("cents") >= col("prev_c") && col("ts") =!= col("prev_ts"),
            (col("ts") - col("prev_ts")) * 100))
          .as("rate"))
  }

  private val nonNegDerivativeSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte
       |SELECT path, ts, event_id,
       |       (cents - lag(cents) OVER w)
       |         / (CASE WHEN cents >= lag(cents) OVER w AND ts <> lag(ts) OVER w
       |                 THEN (ts - lag(ts) OVER w) * 100 END) AS rate
       |FROM c
       |WINDOW w AS (PARTITION BY path ORDER BY ts, event_id)""".stripMargin

  // ------------------------------------------------------------- integral

  /** Graphite's `integral`: per-path running total in arrival order.
    * The cumulative sum runs in exact cents (order-immune), then ONE
    * division scales back to value units.
    */
  def integral(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents(spark, dir)
      .select(col("path"), col("ts"), col("event_id"),
        (sum("cents").over(w) / lit(100.0)).as("total"))
  }

  private val integralSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte
       |SELECT path, ts, event_id,
       |       CAST(sum(cents) OVER (PARTITION BY path ORDER BY ts, event_id
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |            AS BIGINT) / 100.0 AS total
       |FROM c""".stripMargin

  // ------------------------------------------------------- highestAverage

  /** How many series `series_top` keeps (graphite `highestAverage(…, 3)`). */
  val TopSeriesK = 3

  /** Graphite's `highestAverage(seriesList, k)`: rank paths by mean value,
    * keep the top k series WHOLE (every point, tagged with the path's
    * rank). The rank key is one exact-cents sum divided once per path;
    * ties break by path. Scale shape: the 40-row per-path aggregate
    * broadcasts back onto the stream — the only exchange over the points
    * is none at all (the semi-join key arrives broadcast).
    */
  def topSeries(spark: SparkSession, dir: String): DataFrame = {
    val stats = cents(spark, dir)
      .groupBy("path")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .withColumn("avg_value", round(col("s") / (col("n") * 100.0), 6))
      .withColumn("path_rank", row_number().over(
        Window.orderBy(col("avg_value").desc, col("path"))))
      .filter(col("path_rank") <= TopSeriesK)
      .select(col("path"), col("path_rank"), col("avg_value"))
    Tables.metrics(spark, dir)
      .join(broadcast(stats), "path")
      .select(col("path"), col("ts"), col("event_id"), col("value"),
        col("path_rank"), col("avg_value"))
  }

  private val topSeriesSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |st AS (
       |  SELECT path, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s FROM c GROUP BY 1
       |),
       |ranked AS (
       |  SELECT path, round(s / (n * 100.0), 6) AS avg_value,
       |         row_number() OVER (ORDER BY s / (n * 100.0) DESC, path) AS path_rank
       |  FROM st
       |)
       |SELECT m.path, m.ts, m.event_id, m.value,
       |       CAST(r.path_rank AS INT) AS path_rank, r.avg_value
       |FROM metrics m JOIN ranked r ON m.path = r.path
       |WHERE r.path_rank <= $TopSeriesK""".stripMargin

  // -------------------------------------------------------- keepLastValue

  /** Graphite's `keepLastValue` over the gap-filled fetch grid: the API's
    * range fetch ([[MetricQuery.fetch]]) marks missing slots null; this
    * repairs each gap with the last seen value (slots before the first
    * point stay null). Composes on the SAME fetch CTEs the oracle-gated
    * `metric_fetch` uses, so the grid semantics cannot drift.
    */
  def fillLast(spark: SparkSession, dir: String): DataFrame =
    fillLastFrom(MetricQuery.fetch(spark, dir))

  /** The gap-repair window over any `fetched(path, slot_ts, stat)` frame —
    * shared with `stream_series_fill`'s readoff.
    */
  private[graft] def fillLastFrom(fetched: DataFrame): DataFrame = {
    val w = Window.partitionBy("path").orderBy("slot_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fetched.withColumn("filled", last("stat", ignoreNulls = true).over(w))
  }

  private[graft] val fillLastSql: String =
    s"""WITH ${MetricQuery.fetchCtes}
       |SELECT path, slot_ts, stat,
       |       last_value(stat IGNORE NULLS) OVER (
       |         PARTITION BY path ORDER BY slot_ts
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
       |FROM fetched""".stripMargin

  // ------------------------------------------------------------- anomaly

  /** Z-score threshold for [[anomaly]]: |x - mean| > 3 sigma flags. */
  val ZThresh = 3L

  /** Per-path z-score outliers — the aberration-detection read (graphite's
    * `removeAboveValue`/holt-winters family reduced to its testable core):
    * flag points more than [[ZThresh]] population standard deviations from
    * their path's mean.
    *
    * The verdict is EXACT integer algebra, no float sigma: with per-path
    * n, S = sum(cents), Q = sum(cents^2), z^2 > k^2 rearranges to
    * (n*x - S)^2 > k^2 * (n*Q - S^2) — both sides integers. The squares
    * exceed int64 around sf10, so the compare runs in decimal(38)
    * (Spark) / HUGEINT (DuckDB); constant-valued paths (zero variance)
    * flag nothing.
    */
  /** The cents projection over an arbitrary `(path, value, ts, event_id)`
    * frame — shared with the streaming twin so batch and live use one
    * fixed-point rule.
    */
  private[graft] def centsFrom(metrics: DataFrame): DataFrame =
    metrics.withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))

  /** Per-path moment state `(path, n, s, q)` — three exact bigints per
    * path, order-immune partials: the form a stream (or a flush slice
    * merge) can maintain, unlike any windowed sort.
    */
  private[graft] def statsFrom(cents: DataFrame): DataFrame =
    cents.groupBy("path")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        sum(col("cents") * col("cents")).as("q"))

  /** The z-score verdict join — shared verbatim by `series_anomaly` and
    * `stream_anomaly`'s readoff.
    */
  private[graft] def anomalyFrom(cents: DataFrame, stats: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    cents
      .join(broadcast(stats), "path")
      .withColumn("num",
        (col("n").cast(dec) * col("cents").cast(dec) - col("s").cast(dec)))
      .withColumn("den",
        col("n").cast(dec) * col("q").cast(dec) - col("s").cast(dec) * col("s").cast(dec))
      .select(col("path"), col("ts"), col("event_id"), col("value"),
        (col("den") > 0 &&
          col("num") * col("num") > lit(ZThresh * ZThresh) * col("den"))
          .as("anomaly"))
  }

  def anomaly(spark: SparkSession, dir: String): DataFrame = {
    val c = cents(spark, dir)
    anomalyFrom(c, statsFrom(c))
  }

  private[graft] val anomalySql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |st AS (
       |  SELECT path, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s,
       |         CAST(sum(cents * cents) AS BIGINT) AS q
       |  FROM c GROUP BY 1
       |)
       |SELECT c.path, c.ts, c.event_id, c.value,
       |       (CAST(st.n AS HUGEINT) * st.q - CAST(st.s AS HUGEINT) * st.s > 0
       |        AND (CAST(st.n AS HUGEINT) * c.cents - st.s)
       |            * (CAST(st.n AS HUGEINT) * c.cents - st.s)
       |            > ${ZThresh * ZThresh}
       |              * (CAST(st.n AS HUGEINT) * st.q - CAST(st.s AS HUGEINT) * st.s))
       |         AS anomaly
       |FROM c JOIN st ON c.path = st.path""".stripMargin

  // ------------------------------------------------------------ summarize

  /** Bucket width for [[summarize]] (graphite `summarize(…, "10min")`). */
  val SummarizeBucketSec = 600L

  /** The per-(path, bucket) exact-cents aggregate `(path, bucket_ts,
    * n_points, cents_sum)` — shared by `series_summarize` and
    * `series_percentile` so the bucket alignment cannot drift between the
    * re-bucketed read and the cross-series combine built on it.
    */
  private[graft] def summarized(metrics: DataFrame): DataFrame =
    centsFrom(metrics)
      .groupBy(col("path"),
        (col("ts") - pmod(col("ts"), lit(SummarizeBucketSec))).as("bucket_ts"))
      .agg(count(lit(1)).as("n_points"), sum("cents").as("cents_sum"))

  /** The same frame as CTEs ending in `summarized` — composed verbatim by
    * both oracle queries below.
    */
  private val summarizeCtes: String =
    s"""${Tables.metricsSql},
       |c AS (SELECT path, ts, CAST(round(value * 100) AS BIGINT) AS cents FROM metrics),
       |summarized AS (
       |  SELECT path, ts - ts % $SummarizeBucketSec AS bucket_ts,
       |         CAST(count(*) AS BIGINT) AS n_points,
       |         CAST(sum(cents) AS BIGINT) AS cents_sum
       |  FROM c GROUP BY 1, 2
       |)""".stripMargin

  /** Graphite's `summarize(seriesList, "10min", "sum")`: re-bucket each
    * series into fixed [[SummarizeBucketSec]] buckets aligned to the epoch
    * grid, totalling in exact cents with ONE closing division. Scale
    * shape: a single groupBy exchange whose map-side partial combine
    * collapses each input partition to |paths × buckets-touched| rows
    * before the shuffle — the canonical dashboard downsample.
    */
  def summarize(spark: SparkSession, dir: String): DataFrame =
    summarized(Tables.metrics(spark, dir))
      .select(col("path"), col("bucket_ts"), col("n_points"),
        (col("cents_sum") / lit(100.0)).as("total"))

  private val summarizeSql: String =
    s"""WITH $summarizeCtes
       |SELECT path, bucket_ts, n_points, cents_sum / 100.0 AS total
       |FROM summarized""".stripMargin

  // ----------------------------------------------------------- percentile

  /** Graphite's `percentileOfSeries(seriesList, p)`: combine ALL series
    * into one — per aligned bucket, the p-th percentile across the
    * per-path bucket totals. Raw points never align across paths, so the
    * combine rides [[summarized]]'s epoch-aligned buckets (the frame
    * `series_summarize` reads; the oracle composes the SAME CTE).
    *
    * The percentile is graphite's nearest-rank pick — the
    * ceil(n·p/100)-th ORDER STATISTIC, `(n*p + 99) DIV 100` in exact
    * integer math over exact-cents totals, so there is no interpolation
    * float to diverge on. Scale shape: after the summarize aggregate the
    * rank window runs over |paths| rows per bucket (config-sized), and
    * the closing collapse emits one row per bucket.
    */
  def percentileOfSeries(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("bucket_ts")
      .orderBy(col("cents_sum"), col("path"))
    def pick(p: Int) =
      max(when(col("r") === expr(s"(n_series * $p + 99) DIV 100"),
        col("cents_sum"))) / lit(100.0)
    summarized(Tables.metrics(spark, dir))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n_series",
        count(lit(1)).over(Window.partitionBy("bucket_ts")))
      .groupBy("bucket_ts", "n_series")
      .agg(pick(50).as("p50"), pick(90).as("p90"))
      .select(col("bucket_ts"), col("n_series"), col("p50"), col("p90"))
  }

  private val percentileSql: String =
    s"""WITH $summarizeCtes,
       |ranked AS (
       |  SELECT bucket_ts, cents_sum,
       |         row_number() OVER (PARTITION BY bucket_ts
       |                            ORDER BY cents_sum, path) AS r,
       |         CAST(count(*) OVER (PARTITION BY bucket_ts) AS BIGINT) AS n_series
       |  FROM summarized
       |)
       |SELECT bucket_ts, n_series,
       |       max(CASE WHEN r = (n_series * 50 + 99) // 100 THEN cents_sum END) / 100.0 AS p50,
       |       max(CASE WHEN r = (n_series * 90 + 99) // 100 THEN cents_sum END) / 100.0 AS p90
       |FROM ranked GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------ asPercent

  /** Graphite's `asPercent(seriesList)`: each series' share of the
    * all-series total per aligned bucket — the composition/ratio read
    * every capacity dashboard renders. Rides [[summarized]]'s buckets like
    * `series_percentile`; numerator and denominator are both exact-cents
    * bigints (the per-bucket total is a window sum over the |paths|-row
    * bucket group), so the ONE float is the closing division, rounded
    * to 6. Zero-total buckets yield null shares (no 0/0): guarded the
    * same way in both engines.
    */
  def asPercent(spark: SparkSession, dir: String): DataFrame =
    summarized(Tables.metrics(spark, dir))
      .withColumn("bucket_total",
        sum("cents_sum").over(Window.partitionBy("bucket_ts")))
      .select(col("path"), col("bucket_ts"),
        when(col("bucket_total") =!= 0,
          round(col("cents_sum") * 100 / col("bucket_total").cast("double"), 6))
          .as("pct"))

  private val asPercentSql: String =
    s"""WITH $summarizeCtes,
       |tot AS (
       |  SELECT path, bucket_ts, cents_sum,
       |         CAST(sum(cents_sum) OVER (PARTITION BY bucket_ts) AS BIGINT) AS bucket_total
       |  FROM summarized
       |)
       |SELECT path, bucket_ts,
       |       CASE WHEN bucket_total <> 0
       |            THEN round(cents_sum * 100 / CAST(bucket_total AS DOUBLE), 6)
       |       END AS pct
       |FROM tot""".stripMargin

  // --------------------------------------------------------------- stdev

  /** Trailing window length for [[movingStdDev]] (graphite `stdev(…, 10)`). */
  val StdDevPoints = 10

  /** Graphite's `stdev(seriesList, points)`: per-path moving population
    * standard deviation over the trailing [[StdDevPoints]] points. The
    * moments run EXACT — n, S = Σcents, Q = Σcents² over the row frame —
    * and n·Q − S² ≥ 0 is an exact int64 (window-bounded: ~2.5e12 at
    * cent scale, far under 2^53, so the double cast is exact too); the
    * only float steps are ONE division by n²·10⁴ and ONE correctly-rounded
    * IEEE sqrt, bit-identical across engines, then `round(…, 6)`.
    * Scale shape: one per-path window sort — the same exchange every
    * series op reuses.
    */
  def movingStdDev(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
      .rowsBetween(-(StdDevPoints - 1), Window.currentRow)
    cents(spark, dir)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("cents").over(w))
      .withColumn("q", sum(col("cents") * col("cents")).over(w))
      .select(col("path"), col("ts"), col("event_id"),
        round(sqrt((col("n") * col("q") - col("s") * col("s")) /
          (col("n") * col("n") * lit(10000.0))), 6).as("stddev"))
  }

  private val movingStdDevSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |m AS (
       |  SELECT path, ts, event_id,
       |         count(*) OVER w AS n,
       |         CAST(sum(cents) OVER w AS BIGINT) AS s,
       |         CAST(sum(cents * cents) OVER w AS BIGINT) AS q
       |  FROM c
       |  WINDOW w AS (PARTITION BY path ORDER BY ts, event_id
       |               ROWS BETWEEN ${StdDevPoints - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT path, ts, event_id,
       |       round(sqrt((n * q - s * s) / (n * n * 10000.0)), 6) AS stddev
       |FROM m""".stripMargin

  // -------------------------------------------------------- movingMedian

  /** Trailing window length for [[movingMedian]] (graphite `movingMedian(…, 10)`). */
  val MedianPoints = 10

  /** Graphite's `movingMedian(seriesList, points)`: per-path trailing
    * median over the last [[MedianPoints]] points. The median is the
    * nearest-rank ORDER STATISTIC — the ceil(n/2)-th smallest exact-cents
    * value, picked as `(n+1) DIV 2` in integer math over the window's
    * sorted values — so there is no interpolation float to diverge on
    * (the `series_percentile` rule applied to a row frame); the ONE float
    * is the closing /100 rescale. Scale shape: the same per-path window
    * sort every series op reuses; each row's sort is over ≤ 10 elements,
    * row-local.
    */
  def movingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
      .rowsBetween(-(MedianPoints - 1), Window.currentRow)
    cents(spark, dir)
      .withColumn("l", array_sort(collect_list("cents").over(w)))
      .select(col("path"), col("ts"), col("event_id"),
        (expr("element_at(l, CAST((size(l) + 1) DIV 2 AS INT))") / lit(100.0))
          .as("median"))
  }

  private val movingMedianSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |m AS (
       |  SELECT path, ts, event_id, list_sort(list(cents) OVER w) AS l
       |  FROM c
       |  WINDOW w AS (PARTITION BY path ORDER BY ts, event_id
       |               ROWS BETWEEN ${MedianPoints - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT path, ts, event_id, l[(len(l) + 1) // 2] / 100.0 AS median
       |FROM m""".stripMargin

  // ---------------------------------------------------------------- ewma

  /** Trailing window length for [[ewma]] (the truncation horizon). */
  val EwmaPoints = 16

  /** Graphite's `exponentialMovingAverage(seriesList, points)` with the
    * α = 1/2 smoothing both engines can run EXACTLY: weights are powers
    * of two, so over the trailing [[EwmaPoints]]-point window the
    * numerator Σ centsᵢ·2^posᵢ and denominator 2^n − 1 are exact bigints
    * (truncating the geometric tail at 16 points caps the dropped mass at
    * 2⁻¹⁶ of the weight — and both engines truncate IDENTICALLY, so the
    * compare is exact), and the ONE float is the closing division. The
    * per-row window is materialized as a sorted (ts, event_id, cents)
    * struct array so the weight-by-recency assignment is deterministic
    * under any partitioning. Scale shape: the shared per-path window
    * sort; each row touches ≤ 16 elements, row-local.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
      .rowsBetween(-(EwmaPoints - 1), Window.currentRow)
    cents(spark, dir)
      .withColumn("l", array_sort(
        collect_list(struct(col("ts"), col("event_id"), col("cents"))).over(w)))
      .select(col("path"), col("ts"), col("event_id"),
        expr("""round(
          aggregate(transform(l, (x, i) -> x.cents * shiftleft(CAST(1 AS BIGINT), i)),
                    CAST(0 AS BIGINT), (a, b) -> a + b)
          / ((shiftleft(CAST(1 AS BIGINT), size(l)) - 1) * CAST(100 AS DOUBLE)), 6)""")
          .as("ewma"))
  }

  private val ewmaSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |m AS (
       |  SELECT path, ts, event_id,
       |         list_sort(list({'ts': ts, 'ev': event_id, 'cents': cents}) OVER w) AS l
       |  FROM c
       |  WINDOW w AS (PARTITION BY path ORDER BY ts, event_id
       |               ROWS BETWEEN ${EwmaPoints - 1} PRECEDING AND CURRENT ROW)
       |)
       |SELECT path, ts, event_id,
       |       round(CAST(list_sum([l[i].cents * (CAST(1 AS BIGINT) << (i - 1))
       |                            for i in generate_series(1, len(l))]) AS BIGINT)
       |             / (((CAST(1 AS BIGINT) << len(l)) - 1) * 100.0), 6) AS ewma
       |FROM m""".stripMargin

  // ----------------------------------------------------------- groupByNode

  /** Which dot-segment [[groupByNode]] groups on (0-based; node 1 of
    * `servers.<type>.u<n>` is the event type — the natural rollup axis).
    */
  val GroupNode = 1

  /** Graphite's `groupByNode(seriesList, node, "sum")`: collapse every
    * series sharing the [[GroupNode]]-th dot-segment into one, on the
    * SAME epoch-aligned buckets `series_summarize` uses (the oracle
    * composes the shared `summarized` CTE, so the alignment cannot
    * drift) — the hierarchy rollup the metric tree UI renders when a
    * node is folded. Totals in exact cents, ONE closing division;
    * `n_series` counts the distinct member series per group so the
    * collapse is auditable. Scale shape: one |paths × buckets|-row
    * re-aggregate on top of the summarize frame — never the points.
    */
  def groupByNode(spark: SparkSession, dir: String): DataFrame =
    summarized(Tables.metrics(spark, dir))
      .withColumn("node", expr(s"split(path, '\\\\.')[${GroupNode}]"))
      .groupBy("node", "bucket_ts")
      .agg(count_distinct(col("path")).as("n_series"),
        sum("n_points").as("n_points"),
        (sum("cents_sum") / lit(100.0)).as("total"))

  private val groupByNodeSql: String =
    s"""WITH $summarizeCtes
       |SELECT string_split(path, '.')[${GroupNode + 1}] AS node, bucket_ts,
       |       CAST(count(DISTINCT path) AS BIGINT) AS n_series,
       |       CAST(sum(n_points) AS BIGINT) AS n_points,
       |       CAST(sum(cents_sum) AS BIGINT) / 100.0 AS total
       |FROM summarized
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------- holtForecast

  /** Trailing window length for [[holtForecast]] (the truncation horizon). */
  val HoltPoints = 12
  /** Sub-cent fixed-point scale for the smoothing state (2^16). */
  val HoltScale = 65536L

  /** Graphite's `holtWintersForecast` reduced to the portable core the
    * aberration dashboards read: one-step-ahead double exponential
    * smoothing (level + trend, α = β = 1/2) over the trailing
    * [[HoltPoints]] points — the forecast whose deviation band
    * `series_anomaly`'s z-test is the testable half of.
    *
    * α = β = 1/2 makes every smoothing step a HALVING, so the whole
    * recurrence runs in integer fixed-point (cents · 2¹⁶): S' =
    * (x + S + B) >> 1, B' = ((S' − S) >> 1) + (B >> 1). The shifts are
    * ARITHMETIC (floor) in both engines — Spark `shiftright` and DuckDB
    * `>>` agree on negatives where `DIV`/`//` would not (Spark DIV
    * truncates, DuckDB // truncates, >> floors) — so the fold is
    * bit-identical under any data; truncation error per step is bounded
    * by 2⁻¹⁶ cents. Seeding is the window's first point (S = x₁, B = 0),
    * identical by construction in both folds. Scale shape: the shared
    * per-path window sort; the fold is row-local over ≤ 12 elements.
    */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
      .rowsBetween(-(HoltPoints - 1), Window.currentRow)
    cents(spark, dir)
      .withColumn("l", array_sort(
        collect_list(struct(col("ts"), col("event_id"), col("cents"))).over(w)))
      .select(col("path"), col("ts"), col("event_id"),
        expr(s"""aggregate(
          l,
          named_struct('s', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT)),
          (acc, x) -> CASE WHEN acc.n = 0
            THEN named_struct('s', x.cents * CAST($HoltScale AS BIGINT),
                              'b', CAST(0 AS BIGINT), 'n', CAST(1 AS BIGINT))
            ELSE named_struct(
              's', shiftright(x.cents * CAST($HoltScale AS BIGINT) + acc.s + acc.b, 1),
              'b', shiftright(shiftright(x.cents * CAST($HoltScale AS BIGINT) + acc.s + acc.b, 1) - acc.s, 1)
                   + shiftright(acc.b, 1),
              'n', acc.n + 1) END,
          acc -> round((acc.s + acc.b) / ($HoltScale * CAST(100 AS DOUBLE)), 6))""")
          .as("forecast"))
  }

  private[graft] val holtForecastSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |m AS (
       |  SELECT path, ts, event_id,
       |         list_sort(list({'ts': ts, 'ev': event_id, 'cents': cents}) OVER w) AS l
       |  FROM c
       |  WINDOW w AS (PARTITION BY path ORDER BY ts, event_id
       |               ROWS BETWEEN ${HoltPoints - 1} PRECEDING AND CURRENT ROW)
       |),
       |f AS (
       |  -- the accumulator is a 2-element LIST [s, b], not a struct: DuckDB's
       |  -- list_reduce mis-evaluates struct-building lambdas whose fields share
       |  -- subexpressions (the 'b' field sees a partially-updated accumulator);
       |  -- the list form folds correctly
       |  SELECT path, ts, event_id,
       |    list_reduce(
       |      list_transform(l, e -> [CAST(e.cents AS BIGINT) * $HoltScale,
       |                              CAST(0 AS BIGINT)]),
       |      (acc, e) -> [(e[1] + acc[1] + acc[2]) >> 1,
       |                   ((((e[1] + acc[1] + acc[2]) >> 1) - acc[1]) >> 1)
       |                   + (acc[2] >> 1)]
       |    ) AS st
       |  FROM m
       |)
       |SELECT path, ts, event_id,
       |       round((st[1] + st[2]) / ($HoltScale * 100.0), 6) AS forecast
       |FROM f""".stripMargin

  // -------------------------------------------------------- holtDeviation

  /** Aberration threshold in deviation units (graphite's default delta). */
  val HoltDevK = 3L

  /** The OTHER half of graphite's `holtWintersAberration`: alongside the
    * one-step-ahead forecast, smooth the absolute forecast error with the
    * same γ = 1/2 halving (dev' = (|x − ŷ| + dev) >> 1) and flag points
    * outside forecast ± [[HoltDevK]]·deviation — the confidence-band
    * aberration read, where `series_anomaly`'s z-test is the static-band
    * form. The verdict for a point tests it against the PREVIOUS point's
    * forecast/deviation (the band that existed before the point arrived),
    * entirely in fixed-point bigints — no float enters the boolean. The
    * fold extends [[holtForecast]]'s integer-halving recurrence with the
    * deviation term; each lambda field reads only the PRE-update
    * accumulator, so both engines fold identically. Scale shape: the
    * shared per-path window sort plus one lag over the same partitioning.
    */
  def holtDeviation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
      .rowsBetween(-(HoltPoints - 1), Window.currentRow)
    val lagW = Window.partitionBy("path").orderBy("ts", "event_id")
    cents(spark, dir)
      .withColumn("l", array_sort(
        collect_list(struct(col("ts"), col("event_id"), col("cents"))).over(w)))
      .withColumn("st", expr(s"""aggregate(
        l,
        named_struct('s', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
                     'd', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT)),
        (acc, x) -> CASE WHEN acc.n = 0
          THEN named_struct('s', x.cents * CAST($HoltScale AS BIGINT),
                            'b', CAST(0 AS BIGINT), 'd', CAST(0 AS BIGINT),
                            'n', CAST(1 AS BIGINT))
          ELSE named_struct(
            's', shiftright(x.cents * CAST($HoltScale AS BIGINT) + acc.s + acc.b, 1),
            'b', shiftright(shiftright(x.cents * CAST($HoltScale AS BIGINT) + acc.s + acc.b, 1) - acc.s, 1)
                 + shiftright(acc.b, 1),
            'd', shiftright(abs(x.cents * CAST($HoltScale AS BIGINT) - acc.s - acc.b) + acc.d, 1),
            'n', acc.n + 1) END,
        acc -> named_struct('fc', acc.s + acc.b, 'dev', acc.d))"""))
      .withColumn("prev_fc", lag(col("st.fc"), 1).over(lagW))
      .withColumn("prev_dev", lag(col("st.dev"), 1).over(lagW))
      .select(col("path"), col("ts"), col("event_id"), col("value"),
        round(col("st.fc") / lit(HoltScale * 100.0), 6).as("forecast"),
        round(col("st.dev") / lit(HoltScale * 100.0), 6).as("deviation"),
        when(col("prev_fc").isNotNull,
          abs(col("cents") * HoltScale - col("prev_fc")) >
            lit(HoltDevK) * col("prev_dev")).as("aberrant"))
  }

  private[graft] val holtDeviationSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |hd_m AS (
       |  SELECT path, ts, event_id, value, cents,
       |         list_sort(list({'ts': ts, 'ev': event_id, 'cents': cents}) OVER w) AS l
       |  FROM c
       |  WINDOW w AS (PARTITION BY path ORDER BY ts, event_id
       |               ROWS BETWEEN ${HoltPoints - 1} PRECEDING AND CURRENT ROW)
       |),
       |hd_f AS (
       |  -- LIST accumulator [s, b, d]: every element reads only the
       |  -- pre-update acc (the struct-lambda mis-evaluation gotcha)
       |  SELECT path, ts, event_id, value, cents,
       |    list_reduce(
       |      list_transform(l, e -> [CAST(e.cents AS BIGINT) * $HoltScale,
       |                              CAST(0 AS BIGINT), CAST(0 AS BIGINT)]),
       |      (acc, e) -> [(e[1] + acc[1] + acc[2]) >> 1,
       |                   ((((e[1] + acc[1] + acc[2]) >> 1) - acc[1]) >> 1)
       |                   + (acc[2] >> 1),
       |                   (abs(e[1] - acc[1] - acc[2]) + acc[3]) >> 1]
       |    ) AS st
       |  FROM hd_m
       |),
       |hd_g AS (
       |  SELECT path, ts, event_id, value, cents, st,
       |         lag(st[1] + st[2]) OVER lw AS prev_fc,
       |         lag(st[3]) OVER lw AS prev_dev
       |  FROM hd_f
       |  WINDOW lw AS (PARTITION BY path ORDER BY ts, event_id)
       |)
       |SELECT path, ts, event_id, value,
       |       round((st[1] + st[2]) / ($HoltScale * 100.0), 6) AS forecast,
       |       round(st[3] / ($HoltScale * 100.0), 6) AS deviation,
       |       CASE WHEN prev_fc IS NOT NULL
       |            THEN abs(cents * $HoltScale - prev_fc) > $HoltDevK * prev_dev
       |       END AS aberrant
       |FROM hd_g""".stripMargin

  // ------------------------------------------------------------ timeShift

  /** Comparison offset for [[timeShift]] (graphite `timeShift(…, "-1h")`). */
  val ShiftSec = 3600L

  /** Graphite's `timeShift` compare — the hour-over-hour dashboard read:
    * each series' aligned-bucket total beside its value [[ShiftSec]] ago,
    * with the absolute delta and the percent-of-previous ratio. Rides
    * [[summarized]]'s epoch-aligned buckets (the oracle composes the SAME
    * CTE), so the alignment cannot drift from `series_summarize`. Buckets
    * with no predecessor keep null prev/delta/pct; zero-valued
    * predecessors null only the ratio (no 0-division), guarded
    * identically in both engines. Scale shape: one summarize aggregate
    * plus a self-join keyed on (path, bucket_ts) — the grouping key the
    * aggregate already partitioned by, carrying |paths × buckets| rows,
    * never points.
    */
  def timeShift(spark: SparkSession, dir: String): DataFrame = {
    val cur = summarized(Tables.metrics(spark, dir))
    val prev = cur.select(col("path"),
      (col("bucket_ts") + ShiftSec).as("bucket_ts"),
      col("cents_sum").as("prev_cents"))
    cur.join(prev, Seq("path", "bucket_ts"), "left")
      .select(col("path"), col("bucket_ts"),
        (col("cents_sum") / lit(100.0)).as("total"),
        (col("prev_cents") / lit(100.0)).as("prev_total"),
        ((col("cents_sum") - col("prev_cents")) / lit(100.0)).as("delta"),
        when(col("prev_cents") =!= 0,
          round(col("cents_sum") * 100 / col("prev_cents").cast("double"), 6))
          .as("pct_of_prev"))
  }

  private val timeShiftSql: String =
    s"""WITH $summarizeCtes
       |SELECT cur.path, cur.bucket_ts,
       |       cur.cents_sum / 100.0 AS total,
       |       prev.cents_sum / 100.0 AS prev_total,
       |       (cur.cents_sum - prev.cents_sum) / 100.0 AS delta,
       |       CASE WHEN prev.cents_sum <> 0
       |            THEN round(cur.cents_sum * 100 / CAST(prev.cents_sum AS DOUBLE), 6)
       |       END AS pct_of_prev
       |FROM summarized cur LEFT JOIN summarized prev
       |  ON cur.path = prev.path AND prev.bucket_ts = cur.bucket_ts - $ShiftSec""".stripMargin

  // ------------------------------------------------------------- linreg

  /** Forecast horizon for [[linreg]]'s `forecast_next` (one summarize
    * bucket ahead — the grid a dashboard would render the fit onto).
    */
  val LinregAheadSec: Long = SummarizeBucketSec

  /** The per-path least-squares moment tuple `(n, Σx, Σy, Σxy, Σx², x_last)`
    * with x = ts seconds and y = exact cents — ONE order-immune aggregate
    * per path, which is why it is also exactly what a stream can maintain
    * (`stream_linreg`). Σxy and Σx² exceed int64 at epoch-second scale, so
    * the sums run in decimal(38) (Spark) / HUGEINT (DuckDB) — exact integer
    * arithmetic in both engines.
    */
  private[graft] def linregMomentsFrom(cents: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    cents.groupBy("path").agg(
      count(lit(1)).as("n"),
      sum(col("ts").cast(dec)).as("sx"),
      sum(col("cents").cast(dec)).as("sy"),
      sum(col("ts").cast(dec) * col("cents").cast(dec)).as("sxy"),
      sum(col("ts").cast(dec) * col("ts").cast(dec)).as("sxx"),
      max(col("ts")).as("x_last"))
  }

  /** The fit readoff over a moment frame — shared verbatim by
    * `series_linreg` and `stream_linreg`'s drained-state readoff. Slope and
    * the two fitted points are emitted as exact BIGINT micro-units
    * (micro-value-units per second / micro-value-units): every column is an
    * integer RATIO `fn / fd` truncated at 10^-6 precision via the
    * quotient/remainder split `(fn DIV fd)·10^6 + ((fn MOD fd)·10^6) DIV fd`
    * — no float is ever produced, so no engine's wide-int→double cast or
    * `round` implementation can flip a hash (the r12 driver-red failure
    * class: both operands exceeded 2^53). Both engines' integer division
    * truncates toward zero and MOD carries the dividend's sign, so the two
    * terms share a sign and add without a carry. Width bound: the largest
    * intermediate is `(fn MOD fd)·10^6 < fd·10^6 = n·den·10^8 ≤
    * n³·span²·10^8` where span = max(ts)−min(ts) per path (den = n²·var(x)
    * is SHIFT-INVARIANT, so raw epoch ts does not widen it) — within
    * decimal(38)/HUGEINT for n·span ≤ ~10^10 point-seconds³ per path
    * (fixture: n≈10^4, span≈10^5 → 10^39/10^8… i.e. 10^27·10^8 = 10^35).
    * Paths with zero x-variance (single point, or all points sharing a
    * timestamp) have no defined line and yield nulls.
    */
  private[graft] def linregFrom(m: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    def micro(fn: String, fd: String): Column =
      expr(s"($fn div $fd) * 1000000 + (($fn % $fd) * 1000000) div $fd")
    def fnAt(x: Column): Column =
      col("den") * col("sy") +
        col("num") * (col("n").cast(dec) * x.cast(dec) - col("sx"))
    m.withColumn("num", col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
      .withColumn("sd", col("den") * lit(100L).cast(dec))
      .withColumn("fd", col("n").cast(dec) * col("den") * lit(100L).cast(dec))
      .withColumn("fn_last", fnAt(col("x_last")))
      .withColumn("fn_next", fnAt(col("x_last") + LinregAheadSec))
      .select(col("path"), col("n"),
        when(col("den") =!= 0, micro("num", "sd")).as("slope_micro"),
        when(col("den") =!= 0, micro("fn_last", "fd")).as("fit_last_micro"),
        when(col("den") =!= 0, micro("fn_next", "fd")).as("forecast_next_micro"))
  }

  /** Graphite's `linearRegression(seriesList)`: the per-path least-squares
    * line over (ts, value), reported as slope (micro-value-units per
    * second, exact BIGINT — see [[linregFrom]] for the no-float contract),
    * the fit at the path's last point, and the one-bucket-ahead forecast —
    * the trend read capacity planning runs. Scale shape: ONE groupBy(path)
    * aggregate with map-side partial combine (the moment tuple is six
    * numbers per path), then a map-only readoff over the |paths|-row
    * frame; nothing widens with the point count.
    */
  def linreg(spark: SparkSession, dir: String): DataFrame =
    linregFrom(linregMomentsFrom(cents(spark, dir)))

  private[graft] val linregSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |lm AS (
       |  SELECT path, count(*) AS n,
       |         sum(CAST(ts AS HUGEINT)) AS sx,
       |         sum(CAST(cents AS HUGEINT)) AS sy,
       |         sum(CAST(ts AS HUGEINT) * cents) AS sxy,
       |         sum(CAST(ts AS HUGEINT) * ts) AS sxx,
       |         max(ts) AS x_last
       |  FROM c GROUP BY 1
       |),
       |ld AS (
       |  SELECT path, n, sx, sy, sxy, sxx, x_last,
       |         CAST(n AS HUGEINT) * sxy - sx * sy AS num,
       |         CAST(n AS HUGEINT) * sxx - sx * sx AS den
       |  FROM lm
       |),
       |lf AS (
       |  SELECT path, n, x_last, num, den,
       |         den * 100 AS sd,
       |         CAST(n AS HUGEINT) * den * 100 AS fd,
       |         den * sy + num * (CAST(n AS HUGEINT) * x_last - sx) AS fn_last,
       |         den * sy + num * (CAST(n AS HUGEINT) * (x_last + $LinregAheadSec) - sx) AS fn_next
       |  FROM ld
       |)
       |SELECT path, CAST(n AS BIGINT) AS n,
       |       CASE WHEN den <> 0
       |            THEN CAST((num // sd) * 1000000 + ((num % sd) * 1000000) // sd AS BIGINT)
       |       END AS slope_micro,
       |       CASE WHEN den <> 0
       |            THEN CAST((fn_last // fd) * 1000000 + ((fn_last % fd) * 1000000) // fd AS BIGINT)
       |       END AS fit_last_micro,
       |       CASE WHEN den <> 0
       |            THEN CAST((fn_next // fd) * 1000000 + ((fn_next % fd) * 1000000) // fd AS BIGINT)
       |       END AS forecast_next_micro
       |FROM lf""".stripMargin

  // --------------------------------------------------- removeAbovePercentile

  /** Percentile cut for [[removeOutliers]] (graphite
    * `removeAbovePercentile(seriesList, 90)`).
    */
  val RemovePercentile = 90L

  /** Graphite's `removeAbovePercentile(seriesList, p)`: null out each
    * path's points above that path's p-th percentile — the spike-clipping
    * read dashboards stack under `movingAverage`. The cut is the
    * nearest-rank ORDER STATISTIC (`(n·p + 99) DIV 100`-th smallest
    * exact-cents value — the `series_percentile` rule), so the verdict is
    * pure integer comparison; removed points keep their row (stat = null)
    * exactly like the reference's gap semantics. Scale shape: one per-path
    * rank window (the same exchange every series op reuses) collapsing to
    * a |paths|-row cut frame that broadcasts back onto the scan.
    */
  def removeOutliers(spark: SparkSession, dir: String): DataFrame = {
    val c = cents(spark, dir)
    val w = Window.partitionBy("path").orderBy("cents", "ts", "event_id")
    val cuts = c
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("path")))
      .groupBy("path")
      .agg(max(when(col("r") === expr(s"(n * $RemovePercentile + 99) DIV 100"),
        col("cents"))).as("cut_cents"))
    c.join(broadcast(cuts), "path")
      .select(col("path"), col("ts"), col("event_id"),
        (col("cents") > col("cut_cents")).as("removed"),
        when(col("cents") <= col("cut_cents"), col("value")).as("kept_value"),
        (col("cut_cents") / lit(100.0)).as("cut"))
  }

  private val removeOutliersSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |rr AS (
       |  SELECT path, ts, event_id, value, cents,
       |         row_number() OVER (PARTITION BY path
       |                            ORDER BY cents, ts, event_id) AS r,
       |         CAST(count(*) OVER (PARTITION BY path) AS BIGINT) AS n
       |  FROM c
       |),
       |cuts AS (
       |  SELECT path,
       |         max(CASE WHEN r = (n * $RemovePercentile + 99) // 100
       |                  THEN cents END) AS cut_cents
       |  FROM rr GROUP BY 1
       |)
       |SELECT c.path, c.ts, c.event_id,
       |       c.cents > cut_cents AS removed,
       |       CASE WHEN c.cents <= cut_cents THEN c.value END AS kept_value,
       |       cut_cents / 100.0 AS cut
       |FROM c JOIN cuts ON c.path = cuts.path""".stripMargin

  // ------------------------------------------------------------- hitcount

  /** Graphite's `hitcount(seriesList, "10min")`: convert a rate series to
    * per-bucket hit totals — each point contributes value × (seconds since
    * the path's previous point), re-bucketed onto the epoch-aligned
    * [[SummarizeBucketSec]] grid. Each path's FIRST point has no preceding
    * interval and contributes 0 (the reference skips the pre-history
    * interval the same way). DEVIATION from graphite: each point's whole
    * value×dt product is credited to the bucket containing ts; graphite
    * apportions an interval that SPANS bucket boundaries across them
    * proportionally, so buckets adjacent to points sparser than the bucket
    * width over/under-report vs the reference (both engines here agree —
    * the oracle gates the single-bucket attribution semantics, not
    * graphite's). The products are exact cents·seconds bigints;
    * the ONE float is the closing /100. Scale shape: the shared per-path
    * window sort, then one groupBy whose map-side combine collapses to
    * |paths × buckets| rows.
    */
  def hitcount(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("path").orderBy("ts", "event_id")
    cents(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .groupBy(col("path"),
        (col("ts") - pmod(col("ts"), lit(SummarizeBucketSec))).as("bucket_ts"))
      .agg(count(lit(1)).as("n_points"),
        sum(coalesce((col("ts") - col("prev_ts")) * col("cents"), lit(0L)))
          .as("hc"))
      .select(col("path"), col("bucket_ts"), col("n_points"),
        (col("hc") / lit(100.0)).as("hits"))
  }

  private val hitcountSql: String =
    s"""WITH ${Tables.metricsSql},
       |$centsCte,
       |hl AS (
       |  SELECT path, ts, cents,
       |         lag(ts) OVER (PARTITION BY path ORDER BY ts, event_id) AS prev_ts
       |  FROM c
       |)
       |SELECT path, ts - ts % $SummarizeBucketSec AS bucket_ts,
       |       CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(sum(coalesce((ts - prev_ts) * cents, 0)) AS BIGINT) / 100.0 AS hits
       |FROM hl GROUP BY 1, 2""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("series_nonneg_derivative", nonNegDerivative, Some(nonNegDerivativeSql)),
    Op("series_integral", integral, Some(integralSql)),
    Op("series_top", topSeries, Some(topSeriesSql)),
    Op("series_fill", fillLast, Some(fillLastSql)),
    Op("series_anomaly", anomaly, Some(anomalySql)),
    Op("series_summarize", summarize, Some(summarizeSql)),
    Op("series_percentile", percentileOfSeries, Some(percentileSql)),
    Op("series_aspercent", asPercent, Some(asPercentSql)),
    Op("series_stddev", movingStdDev, Some(movingStdDevSql)),
    Op("series_moving_median", movingMedian, Some(movingMedianSql)),
    Op("series_ewma", ewma, Some(ewmaSql)),
    Op("series_timeshift", timeShift, Some(timeShiftSql)),
    Op("series_holt_forecast", holtForecast, Some(holtForecastSql)),
    Op("series_group_by_node", groupByNode, Some(groupByNodeSql)),
    Op("series_linreg", linreg, Some(linregSql)),
    Op("series_holt_deviation", holtDeviation, Some(holtDeviationSql)),
    Op("series_remove_outliers", removeOutliers, Some(removeOutliersSql)),
    Op("series_hitcount", hitcount, Some(hitcountSql))
  )
}
