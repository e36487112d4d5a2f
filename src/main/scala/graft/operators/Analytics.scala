package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Op
import graft.model.Tables

/** General analytics head: the engine doubles as a plain OLAP library, and
  * these are the bench anchors (TPC-H-shaped joins/aggregations plus
  * gap-based sessionization).
  *
  * Money math is done in fixed-point bigint cents (the columns are 2-decimal
  * by construction), so every sum is an EXACT integer — immune to float
  * summation order, deterministic across engines and partitionings. The
  * displayed doubles are single correctly-rounded divisions of those ints.
  *
  * Scale posture: q1 is a single-pass partial agg (one shuffle of ~8 groups);
  * q3/q5 broadcast every dimension (customer/supplier/nation/region) so the
  * only shuffle is the orders⋈lineitem equi-join on orderkey; sessionize is
  * one shuffle on user_id with in-partition ordering.
  */
object Analytics {

  private val centsL    = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val discPctL  = "CAST(round(l_discount * 100) AS BIGINT)"
  private val taxPctL   = "CAST(round(l_tax * 100) AS BIGINT)"

  // ---------------------------------------------------------------- q1_pricing

  val Q1Cutoff = "1998-09-02"

  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(expr(s"l_shipdate <= timestamp '$Q1Cutoff'"))
      .withColumn("cents", expr(centsL))
      .withColumn("d", expr(discPctL))
      .withColumn("t", expr(taxPctL))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("cents").as("base_fp"),
        sum(expr("cents * (100 - d)")).as("disc_fp"),
        sum(expr("cents * (100 - d) * (100 + t)")).as("charge_fp"),
        sum("d").as("d_fp"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("base_fp") / 100.0).as("sum_base_price"),
        (col("disc_fp") / 10000.0).as("sum_disc_price"),
        (col("charge_fp") / 1000000.0).as("sum_charge"),
        round(col("sum_qty") / col("count_order"), 6).as("avg_qty"),
        round(col("base_fp") / 100.0 / col("count_order"), 6).as("avg_price"),
        round(col("d_fp") / 100.0 / col("count_order"), 6).as("avg_disc"),
        col("count_order"))

  private val q1Sql: String =
    s"""WITH f AS (
       |  SELECT l_returnflag, l_linestatus, l_quantity,
       |         $centsL AS cents, $discPctL AS d, $taxPctL AS t
       |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '$Q1Cutoff'
       |),
       |g AS (
       |  SELECT l_returnflag, l_linestatus,
       |         sum(l_quantity) AS sum_qty,
       |         CAST(sum(cents) AS BIGINT) AS base_fp,
       |         CAST(sum(cents * (100 - d)) AS BIGINT) AS disc_fp,
       |         CAST(sum(cents * (100 - d) * (100 + t)) AS BIGINT) AS charge_fp,
       |         CAST(sum(d) AS BIGINT) AS d_fp,
       |         CAST(count(*) AS BIGINT) AS count_order
       |  FROM f GROUP BY 1, 2
       |)
       |SELECT l_returnflag, l_linestatus, sum_qty,
       |       base_fp / 100.0 AS sum_base_price,
       |       disc_fp / 10000.0 AS sum_disc_price,
       |       charge_fp / 1000000.0 AS sum_charge,
       |       round(sum_qty / count_order, 6) AS avg_qty,
       |       round(base_fp / 100.0 / count_order, 6) AS avg_price,
       |       round(d_fp / 100.0 / count_order, 6) AS avg_disc,
       |       count_order
       |FROM g""".stripMargin

  // --------------------------------------------------------------- q3_shipping

  val Q3Date = "1998-01-01"
  val Q3Segment = "BUILDING"

  /** Top-10 open orders by revenue: broadcast customer, shuffle join
    * orders⋈lineitem on orderkey; ordering is on the EXACT fixed-point
    * revenue with orderkey tiebreak, so the limit-10 frontier is stable.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === Q3Segment)
    val ord = Tables.orders(spark, dir)
      .filter(expr(s"o_orderdate < timestamp '$Q3Date'"))
    val li = Tables.lineitem(spark, dir)
      .filter(expr(s"l_shipdate > timestamp '$Q3Date'"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(expr(s"$centsL * (100 - $discPctL)")).as("rev_fp"))
      .orderBy(col("rev_fp").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"),
        (col("rev_fp") / 10000.0).as("revenue"))
  }

  private val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
       |       CAST(sum($centsL * (100 - $discPctL)) AS BIGINT) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = '$Q3Segment'
       |  AND o_orderdate < TIMESTAMP '$Q3Date'
       |  AND l_shipdate > TIMESTAMP '$Q3Date'
       |GROUP BY 1, 2
       |ORDER BY CAST(sum($centsL * (100 - $discPctL)) AS BIGINT) DESC, l_orderkey
       |LIMIT 10""".stripMargin

  // ----------------------------------------------------------------- q5_region

  val Q5Region = "ASIA"
  val Q5Year = "1996"

  /** Revenue per nation for local supply chains (customer and supplier in
    * the same nation) within one region-year. The whole dimension chain
    * (region→nation→customer + supplier) broadcasts; the single shuffle is
    * orders⋈lineitem on orderkey.
    */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === Q5Region)
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir).filter(expr(
      s"o_orderdate >= timestamp '$Q5Year-01-01' AND o_orderdate < timestamp '${Q5Year.toInt + 1}-01-01'"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(expr(s"$centsL * (100 - $discPctL)")).as("rev_fp"))
      .select(col("n_name"), (col("rev_fp") / 10000.0).as("revenue"))
  }

  private val q5Sql: String =
    s"""SELECT n_name,
       |       CAST(sum($centsL * (100 - $discPctL)) AS BIGINT) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$Q5Region'
       |  AND o_orderdate >= TIMESTAMP '$Q5Year-01-01'
       |  AND o_orderdate < TIMESTAMP '${Q5Year.toInt + 1}-01-01'
       |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q6_revenue

  /** Forecast-revenue-change (TPC-H Q6 shape): pure scan-filter-aggregate,
    * the lower bound for single-pass throughput — every predicate reaches
    * the parquet scan, result is one row.
    */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(expr(
        """l_shipdate >= timestamp '1996-01-01' AND l_shipdate < timestamp '1997-01-01'
          |AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24""".stripMargin))
      .agg(sum(expr(s"$centsL * $discPctL")).as("rev_fp"),
        count(lit(1)).as("n_items"))
      .select((col("rev_fp") / 10000.0).as("revenue"), col("n_items"))

  private val q6Sql: String =
    s"""SELECT CAST(sum($centsL * $discPctL) AS BIGINT) / 10000.0 AS revenue,
       |       CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- sessionize

  val SessionGapSec = 1800L

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds 30 min. One shuffle on user_id; `lag` + running
    * sum inside the partition (arrival order = (ts, event_id)).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000000000").as("ts_sec"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    ev.withColumn("prev", lag("ts_sec", 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_sec") - col("prev") > SessionGapSec, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min("ts_sec").as("session_start"), max("ts_sec").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  private val sessionizeSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec, event_id
       |  FROM events
       |),
       |flagged AS (
       |  SELECT user_id, ts_sec, event_id,
       |         CASE WHEN lag(ts_sec) OVER w IS NULL
       |                   OR ts_sec - lag(ts_sec) OVER w > $SessionGapSec
       |              THEN 1 ELSE 0 END AS new_sess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
       |),
       |sessions AS (
       |  SELECT user_id, ts_sec,
       |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |       min(ts_sec) AS session_start, max(ts_sec) AS session_end,
       |       CAST(count(*) AS BIGINT) AS n_events
       |FROM sessions GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q14_promo

  /** Promo revenue share per ship month (TPC-H Q14 shape): lineitem ⋈
    * broadcast part; numerator/denominator both exact fixed-point sums,
    * one double division at the end.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(expr("l_shipdate >= timestamp '1997-01-01' AND l_shipdate < timestamp '1998-01-01'"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        sum(expr(s"CASE WHEN p_type = 'PROMO' THEN $centsL * (100 - $discPctL) ELSE CAST(0 AS BIGINT) END")).as("promo_fp"),
        sum(expr(s"$centsL * (100 - $discPctL)")).as("total_fp"))
      .select(col("ship_month"),
        round(lit(100.0) * col("promo_fp") / col("total_fp"), 6).as("promo_share"),
        (col("total_fp") / 10000.0).as("total_revenue"))

  private val q14Sql: String =
    s"""WITH g AS (
       |  SELECT date_trunc('month', l_shipdate) AS ship_month,
       |         CAST(sum(CASE WHEN p_type = 'PROMO' THEN $centsL * (100 - $discPctL) ELSE 0 END) AS BIGINT) AS promo_fp,
       |         CAST(sum($centsL * (100 - $discPctL)) AS BIGINT) AS total_fp
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
       |  GROUP BY 1
       |)
       |SELECT ship_month, round(100.0 * promo_fp / total_fp, 6) AS promo_share,
       |       total_fp / 10000.0 AS total_revenue
       |FROM g""".stripMargin

  // -------------------------------------------------------------- event_props

  /** Semi-structured column handling: the events `props` JSON payload,
    * extracted and aggregated per event type. Spark side uses a real JSON
    * path (`get_json_object`); the oracle reads the same field via regex so
    * it needs no DuckDB JSON extension.
    */
  def eventProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("k_sum"),
        min("k").as("k_min"),
        max("k").as("k_max"),
        round(avg("k"), 6).as("k_avg"))

  private val eventPropsSql: String =
    """SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(k) AS BIGINT) AS k_sum,
      |       min(k) AS k_min, max(k) AS k_max,
      |       round(avg(k), 6) AS k_avg
      |FROM (
      |  SELECT event_type,
      |         CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k
      |  FROM events
      |)
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- funnel_steps

  /** The ordered conversion funnel over the event stream. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Ordered-funnel analysis — the product-analytics read every event
    * pipeline serves: of the users who did step 1, how many went on to do
    * step 2 AFTER it, then step 3 after that, and how long each hop took.
    * "After" is strict in the engine's total event order — the SAME packed
    * `(ts, event_id)` key LAST rollups use ([[graft.model.RollupConfig
    * .LastKeyShift]]), so simultaneous-timestamp events order identically
    * in both engines.
    *
    * Scale shape: each stage is a per-user min aggregation over ONE event
    * type's rows (the filter pushes to the scan) joined back on user_id —
    * the co-partitioned key every stage reuses; the closing frame is
    * |steps| rows. Latency averages are exact integer sums with one
    * closing division.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val shift = graft.model.RollupConfig.LastKeyShift
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr(s"(ts DIV 1000000000) * $shift + event_id").as("k"))
    // stage n: first step-n event strictly after the user's stage-(n-1) key
    val s1 = ev.filter(col("event_type") === FunnelSteps.head)
      .groupBy("user_id").agg(min("k").as("k1"))
    val s2 = ev.filter(col("event_type") === FunnelSteps(1))
      .join(s1, "user_id").filter(col("k") > col("k1"))
      .groupBy("user_id", "k1").agg(min("k").as("k2"))
    val s3 = ev.filter(col("event_type") === FunnelSteps(2))
      .join(s2, "user_id").filter(col("k") > col("k2"))
      .groupBy("user_id", "k2").agg(min("k").as("k3"))
    funnelAggFrom(s1, s2, s3)
  }

  /** The closing 3-row funnel aggregate over per-user stage frames
    * `s1(user_id, k1)`, `s2(user_id, k1, k2)`, `s3(user_id, k2, k3)` —
    * shared with `stream_funnel`'s readoff so the latency and conversion
    * arithmetic cannot drift between the batch and live forms.
    */
  private[graft] def funnelAggFrom(s1: DataFrame, s2: DataFrame,
      s3: DataFrame): DataFrame = {
    val shift = graft.model.RollupConfig.LastKeyShift
    def lat(a: String, b: String) = expr(s"$b DIV $shift - $a DIV $shift")
    val a1 = s1.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("step"), lit(FunnelSteps.head).as("event_type"),
        col("n_users"), lit(null).cast("double").as("avg_step_sec"))
    val a2 = s2.agg(count(lit(1)).as("n_users"),
        sum(lat("k1", "k2")).as("lat"))
      .select(lit(2).as("step"), lit(FunnelSteps(1)).as("event_type"),
        col("n_users"),
        round(col("lat") / col("n_users").cast("double"), 6).as("avg_step_sec"))
    val a3 = s3.agg(count(lit(1)).as("n_users"),
        sum(lat("k2", "k3")).as("lat"))
      .select(lit(3).as("step"), lit(FunnelSteps(2)).as("event_type"),
        col("n_users"),
        round(col("lat") / col("n_users").cast("double"), 6).as("avg_step_sec"))
    // NULL (not NaN) on an empty funnel: Spark's 0/0.0 is NaN while SQL
    // engines differ — the CASE guard keeps the degenerate corpus portable
    val base = max(when(col("step") === 1, col("n_users")))
      .over(Window.partitionBy())
    a1.unionByName(a2).unionByName(a3)
      .withColumn("conv_pct", when(base > 0,
        round(col("n_users") * 100 / base.cast("double"), 6)))
  }

  private[graft] val funnelSql: String = {
    val shift = graft.model.RollupConfig.LastKeyShift
    s"""WITH fev AS (
       |  SELECT user_id, event_type,
       |         (epoch_ns(ts) // 1000000000) * $shift + event_id AS k
       |  FROM events
       |),
       |f1 AS (SELECT user_id, min(k) AS k1 FROM fev
       |       WHERE event_type = '${FunnelSteps.head}' GROUP BY 1),
       |f2 AS (SELECT e.user_id, f1.k1, min(e.k) AS k2
       |       FROM fev e JOIN f1 ON e.user_id = f1.user_id
       |       WHERE e.event_type = '${FunnelSteps(1)}' AND e.k > f1.k1
       |       GROUP BY 1, 2),
       |f3 AS (SELECT e.user_id, f2.k2, min(e.k) AS k3
       |       FROM fev e JOIN f2 ON e.user_id = f2.user_id
       |       WHERE e.event_type = '${FunnelSteps(2)}' AND e.k > f2.k2
       |       GROUP BY 1, 2),
       |steps AS (
       |  SELECT 1 AS step, '${FunnelSteps.head}' AS event_type,
       |         CAST(count(*) AS BIGINT) AS n_users,
       |         CAST(NULL AS DOUBLE) AS avg_step_sec
       |  FROM f1
       |  UNION ALL
       |  SELECT 2, '${FunnelSteps(1)}', CAST(count(*) AS BIGINT),
       |         round(CAST(sum(k2 // $shift - k1 // $shift) AS BIGINT)
       |               / CAST(count(*) AS DOUBLE), 6)
       |  FROM f2
       |  UNION ALL
       |  SELECT 3, '${FunnelSteps(2)}', CAST(count(*) AS BIGINT),
       |         round(CAST(sum(k3 // $shift - k2 // $shift) AS BIGINT)
       |               / CAST(count(*) AS DOUBLE), 6)
       |  FROM f3
       |)
       |SELECT CAST(step AS INT) AS step, event_type, n_users, avg_step_sec,
       |       CASE WHEN max(CASE WHEN step = 1 THEN n_users END) OVER () > 0
       |            THEN round(n_users * 100 / CAST(max(CASE WHEN step = 1 THEN n_users END)
       |                                            OVER () AS DOUBLE), 6) END AS conv_pct
       |FROM steps""".stripMargin
  }

  // --------------------------------------------------------- cohort_retention

  /** Seconds per retention-cohort bucket (epoch-aligned weeks). */
  val CohortWeekSec = 604800L

  /** Cohort retention — the other standing product-analytics read: users
    * grouped by first-seen week, and for each later week the share of the
    * cohort still active. All-integer algebra (epoch-week = ts DIV 7d,
    * activity de-duplicated on (user, week) so counts are exact distinct
    * users) with ONE closing division per row.
    *
    * Scale shape: a per-user min aggregation, a (user, week) distinct, and
    * a join back on user_id — all partitioned on the user key the event
    * stream naturally groups by; the closing (cohort, offset) aggregate is
    * |weeks²| rows. No window over the data stream, no collect.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortFrom(Tables.events(spark, dir)
      .select(col("user_id"),
        expr(s"ts DIV 1000000000 DIV $CohortWeekSec").as("week"))
      .distinct())

  /** The retention matrix over a de-duplicated `(user_id, week)` activity
    * frame — the split that lets `stream_cohort` maintain the activity
    * matrix LIVE (first-seen and distinct-activity are both order-immune,
    * so the frame is exactly what a stream can keep) and share everything
    * downstream with the batch op.
    */
  private[graft] def cohortFrom(activity: DataFrame): DataFrame = {
    val first = activity.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = first.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    activity
      .join(first, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active") * 100 / col("cohort_size").cast("double"), 6)
          .as("retention_pct"))
  }

  private[graft] val cohortSql: String =
    s"""WITH cev AS (
       |  SELECT DISTINCT user_id,
       |         epoch_ns(ts) // 1000000000 // $CohortWeekSec AS week
       |  FROM events
       |),
       |cfirst AS (SELECT user_id, min(week) AS cohort_week FROM cev GROUP BY 1),
       |csizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
       |           FROM cfirst GROUP BY 1),
       |cact AS (
       |  SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
       |         CAST(count(*) AS BIGINT) AS n_active
       |  FROM cev e JOIN cfirst f ON e.user_id = f.user_id
       |  GROUP BY 1, 2
       |)
       |SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
       |       round(a.n_active * 100 / CAST(s.cohort_size AS DOUBLE), 6)
       |         AS retention_pct
       |FROM cact a JOIN csizes s ON a.cohort_week = s.cohort_week""".stripMargin

  // -------------------------------------------------------- event_attribution

  /** The conversion event type for [[eventAttribution]]. */
  val AttributionConversion = "purchase"

  /** First-touch attribution — the third standing product-analytics read
    * beside the funnel and the cohort matrix: every user's conversions
    * and revenue are credited to the channel (event type) of their FIRST
    * event, in the same packed (ts, event_id) total order the funnel
    * uses, so simultaneous first events attribute identically in both
    * engines. Revenue is exact cents with ONE closing division.
    *
    * Scale shape: one per-user `min_by` aggregate (the arg-min rides the
    * unique packed key — no window) and one per-user conversion
    * aggregate, joined on the user key both already produced; the
    * closing channel frame is |event types| rows.
    */
  def eventAttribution(spark: SparkSession, dir: String): DataFrame = {
    val shift = graft.model.RollupConfig.LastKeyShift
    attributionFrom(attributionPerUser(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr(s"(ts DIV 1000000000) * $shift + event_id").as("k"))))
  }

  /** The per-user attribution state `(user_id, channel, n_conv,
    * conv_cents)` — ONE aggregate whose parts are all order-immune
    * (arg-min on a unique key, conditional count/sum), which is why
    * `stream_attribution` can maintain it live in complete mode.
    */
  private[graft] def attributionPerUser(ev: DataFrame): DataFrame =
    ev.groupBy("user_id").agg(
      min_by(col("event_type"), col("k")).as("channel"),
      sum(when(col("event_type") === AttributionConversion, lit(1L))
        .otherwise(lit(0L))).as("n_conv"),
      sum(when(col("event_type") === AttributionConversion, col("cents"))
        .otherwise(lit(0L))).as("conv_cents"))

  /** The closing channel aggregate — shared with `stream_attribution`'s
    * readoff so the crediting arithmetic cannot drift.
    */
  private[graft] def attributionFrom(perUser: DataFrame): DataFrame =
    perUser.groupBy("channel")
      .agg(count(lit(1)).as("n_users"),
        sum("n_conv").as("n_conversions"),
        sum("conv_cents").as("cents"))
      .select(col("channel"), col("n_users"), col("n_conversions"),
        (col("cents") / lit(100.0)).as("revenue"),
        round(col("cents") / (col("n_users") * lit(100.0)), 6)
          .as("revenue_per_user"))

  private[graft] val attributionSql: String = {
    val shift = graft.model.RollupConfig.LastKeyShift
    s"""WITH aev AS (
       |  SELECT user_id, event_type,
       |         CAST(round(value * 100) AS BIGINT) AS cents,
       |         (epoch_ns(ts) // 1000000000) * $shift + event_id AS k
       |  FROM events
       |),
       |afirst AS (
       |  SELECT user_id, arg_min(event_type, k) AS channel FROM aev GROUP BY 1
       |),
       |aconv AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_conv,
       |         CAST(sum(cents) AS BIGINT) AS conv_cents
       |  FROM aev WHERE event_type = '$AttributionConversion' GROUP BY 1
       |)
       |SELECT f.channel, CAST(count(*) AS BIGINT) AS n_users,
       |       CAST(sum(coalesce(c.n_conv, 0)) AS BIGINT) AS n_conversions,
       |       CAST(sum(coalesce(c.conv_cents, 0)) AS BIGINT) / 100.0 AS revenue,
       |       round(CAST(sum(coalesce(c.conv_cents, 0)) AS BIGINT)
       |             / (count(*) * 100.0), 6) AS revenue_per_user
       |FROM afirst f LEFT JOIN aconv c ON f.user_id = c.user_id
       |GROUP BY 1""".stripMargin
  }

  // --------------------------------------------------------------- user_rfm

  /** RFM segmentation — the classic user-value read: each user scored
    * 1–4 by quartile on Recency (latest event, the packed key), Frequency
    * (event count), and Monetary (exact purchase cents), then labeled
    * with the three-digit segment ("444" = recent, frequent, high-spend).
    *
    * The quartile rule is pure integer rank algebra — `score =
    * ((rank−1)·4) DIV n + 1` over a `row_number` whose ORDER BY ends in
    * the unique user_id — so ties are broken identically in both engines
    * and every score is deterministic under any partitioning (no ntile
    * remainder-placement subtleties to diverge on).
    *
    * Scale shape: one per-user aggregate, then three rank windows over
    * the |users|-row RFM frame (the output's own size) — the sort is the
    * only exchange past the user aggregate.
    */
  def userRfm(spark: SparkSession, dir: String): DataFrame = {
    val shift = graft.model.RollupConfig.LastKeyShift
    rfmFrom(rfmPerUser(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr(s"(ts DIV 1000000000) * $shift + event_id").as("k"))))
  }

  /** The per-user RFM state `(user_id, r_v, f_v, m_v)` — ONE aggregate of
    * order-immune parts (max, count, conditional sum), which is why
    * `stream_rfm` can maintain it live in complete mode.
    */
  private[graft] def rfmPerUser(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(max("k").as("r_v"), count(lit(1)).as("f_v"),
        sum(when(col("event_type") === AttributionConversion, col("cents"))
          .otherwise(lit(0L))).as("m_v"))

  /** The quartile scoring over any per-user RFM frame — shared with
    * `stream_rfm`'s readoff so the rank algebra cannot drift.
    *
    * The rank rule is `score = ((rank−1)·4) DIV n + 1` with rank =
    * row_number ordered by (value, user_id) — but it is NOT computed as
    * three partition-less rank windows (each of which would funnel every
    * user through one task). Rearranged: `score ≥ s+1 ⟺ rank ≥
    * ceil(s·n/4)+1`, so the whole segmentation is determined by at most
    * NINE cut pairs — the (value, user_id) order statistics at the three
    * quartile boundary ranks of each dimension. Those are read exactly via
    * [[Partitioning.withGlobalRank]] (a distributed range sort of the slim
    * tagged (dim, value, user_id) projection — each dimension has exactly
    * n rows, so global position p in the union maps to in-dimension rank
    * p − dim·n), collected (≤ 9 rows), and scoring becomes a map-side
    * lexicographic compare against the broadcast cut pairs. The per-user
    * frame is touched once, with no exchange past its own aggregation.
    */
  private[graft] def rfmFrom(perUser: DataFrame): DataFrame = {
    val dims = Seq("r_v", "f_v", "m_v")
    val pu = perUser.persist()
    try {
      val n = pu.count()
      // rank thresholds for scores 2..4: rank ≥ ceil(s·n/4)+1, s = 1..3
      val thresholds = (1 to 3).map(s => (s * n + 3) / 4 + 1).filter(_ <= n)
      val tagged = dims.zipWithIndex.map { case (c, d) =>
        pu.select(lit(d).as("dim"), col(c).cast("long").as("v"),
          col("user_id").as("u"))
      }.reduce(_ union _)
      // cut pairs collected with the tiebreak's NATIVE type (user_id is a
      // bigint in the fixture — a string cast would change the sort order)
      val cuts: Map[Int, Seq[(Long, Any)]] =
        if (thresholds.isEmpty || n == 0) Map.empty
        else Partitioning.withGlobalRank(tagged, Seq("dim", "v", "u")) { g =>
          g.withColumn("rk", col("grank") - col("dim") * lit(n))
            .where(col("rk").isin(thresholds: _*))
            .select("dim", "rk", "v", "u").collect()
            .groupBy(_.getInt(0))
            .map { case (d, rows) =>
              d -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.get(3))).toSeq
            }
        }
      def score(vc: String, d: Int) = cuts.getOrElse(d, Seq.empty)
        .foldLeft(lit(1)) { case (e, (cv, cu)) =>
          e + when(col(vc) > cv ||
            (col(vc) === cv && col("user_id") >= lit(cu)), 1).otherwise(0)
        }.cast("int")
      val scored = dims.zipWithIndex.map { case (c, d) => score(c, d) }
      pu.select(col("user_id"),
        scored(0).as("r_score"), scored(1).as("f_score"),
        scored(2).as("m_score"),
        concat(scored(0), scored(1), scored(2)).as("segment"))
    } finally {
      // the cut pairs are already collected; the returned plan recomputes
      // the per-user aggregate once when evaluated (as the window form did)
      pu.unpersist(); ()
    }
  }

  private[graft] val rfmSql: String = {
    val shift = graft.model.RollupConfig.LastKeyShift
    s"""WITH rev AS (
       |  SELECT user_id, event_type,
       |         CAST(round(value * 100) AS BIGINT) AS cents,
       |         (epoch_ns(ts) // 1000000000) * $shift + event_id AS k
       |  FROM events
       |),
       |rper AS (
       |  SELECT user_id, max(k) AS r_v, CAST(count(*) AS BIGINT) AS f_v,
       |         CAST(sum(CASE WHEN event_type = '$AttributionConversion'
       |                       THEN cents ELSE 0 END) AS BIGINT) AS m_v
       |  FROM rev GROUP BY 1
       |),
       |ranked AS (
       |  SELECT user_id,
       |         CAST(count(*) OVER () AS BIGINT) AS n,
       |         CAST(row_number() OVER (ORDER BY r_v, user_id) AS BIGINT) AS rr,
       |         CAST(row_number() OVER (ORDER BY f_v, user_id) AS BIGINT) AS fr,
       |         CAST(row_number() OVER (ORDER BY m_v, user_id) AS BIGINT) AS mr
       |  FROM rper
       |)
       |SELECT user_id,
       |       CAST((rr - 1) * 4 // n + 1 AS INT) AS r_score,
       |       CAST((fr - 1) * 4 // n + 1 AS INT) AS f_score,
       |       CAST((mr - 1) * 4 // n + 1 AS INT) AS m_score,
       |       CAST((rr - 1) * 4 // n + 1 AS VARCHAR)
       |         || CAST((fr - 1) * 4 // n + 1 AS VARCHAR)
       |         || CAST((mr - 1) * 4 // n + 1 AS VARCHAR) AS segment
       |FROM ranked""".stripMargin
  }

  // ------------------------------------------------------- event_transitions

  /** The user-flow read (the Sankey/flow diagram behind every product
    * analytics tool): the Markov transition matrix over consecutive
    * events per user — for each (previous type → next type) pair, the
    * transition count and its share of all transitions leaving the
    * previous type. Consecutive is defined on the SAME total event order
    * every sequential read uses (the packed (ts, event_id) key), so
    * simultaneous events order identically in both engines.
    *
    * Scale shape: one per-user window sort (the partitioning the funnel
    * family already rides) emits the pair stream; the count collapses
    * map-side to the |types²|-row matrix, and the closing probability
    * window runs over that config-sized frame.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val shift = graft.model.RollupConfig.LastKeyShift
    val w = Window.partitionBy("user_id").orderBy("k")
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr(s"(ts DIV 1000000000) * $shift + event_id").as("k"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"))
    transitionProbFrom(pairs)
  }

  /** The matrix readoff over a (prev_type, next_type) pair stream —
    * shared verbatim with `stream_transitions`' drained-state readoff.
    * Float bound (house standard): `prob` divides two EVENT COUNTS — both
    * int64-exact and < 2^53 up to 9·10^15 events — in ONE IEEE division,
    * so the int64→double conversions and the quotient are bit-identical
    * across engines.
    */
  private[graft] def transitionProbFrom(pairs: DataFrame): DataFrame =
    pairs.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("out_total",
        sum("n").over(Window.partitionBy("prev_type")))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n") / col("out_total").cast("double"), 6).as("prob"))

  private[graft] val transitionsSql: String = {
    val shift = graft.model.RollupConfig.LastKeyShift
    s"""WITH tr_ev AS (
       |  SELECT user_id, event_type,
       |         (epoch_ns(ts) // 1000000000) * $shift + event_id AS k
       |  FROM events
       |),
       |tr_p AS (
       |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY k) AS prev_type,
       |         event_type AS next_type
       |  FROM tr_ev
       |),
       |tr_c AS (
       |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
       |  FROM tr_p WHERE prev_type IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT prev_type, next_type, n,
       |       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS prob
       |FROM tr_c""".stripMargin
  }

  // -------------------------------------------------------------- engagement

  /** The DAU/WAU engagement read — the fourth standing product-analytics
    * query beside funnel, cohort and attribution: per active day, the
    * distinct-user count, the trailing-7-day distinct-user count, and
    * their ratio (stickiness — the DAU/WAU metric every growth dashboard
    * renders). All-integer until the ONE closing division: activity
    * de-duplicates to a (user, epoch-day) matrix (exact distinct users,
    * the `cohort_retention` rule), and the trailing window is computed by
    * EXPLODING each activity day onto the 7 future days it supports — a
    * map-only ×7 fan-out of the |users × days| matrix, never the event
    * stream — so WAU is a plain distinct count, no window over days.
    * Float bound: `stickiness` divides two distinct-USER counts (< 2^53
    * trivially) in one IEEE division — engine-exact operands, one
    * correctly-rounded quotient.
    */
  def engagement(spark: SparkSession, dir: String): DataFrame =
    engagementFrom(activityFrom(Tables.events(spark, dir)))

  /** The (user_id, epoch-day) activity matrix — ONE order-immune distinct,
    * which is why `stream_engagement` can maintain it live in complete
    * mode (the `stream_cohort` argument).
    */
  private[graft] def activityFrom(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
      .distinct()

  /** The readoff over an activity matrix — shared verbatim with
    * `stream_engagement`'s drained-state readoff.
    */
  private[graft] def engagementFrom(activity: DataFrame): DataFrame = {
    val dau = activity.groupBy("day")
      .agg(countDistinct("user_id").as("dau"))
    val wau = activity
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
      .distinct()
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day") // inner: only OBSERVED days report (drops the
      // explode's tail days past the last activity)
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau").cast("double"), 6).as("stickiness"))
  }

  private val engagementSql: String =
    """WITH eg_act AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events
      |),
      |eg_dau AS (
      |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      |  FROM eg_act GROUP BY 1
      |),
      |eg_wexp AS (
      |  SELECT DISTINCT user_id, day + g AS day
      |  FROM eg_act, unnest(generate_series(0, 6)) AS t(g)
      |),
      |eg_wau AS (
      |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      |  FROM eg_wexp GROUP BY 1
      |)
      |SELECT d.day, d.dau, w.wau,
      |       round(d.dau / CAST(w.wau AS DOUBLE), 6) AS stickiness
      |FROM eg_dau d JOIN eg_wau w USING (day)""".stripMargin

  /** Exposed for the streaming twin's Op registration. */
  private[graft] def engagementOracle: String = engagementSql

  def ops: Seq[Op] = Seq(
    Op("event_transitions", eventTransitions, Some(transitionsSql)),
    Op("engagement", engagement, Some(engagementSql)),
    Op("q1_pricing", q1Pricing, Some(q1Sql)),
    Op("q3_shipping", q3Shipping, Some(q3Sql)),
    Op("q5_region", q5Region, Some(q5Sql)),
    Op("q14_promo", q14Promo, Some(q14Sql)),
    Op("q6_revenue", q6Revenue, Some(q6Sql)),
    Op("sessionize", sessionize, Some(sessionizeSql)),
    Op("event_props", eventProps, Some(eventPropsSql)),
    Op("funnel_steps", funnelSteps, Some(funnelSql)),
    Op("cohort_retention", cohortRetention, Some(cohortSql)),
    Op("event_attribution", eventAttribution, Some(attributionSql)),
    Op("user_rfm", userRfm, Some(rfmSql))
  )
}
