package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated parquet tables — the single place
  * that knows the on-disk layout (see TESTDATA.md). Everything else takes a
  * `DataFrame` so operators stay storage-agnostic: at 100 TB these become
  * partitioned/bucketed tables behind the same column contracts.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")

  /** `events.ts` arrives in one of two on-disk flavors: parquet
    * TIMESTAMP(NANOS) — which Spark 4 only reads via the legacy nanosAsLong
    * conf, as a bigint of epoch nanoseconds — or plain TIMESTAMP(MICROS)
    * (the regenerated fixtures), which loads as TIMESTAMP_NTZ. Normalize to
    * an epoch-nanosecond BIGINT at load so every downstream contract
    * (`ts DIV 1e9`, the LAST tiebreak key `ts * 2^24 + event_id`) sees one
    * type. Downstream code sees `ts` as NANOSECONDS.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, dir, "events"))
  }

  /** `ts` → epoch-nanosecond bigint whatever the on-disk flavor (see
    * [[events]]). NTZ wall-clocks are interpreted as UTC via a
    * timezone-independent diff against the epoch NTZ literal — the same
    * reading DuckDB's `epoch_ns(ts)` gives the oracle side, immune to the
    * caller's session timezone.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df // TIMESTAMP(NANOS) via nanosAsLong
      case org.apache.spark.sql.types.TimestampType => // absolute instant
        df.withColumn("ts", unix_micros(col("ts")) * 1000)
      case _ => // TIMESTAMP_NTZ
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
    }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The carbon metric stream derived from `events`.
    *
    * cassabon's input is `path value timestamp` plaintext lines
    * (reference listener/carbon_plaintext.go:208-255); the driver fixture has
    * no network feed, so the canonical mapping builds a realistic multi-level
    * dotted-path population from the event stream:
    * `servers.<event_type>.u<user_id % 8>`  (5 types x 8 buckets = 40 paths,
    * plus all their dot-prefixes for the index).
    *
    * `ts` is epoch seconds (cassabon timestamps are second-resolution);
    * `event_id` is kept as the arrival-order tiebreaker for LAST rollups.
    */
  def metrics(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      concat(lit("servers."), col("event_type"), lit(".u"),
        (col("user_id") % 8).cast("string")).as("path"),
      col("value"),
      expr("ts DIV 1000000000").as("ts"), // ns -> floored epoch seconds
      col("event_id"))

  /** DuckDB-side rendering of [[metrics]], kept adjacent so the two can never
    * drift. Referenced as a CTE by every core-surface oracle query.
    *
    * Seconds are derived in INTEGER nanoseconds (`epoch_ns // 1e9`), mirroring
    * Spark's exact `ts DIV 1000000000`: the float `epoch()` route rounds a
    * nanosecond fraction within one double ULP (~2.4e-7 at current epochs) of
    * the next second UP before floor — a ~1e-7/row divergence that larger
    * scale factors would eventually hit.
    */
  val metricsSql: String =
    """metrics AS (
      |  SELECT 'servers.' || event_type || '.u' || CAST(user_id % 8 AS VARCHAR) AS path,
      |         value,
      |         epoch_ns(ts) // 1000000000 AS ts,
      |         event_id
      |  FROM events
      |)""".stripMargin
}
