package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Op

/** Stateful streaming sessionization: the `flatMapGroupsWithState` twin of
  * the batch `sessionize` operator (gap-based, 30 min default). Each user's
  * open session lives in group state; an event arriving after the gap
  * closes the previous session and emits it downstream.
  *
  * This is the engine's template for custom streaming state beyond windowed
  * aggregation (cassabon's accumulate loop generalized to arbitrary
  * per-key state machines).
  *
  * Scale posture: state is ONE OpenSession struct per active user —
  * independent of stream length. A production deployment adds
  * `EventTimeTimeout` so idle users' sessions close and evict on watermark
  * advance (the same bounded-state contract as stream_dedup_watermark);
  * the registry entry replays a finite fixture, where the still-open
  * sessions simply never emit.
  */
object SessionStream {

  case class SessEvent(user_id: Long, ts_sec: Long, event_id: Long)
  case class OpenSession(seq: Long, start: Long, end: Long, n: Long)
  case class ClosedSession(user_id: Long, session_seq: Long,
      session_start: Long, session_end: Long, n_events: Long)

  def sessionize(events: Dataset[SessEvent], gapSec: Long): Dataset[ClosedSession] = {
    implicit val se = Encoders.product[SessEvent]
    implicit val so = Encoders.product[OpenSession]
    implicit val sc = Encoders.product[ClosedSession]
    implicit val kl = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[SessEvent], state: GroupState[OpenSession]) => {
          val ordered = batch.toSeq.sortBy(e => (e.ts_sec, e.event_id))
          var open = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          ordered.foreach { e =>
            open match {
              case Some(s) if e.ts_sec - s.end > gapSec =>
                closed += ClosedSession(userId, s.seq, s.start, s.end, s.n)
                open = Some(OpenSession(s.seq + 1, e.ts_sec, e.ts_sec, 1))
              case Some(s) =>
                open = Some(s.copy(end = math.max(s.end, e.ts_sec), n = s.n + 1))
              case None =>
                open = Some(OpenSession(1, e.ts_sec, e.ts_sec, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
        })
  }

  /** Driver-oracled replay: the events fixture streamed through the real
    * `flatMapGroupsWithState` engine in ONE micro-batch (one parquet file,
    * no maxFilesPerTrigger), memory sink, append mode. Within the batch
    * each user's full event set reaches one state-function call, which
    * sorts by (ts, event_id) — so the emitted rows are a pure function of
    * the data: EVERY batch session except each user's last one, which is
    * still open in state when the fixture ends (cassabon's
    * still-accumulating buckets at shutdown, exactly like the
    * stream_rollup_append tail windows). That set difference IS the
    * oracle's WHERE clause.
    */
  def sessionizeQuery(spark: SparkSession, dir: String): DataFrame = {
    implicit val se = Encoders.product[SessEvent]
    val sink = "stream_sessionize_" + UUID.randomUUID().toString.replace("-", "")
    val events = CarbonStream.eventsStream(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000000000").as("ts_sec"), col("event_id"))
      .as[SessEvent]
    CarbonStream.withStreamPartitions(spark) {
      val q = sessionize(events, graft.operators.Analytics.SessionGapSec)
        .toDF()
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    }
    CarbonStream.drainMemorySink(spark, sink)
  }

  /** Oracle: the batch sessionization minus each user's final (open)
    * session — the streaming engine can only CLOSE a session when a
    * later event exceeds the gap, so the last session per user never
    * emits on a finite stream.
    */
  private val sessionizeStreamSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec, event_id
       |  FROM events
       |),
       |flagged AS (
       |  SELECT user_id, ts_sec, event_id,
       |         CASE WHEN lag(ts_sec) OVER w IS NULL
       |                   OR ts_sec - lag(ts_sec) OVER w > ${graft.operators.Analytics.SessionGapSec}
       |              THEN 1 ELSE 0 END AS new_sess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
       |),
       |sessions AS (
       |  SELECT user_id, ts_sec,
       |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM flagged
       |),
       |agg AS (
       |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |         min(ts_sec) AS session_start, max(ts_sec) AS session_end,
       |         CAST(count(*) AS BIGINT) AS n_events
       |  FROM sessions GROUP BY 1, 2
       |)
       |SELECT user_id, session_seq, session_start, session_end, n_events
       |FROM (SELECT a.*, max(session_seq) OVER (PARTITION BY user_id) AS mx FROM agg a)
       |WHERE session_seq < mx""".stripMargin

  // ----------------------------------------------------------- stream_cohort

  /** The LIVE form of `cohort_retention` — and the proof that the cohort
    * matrix is streaming-shaped all the way down: BOTH corpus-derived
    * inputs (first-seen week per user, de-duplicated (user, week)
    * activity) are order-immune aggregates, so one complete-mode
    * `groupBy(user_id, week)` maintains the activity matrix under any
    * micro-batch split, late arrivals included. State = one row per
    * (user, active-week) — the matrix's own size, the reference bound of
    * the read it serves. Everything downstream of the matrix — first-seen
    * derivation, cohort sizes, offset shares — is the SAME
    * [[graft.operators.Analytics.cohortFrom]] the batch op calls on the
    * drained frame. Oracle = `cohort_retention`'s SQL verbatim.
    */
  def cohortQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = CarbonStream.eventsStream(spark, dir)
      .select(col("user_id"),
        expr(s"ts DIV 1000000000 DIV ${graft.operators.Analytics.CohortWeekSec}")
          .as("week"))
    val sink = "stream_cohort_" + UUID.randomUUID().toString.replace("-", "")
    CarbonStream.withStreamPartitions(spark) {
      val q = ev.groupBy("user_id", "week").agg(count(lit(1)).as("n"))
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
    // the readoff SELF-joins the matrix (first-seen ⋈ activity); a memory
    // sink's View keeps one attribute set, which Catalyst cannot dedup in
    // a self-join — rebase the matrix-sized frame onto fresh attributes
    val drained = CarbonStream.drainMemorySink(spark, sink)
      .select("user_id", "week")
    graft.operators.Analytics.cohortFrom(
      spark.createDataFrame(drained.rdd, drained.schema))
  }

  def ops: Seq[Op] = Seq(
    Op("stream_sessionize", sessionizeQuery, Some(sessionizeStreamSql)),
    Op("stream_cohort", cohortQuery, Some(graft.operators.Analytics.cohortSql))
  )
}
