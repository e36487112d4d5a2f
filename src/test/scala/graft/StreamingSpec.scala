package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CarbonStream

/** Streaming accumulate/flush semantics via MemoryStream — the Spark-native
  * mirror of cassabon's window-close flush (datastore/metricmanager.go:120-180).
  */
class StreamingSpec extends AnyFunSuite with TestSpark {

  test("complete mode: finite stream equals the batch windowed aggregation") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Double, Long)]
    val q = CarbonStream.windowedRollup(in.toDF.toDF("path", "value", "ts"))
      .writeStream.format("memory").queryName("cs_complete").outputMode("complete")
      .start()
    try {
      in.addData(("p", 2.0, 10L), ("p", 4.0, 59L), ("p", 10.0, 60L), ("q", 7.0, 61L))
      q.processAllAvailable()
      val got = spark.table("cs_complete").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set(("p", 60L, 3.0), ("p", 120L, 10.0), ("q", 120L, 7.0)))
    } finally q.stop()
  }

  test("append mode with watermark: a window flushes once the watermark passes its close") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Double, Long)]
    val q = CarbonStream
      .windowedRollup(in.toDF.toDF("path", "value", "ts"), watermark = Some("30 seconds"))
      .writeStream.format("memory").queryName("cs_append").outputMode("append")
      .start()
    try {
      in.addData(("p", 2.0, 10L), ("p", 4.0, 20L))
      q.processAllAvailable()
      // watermark still inside window [0,60): nothing flushed yet
      assert(spark.table("cs_append").count() === 0)
      in.addData(("p", 9.0, 200L)) // advances watermark to 170 > 60
      q.processAllAvailable()
      val got = spark.table("cs_append").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set(("p", 60L, 3.0)), "window [0,60) must flush exactly once")
    } finally q.stop()
  }

  test("stream_cohort: the live activity matrix serves the batch retention read exactly") {
    val live = graft.streaming.SessionStream.cohortQuery(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val batch = graft.operators.Analytics.cohortRetention(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(live.nonEmpty)
    assert(live === batch)
  }

  test("stream_funnel: the state machine lands on the batch funnel exactly, transitions crossing batches") {
    val live = graft.streaming.SessionStream.funnelQuery(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4))).toSet
    val batch = graft.operators.Analytics.funnelSteps(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4))).toSet
    assert(live.size === 3)
    assert(live === batch)
  }

  test("stream_holt: every live forecast equals the batch windowed smoother, windows crossing batches") {
    val live = graft.streaming.SessionStream.holtQuery(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val batch = graft.operators.Series.holtForecast(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(live.nonEmpty)
    assert(live === batch)
  }

  test("stream_attribution: the live per-user state serves the batch crediting exactly") {
    val live = graft.streaming.SessionStream.attributionQuery(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    val batch = graft.operators.Analytics.eventAttribution(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(live.nonEmpty)
    assert(live === batch)
  }

  test("stream_rfm: live per-user state scores users exactly like the batch quartiles") {
    val live = graft.streaming.SessionStream.rfmQuery(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSet
    val batch = graft.operators.Analytics.userRfm(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSet
    assert(live.nonEmpty)
    assert(live === batch)
  }

  test("stream_ann: the live-maintained IVF index answers queries exactly like the batch index") {
    val live = graft.streaming.AnnStream.annQuery(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val batch = graft.operators.Similarity.ivf(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(live.nonEmpty)
    assert(live === batch,
      "converged streaming inverted lists must equal the batch index")
  }
}
