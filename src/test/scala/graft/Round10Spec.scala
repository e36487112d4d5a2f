package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 gates: the events `ts` contract survived the fixture
  * regeneration that turned parquet TIMESTAMP(NANOS) into plain
  * TIMESTAMP(MICROS). `Tables.normalizeTs` is the single adapter back to
  * the epoch-nanosecond bigint every downstream contract assumes
  * (`ts DIV 1e9`, the LAST tiebreak key `ts * 2^24 + event_id`) — these
  * pin its branches and both load paths so the NEXT on-disk flavor change
  * fails here, in one named test, instead of as 26 missing verify keys and
  * three silently-truncated streams (CORRECTNESS_r09).
  */
class Round10Spec extends AnyFunSuite with TestSpark {
  import graft.model.Tables

  test("events.ts loads as epoch-nanosecond bigint from the on-disk fixture") {
    val ev = Tables.events(spark, Sf)
    assert(ev.schema("ts").dataType == LongType)
    val r = ev.agg(min("ts"), max("ts")).head()
    // fixture spans Jan 2024; epoch NANOS of that window. A micros or
    // millis misread (the r9 failure mode: streams saw values 1000x
    // small and watermark-dropped most rows) lands 3-6 orders below.
    assert(r.getLong(0) >= 1704067200L * 1000000000L, s"min ${r.getLong(0)} below 2024-01-01 in nanos")
    assert(r.getLong(1) <= 1706745600L * 1000000000L, s"max ${r.getLong(1)} past 2024-02-01 in nanos")
  }

  test("normalizeTs long branch passes epoch nanos through untouched") {
    import spark.implicits._
    val df = Seq((1704458096789012345L, "a")).toDF("ts", "tag")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.head().getLong(0) == 1704458096789012345L)
  }

  test("normalizeTs NTZ branch is session-timezone independent (UTC wall clock)") {
    import spark.implicits._
    val expected = 1704458096789012000L // 2024-01-05 12:34:56.789012 UTC in nanos
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York", "Asia/Kolkata")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val ntz = Seq("2024-01-05 12:34:56.789012").toDF("s")
          .select(expr("to_timestamp_ntz(s)").as("ts"))
        assert(Tables.normalizeTs(ntz).head().getLong(0) == expected,
          s"NTZ normalization drifted under session tz $tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("normalizeTs LTZ branch converts the absolute instant") {
    import spark.implicits._
    val ltz = Seq("2024-01-05 12:34:56.789012").toDF("s")
      .select(to_timestamp(col("s")).as("ts")) // session tz is UTC in specs
    assert(Tables.normalizeTs(ltz).head().getLong(0) == 1704458096789012000L)
  }

  test("eventsStream carries the same nanos ts contract as the batch loader") {
    val st = graft.streaming.CarbonStream.eventsStream(spark, Sf)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == LongType)
    assert(st.schema.fieldNames.sameElements(Tables.events(spark, Sf).schema.fieldNames))
  }
}
