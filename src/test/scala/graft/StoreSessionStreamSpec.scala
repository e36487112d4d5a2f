package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.Rollups
import graft.sources.RollupStore
import graft.streaming.SessionStream
import graft.streaming.SessionStream.SessEvent

class StoreSessionStreamSpec extends AnyFunSuite with TestSpark {

  test("rollup store: partitioned roundtrip preserves the write set exactly") {
    val dir = Files.createTempDirectory("graft_store").toString
    val rollups = Rollups.rollups(spark, Sf)
    RollupStore.write(rollups, dir)
    val back = RollupStore.read(spark, dir)
      .select("tbl", "path", "stat_time", "stat")
    assert(back.count() === rollups.count())
    assert(back.except(rollups).count() === 0)
    assert(rollups.except(back).count() === 0)
  }

  test("rollup store: TTL read matches the retention_ttl operator's counts") {
    val dir = Files.createTempDirectory("graft_store_ttl").toString
    RollupStore.write(Rollups.rollups(spark, Sf), dir)
    val now = Tables.metrics(spark, Sf).agg(max("ts")).collect().head.getLong(0)
    val got = RollupStore.readRetained(spark, dir, now)
      .groupBy("tbl").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Rollups.retentionTtl(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.filter(_._2 > 0)
    assert(got === expected)
  }

  test("rollup store: retention filter prunes partitions at planning time") {
    val dir = Files.createTempDirectory("graft_store_prune").toString
    RollupStore.write(Rollups.rollups(spark, Sf), dir)
    val now = Tables.metrics(spark, Sf).agg(max("ts")).collect().head.getLong(0)
    val plan = RollupStore.readRetained(spark, dir, now)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("stat_date"),
      "retention cutoff must reach the partition filter, not just a row filter")
  }

  test("streaming sessionize: sessions close when the gap is exceeded") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessEvent]
    val q = SessionStream.sessionize(in.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("ss_out").outputMode("append")
      .start()
    try {
      in.addData(SessEvent(1, 100, 1), SessEvent(1, 200, 2), SessEvent(2, 100, 3))
      q.processAllAvailable()
      assert(spark.table("ss_out").count() === 0) // both sessions still open
      in.addData(SessEvent(1, 5000, 4)) // gap 4800 > 1800: closes user 1's first session
      q.processAllAvailable()
      val got = spark.table("ss_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got.toSet === Set((1L, 1L, 100L, 200L, 2L)))
      in.addData(SessEvent(1, 20000, 5), SessEvent(2, 20000, 6))
      q.processAllAvailable()
      val got2 = spark.table("ss_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got2.toSet === Set(
        (1L, 1L, 100L, 200L, 2L),
        (1L, 2L, 5000L, 5000L, 1L),
        (2L, 1L, 100L, 100L, 1L)))
    } finally q.stop()
  }
}
