package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rollups
import graft.sources.RollupStore
import graft.streaming.CarbonStream

/** The ingest→store loop (CarbonStream.streamRollupsToStore): append-only
  * mergeable state slices, merge-on-read finalization. The property under
  * test is the reference's accumulate-across-flushes contract
  * (metricstore.go:25-43 applyMethod is associative per method): the
  * finalized store must equal the single-pass batch rollups NO MATTER how
  * ingest was sliced into flush cycles.
  */
class StreamFlushSpec extends AnyFunSuite with TestSpark {

  /** Stage `df` as ONE parquet file so each staged file becomes one
    * micro-batch (`maxFilesPerTrigger=1`). Harness-local BY DESIGN: these
    * temp dirs stage the replay fixture for a single-process test; a real
    * deployment's source and store live on shared storage.
    */
  private def stageOneFile(df: org.apache.spark.sql.DataFrame, target: String): Unit = {
    val tmp = Files.createTempDirectory("flush_stage")
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/out")
    val part = Files.list(Paths.get(s"$tmp/out"))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, Paths.get(target))
  }

  test("3-cycle streaming flush finalizes to the single-pass batch rollups") {
    val src = Files.createTempDirectory("stream_flush_src").toString
    val store = Files.createTempDirectory("stream_flush_store").toString
    val events = graft.model.Tables.events(spark, Sf)
    // slice by event_id so every flush cycle carries an arbitrary
    // interleaving of paths and windows (not a clean time split)
    (0 until 3).foreach { s =>
      stageOneFile(events.filter(col("event_id") % 3 === s),
        s"$src/slice$s.parquet")
    }

    CarbonStream.streamRollupsToStore(spark, src, store)

    // at least two state slices collided on some key (else the merge path
    // was never exercised)
    val slices = RollupStore.read(spark, store)
      .groupBy("tbl", "path", "stat_time").count()
    assert(slices.filter(col("count") > 1).count() > 0,
      "fixture produced no cross-cycle key collisions — merge untested")

    val got = RollupStore.readFinalized(spark, store)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = Rollups.rollups(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected,
      s"flush-sliced store diverges from single-pass batch: " +
        s"extra=${(got diff expected).take(3)} missing=${(expected diff got).take(3)}")

    // compaction: one slice per key afterwards, reader result unchanged,
    // and the store is still appendable (state stays mergeable)
    RollupStore.compact(spark, store)
    val postSlices = RollupStore.read(spark, store)
      .groupBy("tbl", "path", "stat_time").count()
    assert(postSlices.filter(col("count") > 1).count() == 0,
      "compaction left multi-slice keys")
    val afterCompact = RollupStore.readFinalized(spark, store)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(afterCompact == expected, "compaction changed the finalized result")
  }
}
