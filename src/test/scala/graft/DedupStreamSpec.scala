package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

/** Streaming exact-dedup semantics via MemoryStream: the complete-mode
  * aggregation must match batch dedup, and the watermarked variant must
  * suppress in-horizon duplicates while evicting state past the horizon.
  */
class DedupStreamSpec extends AnyFunSuite with TestSpark {

  test("stream_surprisal: the live LM scores exactly like the batch model") {
    val batch = graft.operators.TextOps.tokenSurprisal(spark, Sf)
      .collect().map(_.toString).sorted
    val live = DedupStream.surprisalQuery(spark, Sf)
      .collect().map(_.toString).sorted
    assert(live === batch)
    assert(batch.nonEmpty)
  }

  test("complete mode equals batch exact-dedup semantics (planted dups included)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val q = DedupStream.dedupAgg(in.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sd_complete").outputMode("complete")
      .start()
    try {
      in.addData((1L, "aaa"), (11L, "bbb"))
      in.addData((7L, "aaa"), (10L, "ccc")) // 10 % 10 == 0 -> planted copy 1000010
      q.processAllAvailable()
      val got = spark.table("sd_complete").collect()
        .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSet
      assert(got === Set((1L, 2L), (11L, 1L), (10L, 2L)))
    } finally q.stop()
  }

  test("within-watermark dups suppressed; state evicted past the horizon re-admits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String, Long)]
    val stream = in.toDF.toDF("doc_id", "text", "ts")
      .withColumn("tts", timestamp_seconds(col("ts")))
      .withColumn("text_hash", graft.model.Portable.md5Hex(col("text")))
      .withWatermark("tts", "30 seconds")
      .dropDuplicatesWithinWatermark("text_hash")
    val q = stream.writeStream.format("memory").queryName("sd_wm").outputMode("append")
      .start()
    try {
      in.addData((1L, "alpha", 10L), (2L, "alpha", 20L), (3L, "beta", 20L))
      q.processAllAvailable()
      val first = spark.table("sd_wm").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(first.contains(3L))
      assert(Seq(1L, 2L).count(first.contains) === 1,
        "exactly one of the in-horizon alpha copies survives")
      in.addData((4L, "gamma", 1000L)) // watermark -> 970: alpha state (expiry 50) evicted
      q.processAllAvailable()
      in.addData((5L, "alpha", 2000L)) // re-arrival AFTER eviction is a new document
      q.processAllAvailable()
      val ids = spark.table("sd_wm").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(5L),
        "alpha re-arrival past the watermark horizon must be re-emitted")
    } finally q.stop()
  }
}
