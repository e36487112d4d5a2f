package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{RollupConfig, Tables}
import graft.operators.{Carbon, Index, OpsStats, Rollups, TextOps}
import graft.streaming.CarbonStream

/** Round-3 additions: tenant index column, hash64 routing, write-side ops
  * stats, guarded fingerprint, append-mode streaming, LAST-key overflow
  * guard.
  */
class Round3Spec extends AnyFunSuite with TestSpark {

  test("index carries the reference's tenant dimension, derived from the namespace") {
    val idx = Index.build(spark, Sf)
    assert(idx.columns.toSet === Set("node", "depth", "leaf", "tenant"))
    // single-namespace fixture: every node's tenant is its top-level segment
    // (r10 made the reference's always-"" slot a real derived column)
    assert(idx.filter(col("tenant") =!= "servers").count() === 0)
    // delete keeps the same document shape
    assert(Index.delete(spark, Sf).columns.toSet === Set("node", "depth", "leaf", "tenant"))
  }

  test("peer_route64: every point lands on exactly one shard of the ring") {
    val routed = Carbon.peerRoute64(spark, Sf).collect()
    val shards = routed.map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < Carbon.ShardCount))
    assert(shards.distinct.length === shards.length)
    val totalPoints = routed.map(_.getLong(2)).sum
    assert(totalPoints === Tables.metrics(spark, Sf).count())
  }

  test("write_stats totals are consistent with the rollup write set") {
    val stats = OpsStats.writeStats(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val writeSetRows = Rollups.rollups(spark, Sf).count()
    assert(stats("metricmgr.db.insert") === writeSetRows)
    assert(stats("metricmgr.db.retry") === 0L)
    assert(stats("path.count") ===
      Tables.metrics(spark, Sf).select("path").distinct().count())
    // every batch holds at most BatchSize rows and at least one, so the
    // batch count brackets rows/BatchSize from both sides
    val batches = stats("metricmgr.db.batches")
    assert(batches >= (writeSetRows + OpsStats.BatchSize - 1) / OpsStats.BatchSize)
    assert(batches <= writeSetRows)
  }

  test("doc_fingerprint: short docs yield '' instead of throwing; bottom-k is sorted distinct") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd"),            // 4 chars: below one gram
      (2L, ""),                // empty
      (3L, "abcde"),           // exactly one gram
      (4L, "aaaaaaaaaa")       // all grams identical -> single hash
    ).toDF("doc_id", "text")
    val out = TextOps.fingerprintFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "")
    assert(out(2L) === "")
    val g = "abcde".map(_.toInt)
    assert(out(3L) === (g(0) * 923521 + g(1) * 29791 + g(2) * 961 + g(3) * 31 + g(4)).toString)
    val a = 'a'.toInt
    assert(out(4L) === (a * (923521 + 29791 + 961 + 31 + 1)).toString)
    // real corpus: fingerprints are dash-joined ascending distinct ints
    TextOps.fingerprint(spark, Sf).collect().foreach { r =>
      val parts = r.getString(1).split("-").map(_.toLong)
      assert(parts.length <= TextOps.FingerprintK)
      assert(parts.sameElements(parts.distinct.sorted))
    }
  }

  test("append-mode file sink equals batch rollup minus the still-open tail windows") {
    val appended = CarbonStream.rollupAppendQuery(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val maxTs = Tables.metrics(spark, Sf).agg(max("ts")).head().getLong(0)
    val expected = CarbonStream
      .windowedRollup(CarbonStream.toMetrics(Tables.events(spark, Sf)))
      .filter(col("stat_time") <= maxTs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(appended === expected)
    assert(appended.nonEmpty)
  }

  test("dedup_embedding_cosine: banded candidates, threshold respected, band-complete") {
    import graft.operators.Similarity
    val got = Similarity.embeddingNearDup(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "fixture must contain banded near-dup pairs at the threshold")
    got.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= Similarity.DupThreshold - 1e-9)
    }
    assert(got.map(p => (p._1, p._2)).distinct.length === got.length)
  }

  test("kmeans_step: members conserved, one row per (centroid, dim), sane means") {
    import graft.operators.Similarity
    val out = Similarity.kmeansStep(spark, Sf).collect()
    val perCentroid = out.map(r => (r.getLong(0), r.getAs[Long]("n_members"))).distinct
    assert(perCentroid.map(_._2).sum === Tables.embeddings(spark, Sf).count(),
      "every vector must be assigned to exactly one centroid")
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === out.length)
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= Similarity.Dim))
    assert(out.forall(r => math.abs(r.getDouble(2)) <= 1.5),
      "a mean of unit-ish coordinates stays unit-ish")
  }

  test("LAST tiebreak key guard trips when event_id would overflow the packed key") {
    import spark.implicits._
    val bad = Seq(("p", 1.0, 10L, RollupConfig.LastKeyShift))
      .toDF("path", "value", "ts", "event_id")
    val ex = intercept[Exception] {
      bad.select(expr(s"max_by(value, ${RollupConfig.lastKeyGuarded})")).collect()
    }
    assert(ex.getMessage.contains("overflows the LAST tiebreak key"))
  }
}
