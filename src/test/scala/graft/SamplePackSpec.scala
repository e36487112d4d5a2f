package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.TextOps

class SamplePackSpec extends AnyFunSuite with TestSpark {

  test("stratified sample is deterministic and respects per-language rates") {
    val a = TextOps.sampleStratified(spark, Sf).collect().map(_.getLong(0)).sorted
    val b = TextOps.sampleStratified(spark, Sf).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "resampling must be bit-identical")
    assert(a.nonEmpty)
    // empirical rate per language within a loose band of the target
    val perLang = TextOps.sampleStratified(spark, Sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, Sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    TextOps.SampleRates.foreach { case (lang, rate) =>
      val got = perLang.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - rate / 100.0) < 0.25, s"$lang rate $got vs ${rate / 100.0}")
    }
  }

  test("pack_sequences: bins fill sequentially without token loss") {
    val rows = TextOps.packSequences(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // bins are non-decreasing in doc order and offsets stay inside the budget
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 >= a._3)
      case _ =>
    }
    rows.foreach { case (_, _, _, off) =>
      assert(off >= 0 && off < TextOps.PackBudget)
    }
    // conservation: every doc's start offset is the running sum of its
    // predecessors' token counts
    var running = 0L
    rows.foreach { case (_, n, bin, off) =>
      assert(bin === running / TextOps.PackBudget)
      assert(off === running % TextOps.PackBudget)
      running += n
    }
  }

  test("sharded packing: each shard's packing equals the global algorithm run on that shard") {
    val shardSize = 100L
    val sharded = TextOps.packSequencesSharded(spark, Sf, shardSize).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(sharded.nonEmpty)
    assert(sharded.map(_._3).distinct.length > 1, "fixture must span multiple shards")
    sharded.groupBy(_._3).foreach { case (_, rows) =>
      var running = 0L
      rows.sortBy(_._1).foreach { case (_, n, _, bin, off) =>
        assert(bin === running / TextOps.PackBudget)
        assert(off === running % TextOps.PackBudget)
        running += n
      }
    }
  }
}
