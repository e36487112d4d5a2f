package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Index, MetricQuery}

class IndexFetchSpec extends AnyFunSuite with TestSpark {

  test("index: every dot-prefix present; leaf only on full paths") {
    val nodes = Index.build(spark, Sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getBoolean(2)))
    val byNode = nodes.map(n => n._1 -> n).toMap
    assert(byNode.contains("servers"))
    assert(byNode("servers")._3 === false) // prefix, never a full path
    val leaves = nodes.filter(_._3).map(_._1)
    assert(leaves.nonEmpty)
    leaves.foreach(l => assert(l.split("\\.").length === 3, s"leaf $l at wrong depth"))
    // depth recorded = number of dot segments
    nodes.foreach { case (n, d, _) => assert(n.split("\\.").length === d) }
  }

  test("glob conversion matches the reference's replace order") {
    assert(Index.globToRegex("servers.*.u3") === "^servers\\..*\\.u3$")
    assert(Index.globToRegex("a.b") === "^a\\.b$")
  }

  test("glob query returns only depth-matched, pattern-matched nodes, sorted") {
    val got = Index.glob(spark, Sf).collect().map(_.getString(0))
    assert(got.nonEmpty)
    assert(got.toSeq === got.sorted.toSeq)
    got.foreach { n =>
      assert(n.matches("servers\\..*\\.u3"))
      assert(n.split("\\.").length === 3)
    }
  }

  test("fetch: grid slots are contiguous at the chosen step and nulls mark gaps") {
    val rows = MetricQuery.fetch(spark, Sf).collect()
    assert(rows.nonEmpty)
    val slots = rows.map(_.getLong(1)).sorted
    val step = slots.sliding(2).map(p => p(1) - p(0)).toSeq.distinct
    assert(step === Seq(3600L), s"grid must be uniform, got steps $step")
    // on sparse sf0.001 data a 2-day hourly grid must contain gaps AND data
    assert(rows.exists(_.isNullAt(2)), "expected null gap-fill slots")
    assert(rows.exists(!_.isNullAt(2)), "expected some data slots")
  }

  test("delete dry-run counts match what apply actually removes") {
    import graft.operators.Rollups
    val total = Rollups.rollups(spark, Sf).count()
    val wouldDelete = MetricQuery.deleteDryRun(spark, Sf)
      .agg(sum("would_delete")).collect().head.getLong(0)
    val remaining = MetricQuery.deleteApply(spark, Sf)
      .agg(sum("remaining")).collect().head.getLong(0)
    assert(total - wouldDelete === remaining)
  }
}
