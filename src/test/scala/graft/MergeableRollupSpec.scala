package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.Rollups

/** The accumulate-across-flushes contract: rollup state computed on two
  * disjoint slices of the stream, merged and finalized, must equal the
  * single-pass rollup bit-for-bit.
  */
class MergeableRollupSpec extends AnyFunSuite with TestSpark {

  test("merge(finalize) of two stream slices == single-pass rollup") {
    val metrics = Tables.metrics(spark, Sf)
    val a = Rollups.mergeableFrom(metrics.filter(col("event_id") % 2 === 0))
    val b = Rollups.mergeableFrom(metrics.filter(col("event_id") % 2 === 1))
    val merged = Rollups.finalize(Rollups.merge(a, b))
    val direct = Rollups.rollups(spark, Sf)
    assert(merged.count() === direct.count())
    assert(merged.except(direct).count() === 0, "merged-finalized rows must equal single-pass")
    assert(direct.except(merged).count() === 0)
  }

  test("merge is associative in practice: three slices, two merge orders") {
    val metrics = Tables.metrics(spark, Sf)
    val parts = (0 until 3).map(k => Rollups.mergeableFrom(metrics.filter(col("event_id") % 3 === k)))
    val left = Rollups.finalize(Rollups.merge(Rollups.merge(parts(0), parts(1)), parts(2)))
    val right = Rollups.finalize(Rollups.merge(parts(0), Rollups.merge(parts(1), parts(2))))
    assert(left.except(right).count() === 0)
    assert(right.except(left).count() === 0)
  }
}
