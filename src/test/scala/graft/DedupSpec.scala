package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with TestSpark {

  test("exact dedup: planted duplicates collapse to min doc_id, originals survive") {
    val rows = Dedup.exact(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // keep_id, n_copies
    val dups = rows.filter(_._2 > 1)
    assert(dups.nonEmpty, "planted dups must appear")
    dups.foreach { case (keep, n) =>
      assert(n === 2)
      assert(keep % 10 === 0, "kept id must be the original (lower) one")
      assert(keep < 1000000)
    }
  }

  test("minhash-LSH candidates cover all jaccard>=0.8 near-dup pairs") {
    val truth = Dedup.ngramJaccard(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minhashLsh(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture plants near-dup pairs")
    assert(truth.subsetOf(cands),
      s"missed: ${truth.diff(cands)} — LSH must recall every true near-dup")
  }

  test("simhash pairs respect the hamming bound and are true near-dups") {
    val truth = Dedup.ngramJaccard(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhash(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sim.nonEmpty)
    sim.foreach { case (_, _, h) => assert(h <= Dedup.HammingMax) }
    val simPairs = sim.map(t => (t._1, t._2)).toSet
    assert(simPairs.subsetOf(truth),
      "at hamming<=3 every reported pair should be a true near-dup on this fixture")
  }
}
