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

  test("exact_substring: max runs equal a driver-side suffix-scan recount") {
    val got = Dedup.exactSubstring(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "fixture has no shared runs — threshold drift?")
    // recompute: positioned K-gram index -> df cap -> diagonal islands
    val docs = graft.model.Tables.documents(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val k = Dedup.SubstrK
    val occ = scala.collection.mutable.Map.empty[Seq[String], Vector[(Long, Int)]]
    docs.foreach { case (d, toks) =>
      if (toks.length >= k)
        (0 to toks.length - k).foreach { i =>
          val w = toks.slice(i, i + k)
          occ(w) = occ.getOrElse(w, Vector.empty) :+ ((d, i))
        }
    }
    val matches = scala.collection.mutable.Map.empty[(Long, Long), Vector[(Int, Int)]]
    occ.values.filter(v => v.size > 1 && v.size <= Dedup.MaxShingleDf).foreach { v =>
      for (i <- v.indices; j <- i + 1 until v.size if v(i)._1 != v(j)._1) {
        val (a, b) = if (v(i)._1 < v(j)._1) (v(i), v(j)) else (v(j), v(i))
        matches((a._1, b._1)) =
          matches.getOrElse((a._1, b._1), Vector.empty) :+ ((a._2, b._2))
      }
    }
    val want = matches.flatMap { case (pair, ms) =>
      val mx = ms.groupBy { case (ap, bp) => ap - bp }.values.map { d =>
        val aps = d.map(_._1).distinct.sorted
        var run = 1; var best = 1
        aps.sliding(2).foreach {
          case Seq(p, q) => run = if (q == p + 1) run + 1 else 1; best = math.max(best, run)
          case _ =>
        }
        best
      }.max + k - 1
      if (mx >= Dedup.MinRunTokens) Some(pair -> mx.toLong) else None
    }.toMap
    assert(got === want)
  }
}
