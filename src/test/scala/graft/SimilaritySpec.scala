package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Similarity}

class SimilaritySpec extends AnyFunSuite with TestSpark {

  test("brute-force top-k: k results per probe, ranked by descending cosine") {
    val rows = Similarity.cosineTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === Similarity.TopK)
      val ranked = rs.sortBy(_._3)
      assert(ranked.map(_._3).toSeq === (1 to Similarity.TopK))
      // cosine non-increasing with rank
      ranked.sliding(2).foreach(p => assert(p(0)._4 >= p(1)._4))
      rs.foreach(r => assert(r._2 !== q, "self must be excluded"))
    }
  }

  test("LSH-bucketed results are a subset of brute-force candidates' quality") {
    val brute = Similarity.cosineTopK(spark, Sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val lsh = Similarity.lshBucketed(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(lsh.nonEmpty)
    // every LSH hit's cosine can't exceed the brute-force #1 for that probe;
    // and any (q,n) present in both must agree exactly (same fixed-point math)
    lsh.foreach { case (q, n, c) =>
      brute.get((q, n)).foreach(bc => assert(bc === c, s"cosine mismatch for ($q,$n)"))
    }
  }

  test("multimodal: mapPartitions decode seam produces exactly the column-algebra result") {
    val a = Multimodal.meta(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getInt(4), r.getInt(5), r.getInt(6))).toSet
    val b = Multimodal.metaMapPartitions(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getInt(4), r.getInt(5), r.getInt(6))).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
