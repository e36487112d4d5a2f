package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 gates: the sketch-width dials are real parameters, the
  * occupancy measurement behaves, and turning a dial WIDER measurably
  * shrinks the biggest bucket — the claim `sketch_occupancy` exists to
  * watch at scale.
  */
class Round8Spec extends AnyFunSuite with TestSpark {
  import graft.operators.{Dedup, Similarity, Sketch}

  private def maxOcc(buckets: DataFrame, cols: Seq[String]): Long =
    buckets.groupBy(cols.map(col): _*).count().agg(max("count")).head().getLong(0)

  private def collidingPairs(buckets: DataFrame, cols: Seq[String]): Long =
    buckets.groupBy(cols.map(col): _*).count()
      .agg(sum(expr("count * (count - 1) DIV 2"))).head().getLong(0)

  test("sketch_occupancy reports all thirteen bucketed families with coherent stats") {
    val rows = Sketch.occupancy(spark, Sf).collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(
      Array("chunk_cell", "cms_bucket", "cms_bucket_prod", "embcos_band",
        "hll_register", "hll_register_prod", "ivf_cell", "lsh_table",
        "minhash_band", "phash_band", "pq_cell", "simhash_piece",
        "substr_window")))
    rows.foreach { r =>
      val (buckets, mx, mean) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(buckets > 0, s"${r.getString(0)}: no buckets")
      assert(mx >= 1 && mean >= 1.0, s"${r.getString(0)}: empty buckets counted")
      assert(mx >= mean, s"${r.getString(0)}: max $mx below mean $mean")
    }
  }

  test("cardinality sketch: error inside the m=64 envelope, branches consistent") {
    // 1.04/sqrt(64) ~ 13% standard error; 3 sigma ~ 40% is the loose gate
    // that catches algebra drift without flaking on fixture draws
    val rows = graft.operators.OpsStats.cardinalitySketch(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, est, err) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 0 && est > 0)
      assert(err <= 0.40, s"${r.getString(0)}: rel_err $err beyond 3-sigma of m=64")
      assert(math.abs(err - math.abs(est - n) / n) < 1e-6, "rel_err inconsistent")
    }
  }

  test("widening the simhash piece dial shrinks bucket collisions") {
    val sim = Dedup.simhashSigs(spark, Sf)
    val narrow = Dedup.simhashPieceFrame(sim, 10) // 6 pieces x 2^10 buckets
    val wide = Dedup.simhashPieceFrame(sim, 15)   // 4 pieces x 2^15 buckets
    assert(maxOcc(wide, Seq("t", "piece")) <= maxOcc(narrow, Seq("t", "piece")))
    assert(collidingPairs(wide, Seq("t", "piece")) <
      collidingPairs(narrow, Seq("t", "piece")),
      "2^15 buckets/piece must collide strictly less than 2^10 on this corpus")
  }

  test("simhash pair semantics are piece-width invariant (the dial is pure performance)") {
    // any valid width pigeonholes hamming <= 3, and the exact bit_count
    // re-check dedups candidates — so the PAIR SET cannot depend on width
    val at10 = Dedup.simhashWith(spark, Sf, 10).collect().map(_.toString).sorted
    val at15 = Dedup.simhashWith(spark, Sf, 15).collect().map(_.toString).sorted
    assert(at10.sameElements(at15))
  }

  test("invalid simhash piece widths fail loudly, not approximately") {
    val sim = Dedup.simhashSigs(spark, Sf)
    // 7 does not divide 60; 20 leaves 3 pieces < hamming+1 = 4
    intercept[IllegalArgumentException](Dedup.simhashPieceFrame(sim, 7))
    intercept[IllegalArgumentException](Dedup.simhashPieceFrame(sim, 20))
  }

  test("widening the embedding-cosine band dial shrinks bucket collisions") {
    def sigs(planesPerBand: Int) =
      Similarity.embBandSigs(spark, Sf, Similarity.DupBands, planesPerBand)
        .select("band", "sig")
    assert(maxOcc(sigs(12), Seq("band", "sig")) < maxOcc(sigs(8), Seq("band", "sig")),
      "2^12 buckets/band must have a strictly smaller max bucket than 2^8 on this corpus")
    assert(collidingPairs(sigs(12), Seq("band", "sig")) <
      collidingPairs(sigs(8), Seq("band", "sig")))
  }

  test("the embedding band-count dial is monotone: more bands only ADD pairs") {
    // bands are consecutive groups of one sequential plane stream, so a
    // smaller band count is a PREFIX of a larger one — more bands can
    // only find more candidates, and the exact-cosine filter is
    // config-invariant. This is the recall knob's contract.
    def pairs(bands: Int) = Similarity.embeddingNearDupWith(spark, Sf,
      bands, Similarity.DupPlanesPerBand).collect().map(_.toString).toSet
    val one = pairs(1)
    val two = pairs(Similarity.DupBands)
    val four = pairs(4)
    assert(one.subsetOf(two) && two.subsetOf(four),
      "band prefix property violated: fewer bands found pairs more bands missed")
  }
}
