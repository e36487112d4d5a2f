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

  test("dedup_semantic: verdicts match an exhaustive within-cell recount") {
    val got = Similarity.semanticDedup(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toMap
    assert(got.nonEmpty)
    assert(got.values.exists(!_._3), "no duplicates flagged — threshold/fixture drift?")
    // recompute from raw embeddings: same fixed-point transform, same cells
    val emb = graft.model.Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * Similarity.Scale).toLong))
      .toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val byCell = got.toSeq.groupBy(_._2._1)
    byCell.foreach { case (_, members) =>
      val ids = members.map(_._1).sorted
      ids.foreach { id =>
        val partners = ids.filter(a => a < id && cos(emb(a), emb(id)) >= Similarity.DupThreshold)
        val want = partners.headOption
        assert(got(id)._2 === want, s"vec $id dup_of")
        assert(got(id)._3 === want.isEmpty, s"vec $id kept")
      }
    }
    // dups never cross cells: every dup_of is a member of the same cell
    got.foreach { case (id, (cell, dupOf, _)) =>
      dupOf.foreach(a => assert(got(a)._1 === cell, s"vec $id dup_of $a crosses cells"))
    }
  }

  test("dedup_semantic dials: threshold is set-monotone; drops are never false positives") {
    def dropped(thr: Double, mod: Int): Set[Long] =
      Similarity.semanticDedupWith(spark, Sf, thr, mod)
        .filter(!org.apache.spark.sql.functions.col("kept"))
        .collect().map(_.getLong(0)).toSet
    val loose = dropped(0.35, Similarity.CentroidMod)
    val tight = dropped(0.45, Similarity.CentroidMod)
    assert(tight.subsetOf(loose), "raising the threshold must only RETAIN more")
    assert(loose.nonEmpty)
    // no false positives: every dropped vec has a true lower-id partner
    // >= threshold SOMEWHERE in the corpus (cells only restrict scope)
    val emb = graft.model.Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * Similarity.Scale).toLong))
      .toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    tight.foreach { id =>
      assert(emb.keys.exists(a => a < id && cos(emb(a), emb(id)) >= 0.45),
        s"vec $id dropped without a true global partner")
    }
  }

  test("knn_mutual: degrees match a driver-side exact graph recount") {
    val emb = graft.model.Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * Similarity.Scale).toLong))
      .filter(_._1 % Similarity.KnnGraphMod == 0)
      .toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val knn = emb.keys.map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .sortBy(n => (-cos(emb(q), emb(n)), n))
        .take(Similarity.TopK).toSet
    }.toMap
    val want = knn.map { case (q, ns) =>
      q -> ns.count(n => knn(n).contains(q)).toLong
    }
    val got = Similarity.knnMutual(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.exists(_ > 0), "no mutual edge anywhere — vacuous")
    assert(got.values.forall(d => d >= 0 && d <= Similarity.TopK))
  }

  test("knn_pagerank: ranks match a driver-side exact integer power iteration") {
    val emb = graft.model.Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * Similarity.Scale).toLong))
      .filter(_._1 % Similarity.KnnGraphMod == 0)
      .toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val knn = emb.keys.map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .sortBy(n => (-cos(emb(q), emb(n)), n))
        .take(Similarity.TopK).toSet
    }.toMap
    val adj = knn.map { case (q, ns) => q -> ns.filter(n => knn(n).contains(q)) }
    val base = Similarity.PrBase - Similarity.PrBase * Similarity.PrDamp / 100
    var r = emb.keys.map(_ -> Similarity.PrBase).toMap
    (1 to Similarity.PrIters).foreach { _ =>
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      adj.foreach { case (u, ns) =>
        if (ns.nonEmpty) {
          val c = r(u) / ns.size
          ns.foreach(v => inflow(v) += c)
        }
      }
      r = emb.keys.map(v => v -> (base + Similarity.PrDamp * inflow(v) / 100)).toMap
    }
    val got = Similarity.knnPagerank(spark, Sf).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(got.keySet === emb.keySet)
    r.foreach { case (v, want) => assert(got(v)._2 === want, s"pr of $v") }
    // degrees match the mutual graph; dangling vertices hold exactly the base mass
    adj.foreach { case (v, ns) => assert(got(v)._1 === ns.size.toLong) }
    got.filter(_._2._1 == 0L).foreach { case (v, (_, pr)) =>
      assert(pr === base, s"dangling $v must hold only the base mass")
    }
    assert(got.values.map(_._2).toSet.size > 1, "flat ranks — vacuous graph?")
  }

  test("knn_components: clusters are the transitive closure of the mutual graph") {
    // rebuild the mutual edge set driver-side (same recount as knn_mutual's)
    val emb = graft.model.Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * Similarity.Scale).toLong))
      .filter(_._1 % Similarity.KnnGraphMod == 0)
      .toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val knn = emb.keys.map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .sortBy(n => (-cos(emb(q), emb(n)), n))
        .take(Similarity.TopK).toSet
    }.toMap
    val adj = knn.map { case (q, ns) => q -> ns.filter(n => knn(n).contains(q)) }
    // union-find closure
    val root = scala.collection.mutable.Map(emb.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (root(x) == x) x else { root(x) = find(root(x)); root(x) }
    adj.foreach { case (q, ns) => ns.foreach { n =>
      val (a, b) = (find(q), find(n)); if (a != b) root(math.max(a, b)) = math.min(a, b)
    } }
    val want = emb.keys.map(k => k -> find(k)).toMap
    val got = Similarity.knnComponents(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (v, c) => assert(got(v)._1 === c, s"component of $v") }
    // canonical member rules: min id is the kept representative
    got.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
      assert(members.count(_._2._3) === 1)
      members.foreach { case (_, (_, n, _)) => assert(n === members.size.toLong) }
    }
    assert(got.values.exists(_._2 > 1), "no multi-vertex component — vacuous")
  }

  test("cluster_purity: majority label and share recount per IVF cell") {
    val labels = graft.model.Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val cells = Similarity.ivfAssignments(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(x => labels(x._1))).toMap
    val got = Similarity.clusterPurity(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got.keySet === cells.keySet)
    assert(got.values.map(_._1).sum === labels.size.toLong,
      "cells must partition the vector set")
    cells.foreach { case (cid, ls) =>
      val (nMembers, topLabel, nTop, purity) = got(cid)
      assert(nMembers === ls.length.toLong)
      val byLabel = ls.groupBy(identity).view.mapValues(_.length).toMap
      val want = byLabel.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(topLabel === want._1, s"cell $cid majority label")
      assert(nTop === want._2.toLong, s"cell $cid majority count")
      val wantP = BigDecimal(want._2.toDouble / ls.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(purity === wantP, s"cell $cid purity")
    }
  }

  test("multimodal_dedup: per-modality content-hash groups recount exactly") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.model.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def kind(id: Long): String =
      if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
    val groups = docs.keys.groupBy(id => (kind(id), md5hex(docs(id))))
    val got = Multimodal.dedupBlobs(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(got.size == docs.size)
    got.foreach { case (id, (mk, h, canon, n, keep)) =>
      assert(mk == kind(id) && h == md5hex(docs(id)), s"doc $id hash/kind")
      val g = groups((mk, h))
      assert(canon == g.min, s"doc $id canonical")
      assert(n == g.size.toLong, s"doc $id copies")
      assert(keep == (id == g.min), s"doc $id keep")
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
