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

  test("sample_holdout: split is a pure salted-hash function, bands sized as configured") {
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (BigInt(hex, 16) % 100).toInt
    }
    val rows = TextOps.sampleHoldout(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
    val nDocs = Tables.documents(spark, Sf).count()
    assert(rows.length.toLong == nDocs, "every document gets exactly one split")
    rows.foreach { case (id, b, split) =>
      assert(b == bucket(id), s"doc $id bucket")
      val want =
        if (b < TextOps.HoldoutTestPct) "test"
        else if (b < TextOps.HoldoutTestPct + TextOps.HoldoutValPct) "val"
        else "train"
      assert(split == want, s"doc $id split")
    }
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(Set("train", "val", "test").subsetOf(bySplit.keySet),
      "all three splits must be populated at fixture size")
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // independence from the sampling hash: the salted split of the sampled
    // subset must not collapse into one band
    val sampled = TextOps.sampleStratified(spark, Sf).collect().map(_.getLong(0)).toSet
    val sampledSplits = rows.filter(r => sampled.contains(r._1)).map(_._3).toSet
    assert(sampledSplits.size >= 2, "sampling and split hashes correlate")
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

  test("chunk_documents: sliding windows tile every doc exactly, tail always covered") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextOps.chunkDocuments(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet, "every doc chunks, even empty ones")
    val stride = TextOps.ChunkTokens - TextOps.ChunkOverlap
    chunks.foreach { case (docId, rows) =>
      val n = docs(docId)
      val byId = rows.sortBy(_._2)
      // chunk ids are contiguous from 0 and the count matches the formula
      assert(byId.map(_._2).sameElements(byId.indices.map(_.toLong)))
      val nc = math.max(1L, (n - TextOps.ChunkOverlap + stride - 1L) / stride)
      assert(byId.length === nc, s"doc $docId n=$n")
      // all chunks full except possibly the last; every width in [1, window]
      byId.init.foreach { case (_, _, w) => assert(w === TextOps.ChunkTokens) }
      byId.foreach { case (_, _, w) =>
        assert(w >= 1 && w <= TextOps.ChunkTokens)
      }
      // tiling identity: widths minus the repeated overlaps reconstruct n,
      // so the union covers [0, n) with the tail inside the last window
      val covered = byId.map(_._3.toLong).sum -
        TextOps.ChunkOverlap.toLong * (byId.length - 1)
      assert(covered === n.toLong, s"doc $docId tiles to $covered, n=$n")
    }
    // determinism: a rerun is bit-identical (hashes included)
    val a = TextOps.chunkDocuments(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    val b = TextOps.chunkDocuments(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    assert(a.sameElements(b))
  }

  test("mix_rebalance: integer rate derivation matches the hand formula, kept counts match an independent md5 oracle") {
    import spark.implicits._
    // skewed corpus: en-heavy, zh scarce relative to its 15% target
    val perLang = Seq("en" -> 400, "de" -> 100, "es" -> 80, "fr" -> 60, "zh" -> 30)
    var id = 0L
    val docs = perLang.flatMap { case (l, n) =>
      (1 to n).map { _ => id += 1; (id, s"text $id", l) }
    }.toDF("doc_id", "text", "lang")
    val rows = TextOps.mixRebalanceFrom(spark, docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet === perLang.map(_._1).toSet)
    // the scarcest group relative to its target caps the mixture
    val targets = TextOps.MixTargets.toMap
    val tTotal = perLang.map { case (l, n) => n.toLong * 100 / targets(l) }.min
    assert(tTotal === 200L, "zh (30 docs / 15%) must be the cap")
    perLang.foreach { case (l, n) =>
      val (nDocs, pct, rateBp, kept, _) = rows(l)
      assert(nDocs === n.toLong)
      assert(pct === targets(l))
      assert(rateBp === tTotal * targets(l) / 100 * 10000 / n,
        s"$l rate_bp")
      // independent oracle: recompute the hash threshold with plain JVM md5
      val md = java.security.MessageDigest.getInstance("MD5")
      val expectKept = docs.filter(col("lang") === l)
        .select("doc_id").collect().map(_.getLong(0)).count { d =>
          val hex = md.digest(d.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15)
          java.lang.Long.parseLong(hex, 16) % 10000 < rateBp
        }
      assert(kept === expectKept.toLong, s"$l kept")
    }
    // shares sum to 1 (within the rounding of 6 dp)
    assert(math.abs(rows.values.map(_._5).sum - 1.0) < 1e-4)
  }

  test("mix_temperature: rarest language kept whole, rates follow the sqrt law, kept counts match an independent md5 oracle") {
    import spark.implicits._
    val perLang = Seq("en" -> 400, "de" -> 100, "es" -> 80, "fr" -> 60, "zh" -> 30)
    var id = 0L
    val docs = perLang.flatMap { case (l, n) =>
      (1 to n).map { _ => id += 1; (id, s"text $id", l) }
    }.toDF("doc_id", "text", "lang")
    val rows = TextOps.mixTemperatureFrom(spark, docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet === perLang.map(_._1).toSet)
    val cMin = perLang.map(_._2).min.toLong
    perLang.foreach { case (l, n) =>
      val (nDocs, rateBp, origShare, kept, _) = rows(l)
      assert(nDocs === n.toLong)
      // the sqrt law, in the exact IEEE steps the op documents
      assert(rateBp ===
        math.floor(math.sqrt(cMin / n.toDouble) * 10000).toLong, s"$l rate_bp")
      assert(math.abs(origShare - n.toDouble / 670) < 1e-6, s"$l orig_share")
      // independent oracle: salted JVM md5 threshold
      val md = java.security.MessageDigest.getInstance("MD5")
      val expectKept = docs.filter(col("lang") === l)
        .select("doc_id").collect().map(_.getLong(0)).count { d =>
          val hex = md.digest(s"temp:$d".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15)
          java.lang.Long.parseLong(hex, 16) % 10000 < rateBp
        }
      assert(kept === expectKept.toLong, s"$l kept")
    }
    // the rarest language is kept whole: rate exactly 10000 basis points
    assert(rows("zh")._2 === 10000L)
    assert(rows("zh")._4 === 30L)
    // flattening: common languages are cut harder than rare ones
    assert(rows("en")._2 < rows("de")._2)
    assert(rows("de")._2 < rows("zh")._2)
    assert(math.abs(rows.values.map(_._5).sum - 1.0) < 1e-4)
  }

  test("embed_hashing matches an independent JVM md5 recount and stays sparse") {
    val docs = graft.model.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = docs.flatMap { case (id, text) =>
      text.toLowerCase.split(" ", -1).map { tok =>
        val h = h60(tok)
        (id, (h % TextOps.EmbedDims).toInt) -> (h / TextOps.EmbedDims % 2 * 2 - 1)
      }
    }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val got = TextOps.embedHashing(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.keys.map(_._2).forall(d => d >= 0 && d < TextOps.EmbedDims))
    // sparse: every doc has at most EmbedDims rows
    got.keys.groupBy(_._1).foreach { case (id, ks) =>
      assert(ks.size <= TextOps.EmbedDims, s"doc $id over-dense")
    }
  }

  test("text_knn matches a driver-side exact hashed-vector recount") {
    val docs = graft.model.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val dense = docs.map { case (id, text) =>
      val v = new Array[Long](TextOps.EmbedDims)
      text.toLowerCase.split(" ", -1).foreach { tok =>
        val h = h60(tok)
        v((h % TextOps.EmbedDims).toInt) += h / TextOps.EmbedDims % 2 * 2 - 1
      }
      id -> v
    }.filter(_._2.exists(_ != 0)).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val want = dense.keys.filter(_ % TextOps.TextKnnMod == 0).map { q =>
      q -> dense.keys.filter(_ != q).toSeq
        .sortBy(n => (-cos(dense(q), dense(n)), n))
        .take(TextOps.TextKnnK)
    }.toMap
    val got = TextOps.textKnn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3)))
      .groupBy(_._1._1)
    assert(got.keySet === want.keySet)
    want.foreach { case (q, ns) =>
      val rows = got(q).sortBy(_._1._2)
      assert(rows.map(_._1._2).toSeq === (1 to ns.length), s"ranks of $q")
      rows.zip(ns).foreach { case (((_, rk), (gotN, gotCos)), wantN) =>
        assert(gotN === wantN, s"probe $q rank $rk neighbor")
        assert(math.abs(gotCos - cos(dense(q), dense(wantN))) < 1e-6)
      }
    }
  }

  test("boilerplate_share: duplicated texts share every chunk, partial overlap shares some") {
    import spark.implicits._
    val words = (1 to 200).map(i => s"w$i")
    val dupText = words.take(150).mkString(" ")
    // doc 3 shares EXACTLY doc 1's first chunk (64 tokens), then diverges
    val partial = (words.take(TextOps.ChunkTokens) ++
      (1 to 100).map(i => s"z$i")).mkString(" ")
    val docs = Seq(
      (1L, dupText), (2L, dupText), (3L, partial),
      (4L, (1 to 80).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = TextOps.boilerplateShareFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // full duplicates: every chunk shared
    assert(rows(1L)._3 === 1.0)
    assert(rows(2L)._3 === 1.0)
    // partial: the first window hashes identically in docs 1 and 3 (both
    // slice tokens [0, 64) of the same prefix), the rest are unique
    assert(rows(3L)._2 === 1L, s"doc 3 got ${rows(3L)}")
    assert(rows(3L)._3 > 0.0 && rows(3L)._3 < 1.0)
    // unique doc: nothing shared
    assert(rows(4L)._2 === 0L)
    assert(rows(4L)._3 === 0.0)
    // and per-doc chunk counts agree with the chunk frame itself
    val nChunks = TextOps.chunkDocumentsFrom(docs)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, (n, _, _)) => assert(n === nChunks(d)) }
  }

  test("text_tfidf: integer-bit IDF ranks rare terms first, deterministic ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common common common"),
      (2L, "banana cherry common common"),
      (3L, "common common common")
    ).toDF("doc_id", "text")
    // n_docs=3; df: apple 1, banana 2, cherry 1, common 3
    // idf_bits = floor(log2(3 // df)): apple 1, banana 0, cherry 1, common 0
    val rows = TextOps.textTfidfFrom(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(rows.filter(_._1 == 1L).map(t => (t._2, t._3, t._5)).toSeq ===
      Seq((1, "apple", 2L), (2, "banana", 0L), (3, "common", 0L)))
    assert(rows.filter(_._1 == 2L).map(t => (t._2, t._3, t._5)).toSeq ===
      Seq((1, "cherry", 1L), (2, "banana", 0L), (3, "common", 0L)))
    // doc 3 has a single distinct token: one row, not padded to k
    assert(rows.filter(_._1 == 3L).map(t => (t._2, t._3, t._5)).toSeq ===
      Seq((1, "common", 0L)))
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
