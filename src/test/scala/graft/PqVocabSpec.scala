package graft

import java.io.File
import scala.sys.process.{Process, ProcessLogger}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextOps}

/** r11 additions: product quantization (pq_encode / ann_pq) and corpus
  * vocabulary construction (vocab_build).
  */
class PqVocabSpec extends AnyFunSuite with TestSpark {

  test("pq_encode covers every (vector, subspace) cell once, codes in range") {
    val rows = Similarity.pqEncode(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val n = graft.model.Tables.embeddings(spark, Sf).count()
    assert(rows.length == n * Similarity.PqSubs,
      s"expected ${n * Similarity.PqSubs} code cells, got ${rows.length}")
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length,
      "duplicate (vec_id, sub) cells")
    assert(rows.forall(r => r._3 >= 0 && r._3 < Similarity.PqCodebookK),
      "code outside [0, PqCodebookK)")
    // |x - c|^2 is a sum of squares: any negative qerr means the integer
    // algebra (xn - 2 x.c + cn) drifted between engines.
    assert(rows.forall(_._4 >= 0L), "negative quantization error")
  }

  test("widening the PQ codebook shrinks quantization error (the k dial law)") {
    val vecs = Similarity.fixedVecs(spark, Sf)
    def meanQerr(k: Int): Double =
      Similarity.pqCodesFrom(vecs, Similarity.pqCodebook(vecs, k))
        .agg(avg("qerr")).head().getDouble(0)
    val narrow = meanQerr(8)
    val wide = meanQerr(32)
    assert(wide < narrow,
      s"k=32 mean qerr $wide not below k=8's $narrow — the codebook dial is dead")
  }

  test("ann_pq: a wider ADC shortlist only improves the re-ranked cosine at every rank") {
    // shortlist(10) is a prefix of shortlist(100) by construction (same ADC
    // ordering), so the exact re-rank over the superset must dominate
    // rank-for-rank — if it ever loses, the shortlist cut and the re-rank
    // disagree about ordering.
    def byQueryRank(shortlist: Int): Map[(Long, Int), Double] =
      Similarity.annPqWith(spark, Sf, shortlist).collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(3)).toMap
    val narrow = byQueryRank(10)
    val wide = byQueryRank(100)
    assert(narrow.nonEmpty)
    narrow.foreach { case (key, cosNarrow) =>
      val cosWide = wide.getOrElse(key,
        fail(s"query/rank $key present at shortlist=10 but missing at 100"))
      assert(cosWide >= cosNarrow,
        s"$key: widening the shortlist LOWERED the re-ranked cosine " +
          s"($cosNarrow -> $cosWide)")
    }
  }

  test("ann_pq returns exactly top-k contiguous ranks per probe") {
    val rows = Similarity.annPq(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1 to Similarity.TopK),
        s"probe $q ranks ${rs.map(_._2).sorted.mkString(",")}")
    }
  }

  test("vocab_build: contiguous ranks per kind, tf >= df, bigrams need 2 tokens") {
    val rows = TextOps.vocabBuild(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val kinds = rows.map(_._1).distinct.sorted
    assert(kinds.sameElements(Seq("bigram", "unigram")))
    rows.groupBy(_._1).foreach { case (kind, rs) =>
      assert(rs.map(_._5).sorted.sameElements(1 to rs.length),
        s"$kind ranks not contiguous from 1")
      assert(rs.length <= TextOps.VocabTopN)
    }
    assert(rows.forall(r => r._3 >= r._4), "tf below df")
    assert(rows.forall(_._4 >= 1), "df must count at least one document")
    assert(rows.filter(_._1 == "bigram").forall(_._2.split(" ").length == 2),
      "a bigram gram must be exactly two space-joined tokens")
  }

  test("vocab_coverage: per-doc OOV recount against the shipped vocabulary") {
    val vocab = TextOps.vocabBuild(spark, Sf).collect()
      .filter(_.getString(0) == "unigram").map(_.getString(1)).toSet
    // sf0.001's whole unigram population is below TopN — the vocabulary is
    // then the full population and coverage must report zero OOV mass.
    assert(vocab.nonEmpty && vocab.size <= TextOps.VocabTopN)
    val got = TextOps.vocabCoverage(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = graft.model.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
    assert(docs.length == got.size, "one coverage row per document")
    docs.foreach { r =>
      val toks = r.getString(1).toLowerCase.split(" ", -1)
      val oov = toks.count(t => !vocab.contains(t))
      val (nTok, oovTok, rate) = got(r.getLong(0))
      assert(nTok == toks.length.toLong, s"doc ${r.getLong(0)} token count")
      assert(oovTok == oov.toLong, s"doc ${r.getLong(0)} OOV count")
      val want = BigDecimal(oov.toDouble / toks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate == want, s"doc ${r.getLong(0)} OOV rate")
    }
  }

  test("perplexity_filter: band verdicts recount against the exact nearest-rank median") {
    val scores = TextOps.tokenSurprisal(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val sorted = scores.values.toSeq.sorted
    val median = sorted((sorted.length + 1) / 2 - 1)
    val got = TextOps.perplexityFilter(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.length == scores.size)
    got.foreach { case (id, mb, med, ok) =>
      assert(mb === scores(id))
      assert(med === median, "corpus_median must be the nearest-rank order statistic")
      assert(ok === (math.abs(mb - median) <= TextOps.PerplexityBand), s"doc $id")
    }
    assert(got.exists(!_._4), "no doc outside the band — vacuous")
    assert(got.count(_._4) > got.length / 2, "majority must pass a median-centred band")
  }

  test("stream_mix: live counts land on the batch mixing verdict exactly") {
    val batch = TextOps.mixRebalance(spark, Sf).collect().map(_.toString).sorted
    val live = graft.streaming.DedupStream.mixQuery(spark, Sf)
      .collect().map(_.toString).sorted
    assert(live === batch)
    assert(batch.nonEmpty)
  }

  test("vocab_build passes the DuckDB oracle gate on the adversarial fixture") {
    // The fixture's empty document splits to a single empty token: the
    // bigram branch must short-circuit (sequence(1, 0) DESCENDS in Spark)
    // and both engines must agree on counting the '' unigram.
    val fixtureDir = AdversarialFixture.dir(spark)
    val out = "/root/repo/target/pq_vocab_verify"
    Verify.dump(spark, fixtureDir, out, Some(Set("vocab_build")))
    val log = new StringBuilder
    val exit = Process(
      Seq("python3", "tools/oracle_check.py", fixtureDir, out),
      new File("/root/repo")).!(ProcessLogger(s => log.append(s).append('\n')))
    assert(exit === 0, s"oracle_check failed on the adversarial fixture:\n$log")
  }
}
