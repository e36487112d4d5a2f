package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** r11 addition: BPE tokenizer training (bpe_train) and its apply half
  * (bpe_encode). The DuckDB hash gate runs through the driver; these pin
  * the algebraic invariants the gate can't see.
  */
class BpeSpec extends AnyFunSuite with TestSpark {

  test("the wrapped-form replace IS greedy pair merging (runs included)") {
    // Both boundary spaces anchored means adjacent matches can't consume
    // each other's delimiter — a run of four merges pairwise in ONE call,
    // and no match can start inside a longer symbol. This invariant is
    // what makes one literal replace() == one BPE round on both engines.
    def one(s: String, l: String, r: String): String =
      spark.sql(s"SELECT replace('$s', ' $l  $r ', ' $l$r ')").head().getString(0)
    assert(one(" a  a  a  a ", "a", "a") == " aa  aa ")
    assert(one(" a  a  a ", "a", "a") == " aa  a ")
    assert(one(" xa  b ", "a", "b") == " xa  b ", "matched inside a symbol")
    assert(one(" a  bc ", "a", "b") == " a  bc ", "matched a symbol prefix")
    assert(one(" c  a  b  d ", "a", "b") == " c  ab  d ")
  }

  test("merge table: ranked, monotone counts, merges chain from earlier symbols") {
    val m = Bpe.trainedMerges(spark, Sf)
    assert(m.nonEmpty && m.size <= Bpe.Merges)
    assert(m.map(_._1) == (1 to m.size), "steps must be dense rank order")
    // a merged symbol's successor pairs can never outnumber the pair that
    // formed it, so top counts are non-increasing across rounds
    val counts = m.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts must be non-increasing: $counts")
    // every lhs/rhs is either a single char, </w>, or a previously merged symbol
    val known = scala.collection.mutable.Set[String]("</w>") ++ ('a' to 'z').map(_.toString)
    m.foreach { case (_, l, r, _) =>
      assert(known.contains(l) && known.contains(r),
        s"pair ($l, $r) references an unknown symbol")
      known += (l + r)
    }
  }

  test("trainedMerges memoizes per corpus dir (train once, reuse everywhere)") {
    assert(Bpe.trainedMerges(spark, Sf) eq Bpe.trainedMerges(spark, Sf))
  }

  test("bpe + vocab ops pass the DuckDB oracle gate on the adversarial fixture") {
    // empty text, capitalized-only stopwords, non-ASCII (every [a-z]+
    // extraction drops it identically on both engines), tiny 4-doc corpus
    // where the merge supply can dry up before Merges rounds — the shapes
    // the sf fixtures never produce. Replay through the REAL driver gate.
    import scala.sys.process.{Process, ProcessLogger}
    val fixtureDir = AdversarialFixture.dir(spark)
    val out = "/root/repo/target/bpe_verify"
    Verify.dump(spark, fixtureDir, out,
      Some(Set("bpe_train", "bpe_encode", "vocab_build")))
    val log = new StringBuilder
    val exit = Process(
      Seq("python3", "tools/oracle_check.py", fixtureDir, out),
      new java.io.File("/root/repo")).!(ProcessLogger(s => log.append(s).append('\n')))
    assert(exit == 0, s"oracle_check failed on the adversarial bpe gate:\n$log")
  }

  test("encode bounds: words <= tokens <= chars+words, ratio consistent") {
    val rows = Bpe.bpeEncode(spark, Sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.model.Tables.documents(spark, Sf)
      .selectExpr("doc_id",
        "aggregate(regexp_extract_all(lower(text), '[a-z]+', 0), 0L, (a, w) -> a + length(w)) AS chars",
        "size(regexp_extract_all(lower(text), '[a-z]+', 0)) AS words")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    rows.foreach { r =>
      val (id, nw, nt) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (chars, words) = docs(id)
      assert(nw == words, s"doc $id word count $nw != $words")
      // each word is at least 1 symbol and at most chars+1 (</w> marker)
      assert(nt >= nw, s"doc $id tokens $nt below word count $nw")
      assert(nt <= chars + nw, s"doc $id tokens $nt above char-level bound")
      assert(math.abs(r.getDouble(3) - nt.toDouble / nw) < 1e-6)
    }
  }
}
