package graft

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

import graft.api.MetricsApi
import graft.model.Tables
import graft.operators.{Analytics, TextOps}

/** Round-9 regression gate for the latent-input bugs fixed in 4f2dc29 —
  * inputs the shared all-ASCII sf fixture never exercises: non-ASCII text
  * (codepoints >= 2326 whose gram hash overflows INT32), an empty document,
  * negative / missing JSON props keys, and a historic narrow fetch window.
  *
  * The fixture is dumped through the REAL driver gate: `Verify.dump` writes
  * the op results + oracle_sql.json and `tools/oracle_check.py` replays the
  * oracles in DuckDB over the same parquet — so cross-engine divergence on
  * adversarial inputs fails `sbt test`, not just the per-round driver run.
  */
class Round9Spec extends AnyFunSuite with TestSpark {

  // ---- adversarial fixture -------------------------------------------------
  // (shared with Round11Spec's streaming gate — see AdversarialFixture)

  private val FixtureDocs = AdversarialFixture.Docs.map(_._2)

  private lazy val fixtureDir: String = AdversarialFixture.dir(spark)

  // ---- the cross-engine gate ----------------------------------------------

  test("adversarial fixture passes the real DuckDB oracle gate") {
    // REGRESSION (pre-4f2dc29): this very gate aborts three ways — DuckDB
    // errors on the INT32 gram-hash overflow (doc 3), diverges on the empty
    // doc's NaN-vs-NULL punct_ratio (doc 2), and the event_props oracle
    // dies on CAST('' AS BIGINT) for the k-less beta rows.
    val out = "/root/repo/target/round9_verify"
    // r11 additions ride the same gate: the retrieval-prep trio must chunk,
    // share-count, and keyword-rank the empty and non-ASCII docs identically
    // in both engines (empty text = one ''-token chunk; CJK/emoji tokens
    // case-fold as no-ops and hash byte-identically over UTF-8).
    // vocab_coverage joins too: the empty doc's '' token and the non-ASCII
    // grams must land in/out of the tiny fixture vocabulary identically.
    // embed_hashing/text_knn (r11 cont.): the empty doc's single '' token
    // and the CJK/emoji tokens must hash to the same (dim, sign) in both
    // engines, and the densify→cosine chain must survive the tiny corpus.
    // r12 additions: quality_select's per-lang cut pairs over the tiny
    // skewed-language fixture (single-doc languages: cut = the doc itself,
    // keep = true), chunk_knn's chunk embeddings over the empty/non-ASCII
    // docs, and multimodal_phash's lanes over their digests — all must
    // land identically in both engines even when the pair/probe sets are
    // empty at this size.
    Verify.dump(spark, fixtureDir, out,
      Some(Set("text_quality", "doc_fingerprint", "event_props",
        "chunk_documents", "boilerplate_share", "text_tfidf",
        "vocab_coverage", "embed_hashing", "text_knn",
        "quality_select", "chunk_knn", "multimodal_phash")))
    val log = new StringBuilder
    val exit = Process(
      Seq("python3", "tools/oracle_check.py", fixtureDir, out),
      new File("/root/repo")).!(ProcessLogger(s => log.append(s).append('\n')))
    assert(exit === 0, s"oracle_check failed on the adversarial fixture:\n$log")
  }

  // ---- Spark-side assertions (independent of DuckDB) ----------------------

  test("text_quality: empty doc is dropped, not NaN-kept") {
    val rows = TextOps.textQuality(spark, fixtureDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // REGRESSION (pre-4f2dc29): punct_ratio for chars=0 divided 0/0 -> NaN,
    // and Spark orders NaN above every double, so `score >= 0.5` kept the
    // empty doc (DuckDB said NULL -> false: silent cross-engine divergence).
    assert(rows(2L).getAs[Double]("punct_ratio") === 0.0)
    assert(!rows(2L).getAs[Boolean]("keep"))
  }

  test("text_quality: sentence-initial capitalized stopwords count") {
    val rows = TextOps.textQuality(spark, fixtureDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // REGRESSION (pre-4f2dc29): stopword matching was case-sensitive, so a
    // doc whose only stopwords are sentence-initial ("The ... It ...")
    // scored stop_ratio = 0.
    val nTok = FixtureDocs.head.split(" ").length
    assert(rows(1L).getAs[Double]("stop_ratio") ===
      BigDecimal(2.0 / nTok).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("doc_fingerprint: non-ASCII grams hash without overflow, ASCII unchanged") {
    // Independent oracle: the same bottom-k 5-gram polynomial hash computed
    // over JVM code points in plain Scala Longs.
    def expected(text: String): String = {
      val cps = text.codePoints().toArray
      if (cps.length < 5) ""
      else (0 to cps.length - 5)
        .map(i => cps(i).toLong * 923521L + cps(i + 1) * 29791L +
          cps(i + 2) * 961L + cps(i + 3) * 31L + cps(i + 4))
        .distinct.sorted.take(TextOps.FingerprintK).mkString("-")
    }
    val got = TextOps.fingerprint(spark, fixtureDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint")).toMap
    // REGRESSION (pre-4f2dc29): ascii(c) stayed INT32, so doc 3's first gram
    // (8364 * 923521) overflowed and ANSI Spark threw ARITHMETIC_OVERFLOW
    // instead of producing any fingerprint.
    assert(got(3L) === expected(FixtureDocs(2)))
    assert(got(4L) === expected(FixtureDocs(3)))
    assert(got(2L) === "") // shorter than one gram
  }

  test("event_props: a type whose rows never carry the key still aggregates") {
    val rows = Analytics.eventProps(spark, fixtureDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // REGRESSION (pre-4f2dc29): the DuckDB oracle CAST the raw regex extract
    // ('' for beta's k-less rows) to BIGINT and aborted the WHOLE query; the
    // regex also missed negative values and "k":<spaces> spacing, skewing
    // alpha. Spark must see n=2 with all-NULL k for beta, and alpha must
    // include both -7 and the space-free 12.
    assert(rows("beta").getAs[Long]("n") === 2L)
    assert(rows("beta").isNullAt(rows("beta").fieldIndex("k_sum")))
    assert(rows("alpha").getAs[Long]("k_sum") === 10L)
    assert(rows("alpha").getAs[Long]("k_min") === -7L)
    assert(rows("alpha").getAs[Long]("k_max") === 12L)
  }

  // ---- r8-ADVICE faithfulness fixes ---------------------------------------

  test("config front door matches LoadRollups edges: fractional windows, unanchored retention, silent empty drop") {
    import graft.model.RollupConfigFile.{parse, parseRetentionSec, parseWindowSec}
    // Go time.ParseDuration accepts fractional terms
    assert(parseWindowSec("1.5h").contains(5400L))
    assert(parseWindowSec(".5m").contains(30L))
    // the reference retention regex is an UNANCHORED FindStringSubmatch:
    // first <int><letter> run wins, trailing junk ignored, quirk included
    assert(parseRetentionSec("30dxyz").contains(2592000L))
    assert(parseRetentionSec("1h30m").contains(3600L))
    assert(parseRetentionSec("30s").isEmpty) // 's' is still not a retention unit
    // an EMPTY retention list drops the expression silently — the
    // reference's `len(rd.Windows) > 0` guard never touches configIsClean
    val loaded = parse(
      """rollups:
        |  "^a.*":
        |    aggregation: max
        |    retention: []
        |  default:
        |    aggregation: average
        |    retention: [ 1m:1d ]
        |""".stripMargin)
    assert(loaded.clean)
    assert(!loaded.defs.exists(_.key == "^a.*"))
  }

  test("carbon wire parse: whitespace runs + fractional ts are valid (strings.Fields/ParseFloat)") {
    import spark.implicits._
    val parsed = graft.streaming.CarbonStream.parseCarbonLines(
      Seq(" a.b\t1.50  70", "a.b 1.50 70.75", "a.b 1.50", "a.b x 70").toDF("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // tab + double-space + leading blank tokenizes like strings.Fields, and
    // '70.75' parses like ParseFloat then floors to the engine's second grid;
    // the 2- and bad-value lines still drop
    assert(parsed.toSeq === Seq(("a.b", 1.5, 70L), ("a.b", 1.5, 70L)))
  }

  test("metrics API: historic narrow window reads the long-retention table") {
    val now = Tables.metrics(spark, Sf).agg(max("ts")).head().getLong(0)
    val from = now - 30L * 86400L
    // REGRESSION (pre-4f2dc29): table choice keyed on the RANGE LENGTH
    // (to - from = 3600 s), picking the 600 s / 1-day table whose rows have
    // long expired 30 days back; the reference keys on time.Since(q.From)
    // (metricquery.go:103) = point age, which lands on 86400 s / 365 d.
    val resp = MetricsApi.getMetrics(spark, Sf, Seq("servers.view.u5"),
      from, from + 3600L, nowSec = Some(now))
    assert(resp.step === 86400L)
  }
}
