package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pearson
import graft.model.Tables
import graft.operators.{Carbon, Dedup}
import graft.streaming.DedupStream

/** Round-4 additions: the ngram-jaccard document-frequency cap, the ring
  * rebalance delta, and the watermark-bounded streaming dedup.
  */
class Round4Spec extends AnyFunSuite with TestSpark {

  test("ngram_jaccard df-cap: a corpus-wide hot shingle neither blows up the join nor creates pairs") {
    import spark.implicits._
    // 40 filler docs all sharing the boilerplate "lorem ipsum dolor"
    // (df = 42 > MaxShingleDf = 32) but otherwise disjoint, plus one true
    // near-dup pair that ALSO carries the boilerplate. The cap must drop
    // the hot shingle (no pairs among fillers: their only overlap is
    // boilerplate) while still finding the true pair from its rare
    // shingles.
    val filler = (0L until 40L).map { i =>
      i -> (s"lorem ipsum dolor " + (0 until 10).map(j => s"w${i}x$j").mkString(" "))
    }
    val common = (1 to 30).map(j => s"c$j")
    val pair = Seq(
      200L -> ("lorem ipsum dolor " + common.mkString(" ")),
      201L -> ("lorem ipsum dolor " + (common.init :+ "zz").mkString(" ")))
    val docs = (filler ++ pair).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("hot_shingle").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((200L, 201L)),
      "exactly the planted near-dup pair, no boilerplate-only pairs")
  }

  test("ngram_jaccard df-cap does not change the fixture result (max df < cap)") {
    // The sf0.001 fixture's hottest shingle is far below MaxShingleDf, so
    // the capped operator must equal the uncapped jaccard computed here.
    val sh = Tables.documents(spark, Sf)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) >= 3
          |  THEN transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3)))
          |  ELSE array() END""".stripMargin)).as("shingle"))
      .distinct()
    val maxDf = sh.groupBy("shingle").count().agg(max("count")).head().getLong(0)
    assert(maxDf <= Dedup.MaxShingleDf, s"fixture max df $maxDf must be under the cap")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val uncapped = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard",
        round(col("common") / (col("sa.n") + col("sb.n") - col("common")), 6))
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.ngramJaccard(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped === uncapped)
  }

  test("peer_rebalance matches a driver-side recomputation from the reference hash") {
    val got = Carbon.peerRebalance(spark, Sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val pathPts = Tables.metrics(spark, Sf)
      .groupBy("path").agg(count(lit(1)).as("pts")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = pathPts
      .map { case (p, pts) =>
        val h = Pearson.hash8(UTF8String.fromString(p))
        (h % Carbon.PeerCount, h % Carbon.NewPeerCount != h % Carbon.PeerCount, pts)
      }
      .groupBy(_._1)
      .map { case (peer, rows) =>
        val paths = rows.length.toLong
        val moved = rows.count(_._2).toLong
        val movedPts = rows.filter(_._2).map(_._3).sum
        peer -> ((paths, moved, movedPts,
          BigDecimal(moved.toDouble / paths).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    assert(got === expected)
    // modulo rebalancing moves most paths — the measurement that motivates
    // a consistent-hash ring (moved_frac ~ 1 - 1/N', far above 1/N')
    val overallMoved = got.values.map(_._2).sum.toDouble / got.values.map(_._1).sum
    assert(overallMoved > 0.5)
  }

  test("stream_dedup_watermark: late copies dropped, in-horizon copies deduped, aged-out copies re-admitted") {
    val rows = DedupStream.dedupWatermarkQuery(spark, Sf).collect()
      .map(_.getLong(0)).toSet
    val mx = Tables.documents(spark, Sf).agg(max("doc_id")).head().getLong(0)
    val base = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base.subsetOf(rows), "every base document is emitted in batch 1")
    val expectedReplays = base
      .filter(d => d % 10 == 0 &&
        d + DedupStream.ReplayGap >= mx - DedupStream.Horizon && // not late
        d < mx - 2 * DedupStream.Horizon)                        // original aged out
      .map(_ + 1000000L)
    assert(rows.diff(base) === expectedReplays)
    assert(expectedReplays.nonEmpty, "the fixture must exercise the re-admit window")
  }
}
