package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** LSH dial-measurement harness: prints recall@k vs the exact brute-force
  * top-k AND the scanned candidate fraction for a sweep of
  * (tables, planes/table, probe distance) configurations — the "measure,
  * don't guess" loop behind the `ann_lsh_bucketed` operating point. Run:
  *
  *   runMain graft.LshTune [sfDir] [T:P:D ...]
  *
  * Defaults to the sf0.01 fixture and a sweep around the shipped config.
  * Scanned fraction = distinct scored pairs / (probes × (corpus-1)): the
  * share of the brute-force work the sketch actually performs.
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val configs: Seq[(Int, Int, Int)] =
      if (args.length > 1) args.drop(1).toSeq.map { s =>
        val Array(t, p, d) = s.split(":").map(_.toInt); (t, p, d)
      }
      else Seq((1, 6, 1), (3, 6, 1), (4, 8, 1), (8, 10, 2), (6, 12, 2),
        (8, 12, 2), (10, 12, 2), (8, 14, 2))

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-lsh-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val truth = Similarity.cosineTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nTruth = truth.count()
    val emb = graft.model.Tables.embeddings(spark, dir)
    val corpus = emb.count()
    val nProbes = emb.filter(col("vec_id") % Similarity.ProbeMod === 0).count()

    configs.foreach { case (t, p, d) =>
      val cands = Similarity.lshCandidates(spark, dir,
        Similarity.tablePlanesFor(t, p), d).cache()
      val scanned = cands.count() / (nProbes * (corpus - 1).toDouble)
      val matched = Similarity.topKFromCands(cands)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      cands.unpersist(blocking = true)
      println(f"LSHTUNE tables=$t%2d planes=$p%2d dist=$d " +
        f"recall@${Similarity.TopK}=${matched.toDouble / nTruth}%.3f scanned=$scanned%.4f")
    }
    truth.unpersist(blocking = true)
    spark.stop()
  }
}
