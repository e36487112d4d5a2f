package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PQ dial-sweep harness: recall@k of `ann_pq` (ADC shortlist + exact
  * re-rank) across codebook sizes and shortlist widths, next to the mean
  * quantization error each codebook leaves — the dials `PqCodebookK` and
  * `PqShortlist` are set from. `rerank_frac` is the fraction of the corpus
  * the exact re-rank touches per probe (the fetch cost the compressed scan
  * is buying down). Run:
  *
  *   runMain graft.PqTune [sfDir]
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-pq-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val truth = Similarity.cosineTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nTruth = truth.count()
    val corpus = graft.model.Tables.embeddings(spark, dir).count()

    val sources = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("seed", "trained"))
    // optional dial lists (r15: the frontier moved past the built-ins)
    val ks = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 16, 32))
    val shortlists = args.lift(3).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(10, 25, 50, 100))
    for (source <- sources; k <- ks; shortlist <- shortlists) {
      val vecs = Similarity.fixedVecs(spark, dir)
      val cb =
        if (source == "seed") Similarity.pqCodebook(vecs, k)
        else Similarity.trainedPqCodebook(spark, dir, vecs, k)
      val meanQerr = Similarity.pqCodesFrom(vecs, cb)
        .agg(avg("qerr")).head().getDouble(0)
      val matched = Similarity.annPqWith(spark, dir, shortlist, k, source)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"PQTUNE source=$source k=$k shortlist=$shortlist " +
        f"recall@${Similarity.TopK}=${matched.toDouble / nTruth}%.3f " +
        f"rerank_frac=${shortlist / (corpus - 1).toDouble}%.4f " +
        f"mean_qerr=$meanQerr%.3e")
    }
    spark.stop()
  }
}
