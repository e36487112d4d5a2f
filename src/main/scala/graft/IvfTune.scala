package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF quantizer-training measurement harness: recall@k of the IVF index
  * after 0..N Lloyd iterations of `kmeans_train` (0 = the raw seed
  * quantizer `ann_ivf` ships) — the dial `TrainIters` is set from. Run:
  *
  *   runMain graft.IvfTune [sfDir] [maxIters]
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxIters = args.lift(1).map(_.toInt).getOrElse(4)

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ivf-tune")
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

    // inverted-list occupancy of a quantizer: (cells, max, mean) — the
    // scan-fraction skew measure `ann_ivf_balanced` exists to improve
    def cellStats(vecs: org.apache.spark.sql.DataFrame,
        cents: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val occ = Similarity.assignNearestOcc(vecs, cents)
      val r = occ.agg(count(lit(1)), max("occ"),
        sum("occ").cast("double") / count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }

    for (it <- 0 to maxIters; nprobe <- Seq(Similarity.NProbe, Similarity.NProbe + 1)) {
      val vecs = Similarity.fixedVecs(spark, dir)
      val cents =
        if (it == 0) Similarity.seedCents(vecs)
        else Similarity.mkCentsDf(spark, Similarity.trainedCents(spark, dir, it)._1)
      val cands = Similarity.ivfCands(vecs, cents, nprobe).cache()
      val scanned = cands.count() / (nProbes * (corpus - 1).toDouble)
      val matched = Similarity.topKFromCands(cands)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      cands.unpersist(blocking = true)
      val (k, mx, mn) = cellStats(vecs, cents)
      println(f"IVFTUNE iters=$it nprobe=$nprobe " +
        f"recall@${Similarity.TopK}=${matched.toDouble / nTruth}%.3f scanned=$scanned%.4f " +
        f"cells=$k cell_max=$mx cell_mean=$mn%.1f")
    }

    // the split-hot/merge-cold balanced quantizer (ann_ivf_balanced)
    for (nprobe <- Seq(Similarity.NProbe, Similarity.NProbe + 1)) {
      val vecs = Similarity.fixedVecs(spark, dir)
      val cents = Similarity.mkCentsDf(spark,
        Similarity.trainedCentsBalanced(spark, dir, maxIters))
      val cands = Similarity.ivfCands(vecs, cents, nprobe).cache()
      val scanned = cands.count() / (nProbes * (corpus - 1).toDouble)
      val matched = Similarity.topKFromCands(cands)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      cands.unpersist(blocking = true)
      val (k, mx, mn) = cellStats(vecs, cents)
      println(f"IVFTUNE balanced iters=$maxIters nprobe=$nprobe " +
        f"recall@${Similarity.TopK}=${matched.toDouble / nTruth}%.3f scanned=$scanned%.4f " +
        f"cells=$k cell_max=$mx cell_mean=$mn%.1f")
    }
    truth.unpersist(blocking = true)
    spark.stop()
  }
}
