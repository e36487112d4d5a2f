package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure `knn_graph_ivf`'s dial frontier: mutual-edge recall of the
  * IVF cell-mate graph vs the exact slice kNN graph, across
  * (centroidMod, nprobe) — the `knn_graph_recall` measurement swept over
  * the dial grid (the SemTune/PqTune pattern). Runs on the tractable
  * `%5` vertex slice where the exact truth is affordable.
  *
  * `runMain graft.KnnGraphTune [sfDir] [mod,...] [nprobe,...] [rounds,...]
  * [source,...]` (defaults: /root/testdata/sf0.01, mods 63,125,251,
  * nprobe 1,2, rounds 0-3, source seed; sources: seed|trained — trained
  * = TrainIters Lloyd rounds from the same seeds, the r14 scale lever).
  * Results land in docs/TUNING.md.
  */
object KnnGraphTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mods = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(63, 125, 251))
    val nprobes = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 2))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecMath.register(spark)

    import graft.operators.Similarity
    val exact = Similarity.exactSliceEdges(spark, sfDir).persist()
    val nTruth = exact.count()

    val roundsSweep = args.lift(3).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(0, 1, 2, 3))
    val sources = args.lift(4).map(_.split(",").toSeq).getOrElse(Seq("seed"))
    println("%8s %6s %7s %7s | %9s %6s | %s".format(
      "source", "mod", "nprobe", "rounds", "n_approx", "n_hit", "edge_recall"))
    sources.foreach { src =>
      mods.foreach { mod =>
        nprobes.foreach { np =>
          roundsSweep.foreach { rounds =>
            val approx =
              if (rounds > 0)
                Similarity.sliceEdgesRefinedWith(spark, sfDir, src, mod, np, rounds)
              else Similarity.sliceEdgesIvfWith(spark, sfDir, src, mod, np)
            val nApprox = approx.count()
            val nHit = approx.join(exact, Seq("q_id", "n_id")).count()
            val recall = if (nTruth == 0) 1.0 else nHit.toDouble / nTruth
            println(f"$src%8s $mod%6d $np%7d $rounds%7d | $nApprox%9d $nHit%6d | $recall%.3f")
          }
        }
      }
    }
    println(s"(truth = $nTruth directed mutual edges from the exact slice " +
      "kNN; shipped dial = CentroidMod " +
      s"${graft.operators.Similarity.CentroidMod}, nprobe " +
      s"${graft.operators.Similarity.KnnGraphNProbe}, trained)")
    exact.unpersist()
    spark.stop()
  }
}
