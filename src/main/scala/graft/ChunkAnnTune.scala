package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure `chunk_ann`'s dial frontier: retrieval recall of the
  * IVF-served chunk path vs the exact `chunk_knn` baseline, across
  * (centMod, nprobe) plus the scanned fraction each point pays — the
  * SemTune/KnnGraphTune pattern on the RAG chunk domain.
  *
  * `runMain graft.ChunkAnnTune [sfDir] [mod,...] [nprobe,...] [source,...]`
  * (defaults: /root/testdata/sf0.01, mods 13,25,50, nprobe 1,2,4, source
  * seed; sources: seed|trained — trained = ChunkTrainIters Lloyd rounds
  * from the same seeds, the r14 scale lever). Results land in
  * docs/TUNING.md.
  */
object ChunkAnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mods = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(13, 25, 50))
    val nprobes = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecMath.register(spark)

    import graft.operators.TextOps
    val truth = TextOps.chunkKnn(spark, sfDir)
      .select("query_doc", "chunk_doc", "chunk_id").persist()
    val nTruth = truth.count()

    val sources = args.lift(3).map(_.split(",").toSeq).getOrElse(Seq("seed"))
    // optional 5th arg: Lloyd iteration counts to sweep for the trained
    // source (e.g. "2,4") — the oracle cost dial (each iteration is one
    // n×k CTE round in DuckDB)
    val iterSweep = args.lift(4).map(_.split(",").map(_.toInt).toSeq)
    println("%8s %6s %7s | %6s | %s".format(
      "source", "mod", "nprobe", "n_hit", "recall"))
    sources.foreach { src =>
      mods.foreach { mod =>
        nprobes.foreach { np =>
          iterSweep match {
            case Some(its) if src == "trained" => its.foreach { it =>
              val cents = TextOps.mkChunkCentsDf(spark,
                TextOps.trainedChunkCents(spark, sfDir, it, mod))
              val nHit = TextOps.chunkAnnFrom(spark, sfDir,
                  TextOps.chunkDense(spark, sfDir), cents, np)
                .select("query_doc", "chunk_doc", "chunk_id")
                .join(truth, Seq("query_doc", "chunk_doc", "chunk_id")).count()
              val recall = if (nTruth == 0) 1.0 else nHit.toDouble / nTruth
              println(f"$src%8s(i$it) $mod%6d $np%7d | $nHit%6d | $recall%.3f")
            }
            case _ =>
              val nHit = TextOps.chunkAnnWith(spark, sfDir, mod, np, src)
                .select("query_doc", "chunk_doc", "chunk_id")
                .join(truth, Seq("query_doc", "chunk_doc", "chunk_id")).count()
              val recall = if (nTruth == 0) 1.0 else nHit.toDouble / nTruth
              println(f"$src%8s $mod%6d $np%7d | $nHit%6d | $recall%.3f")
          }
        }
      }
    }
    println(s"(truth = $nTruth exact top-k rows; scanned fraction per " +
      "probe ~ nprobe/|cells|, cells ~ |docs|/mod; shipped dial = " +
      s"ChunkCentMod ${TextOps.ChunkCentMod}, nprobe ${TextOps.ChunkNProbe})")
    truth.unpersist()
    spark.stop()
  }
}
