package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure `dedup_semantic`'s dial frontier: drop-rate vs (threshold,
  * centroidMod) plus how many of the ALL-PAIRS duplicates the cell
  * scoping actually sees (its recall). The brute-force truth is every
  * pair at cosine ≥ threshold regardless of cell — quadratic, harness
  * only, like `ann_recall`'s exact side.
  *
  * `runMain graft.SemTune [sfDir] [mod,mod,...] [thr,thr,...]`
  * (defaults: /root/testdata/sf0.01, mods 64,125,250, thr 0.35,0.4,0.45).
  * Results land in docs/TUNING.md.
  */
object SemTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mods = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(64, 125, 250))
    val thrs = args.lift(2).map(_.split(",").map(_.toDouble).toSeq)
      .getOrElse(Seq(0.35, 0.4, 0.45))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecMath.register(spark)

    import graft.operators.Similarity
    val emb = graft.model.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id",
        s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${Similarity.Scale}) AS BIGINT)) AS v")
      .withColumn("nrm", expr("vec_dot(v, v)"))
      .persist()
    val n = emb.count()

    println("%6s %6s | %9s %9s | %s".format(
      "thr", "mod", "dropped", "all-pairs", "recall"))
    thrs.foreach { thr =>
      // brute-force duplicate truth: vec has ANY lower-id partner >= thr
      val lower = emb.selectExpr("vec_id AS a_id", "v AS av", "nrm AS an")
      val truth = emb.join(lower, col("a_id") < col("vec_id"))
        .filter(expr("vec_dot(v, av)") / (sqrt(col("nrm")) * sqrt(col("an"))) >= thr)
        .select("vec_id").distinct().count()
      mods.foreach { mod =>
        val got = Similarity.semanticDedupWith(spark, sfDir, thr, mod)
          .filter(!col("kept")).count()
        val recall = if (truth == 0) 1.0 else got.toDouble / truth
        println(f"$thr%6.2f $mod%6d | $got%9d $truth%9d | $recall%.3f")
      }
    }
    println(s"(n=$n vectors; 'dropped' = vectors with an in-cell lower-id " +
      "partner; recall = dropped / all-pairs-dup truth)")
    emb.unpersist()
    spark.stop()
  }
}
