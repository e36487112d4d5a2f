package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE dial-sweep harness: corpus compression (tokens per word) as a
  * function of merge count — the curve `Bpe.Merges` is set from. The merge
  * sequence is prefix-stable, so one training at the sweep maximum yields
  * every point by slicing; per point the corpus-weighted token count is one
  * nested-replace projection over the distinct-word frame joined to the
  * word-frequency table (no re-scan of documents). `chars_per_tok` is the
  * mean compressed-symbol length (char+</w> inventory / tokens) — it rises
  * as merges fuse; the tokens/word curve flattening is the law that says
  * where extra merges stop paying. Run:
  *
  *   runMain graft.BpeTune [sfDir]
  */
object BpeTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-bpe-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sweep = Seq(0, 2, 4, 8, 16, 32, 64)
    val all = Bpe.trainedMergesN(spark, dir, sweep.max)
    if (all.size < sweep.max)
      println(s"note: merge supply dried up at ${all.size} rounds on this corpus")

    val wordFreq = Bpe.corpusWords(spark, dir)
      .groupBy("word").agg(count(lit(1)).as("freq")).persist()
    val Seq(totWords, totChars) = wordFreq
      .agg(sum("freq"), sum(col("freq") * length(col("word"))))
      .head().toSeq.map(_.asInstanceOf[Long]): @unchecked

    println(f"corpus: $totWords%d word occurrences, $totChars%d chars, " +
      f"${all.size}%d merges trained")
    println("merges  tokens       tok/word  chars+eow/tok")
    sweep.filter(_ <= all.size).foreach { n =>
      val chain = Bpe.applyChainSql(all.take(n))
      val toks = wordFreq
        .withColumn("n_sym", expr(s"cast(size(split(trim($chain), '  ')) as bigint)"))
        .agg(sum(col("freq") * col("n_sym"))).head().getLong(0)
      println(f"$n%6d  $toks%10d  ${toks.toDouble / totWords}%8.4f  " +
        f"${(totChars + totWords).toDouble / toks}%8.4f")
    }
    wordFreq.unpersist(blocking = true)
    spark.stop()
  }
}
