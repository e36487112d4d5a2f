package graft

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared adversarial fixture (built for Round9Spec, reused by
  * Round11Spec's streaming gate): inputs the all-ASCII sf fixtures never
  * exercise — non-ASCII text whose gram hashes overflow INT32, an empty
  * document, negative / missing JSON props keys — written in the driver's
  * parquet layout so `Verify.dump` + `tools/oracle_check.py` can replay
  * any operator's DuckDB oracle over it.
  */
object AdversarialFixture {

  // doc 1: stopwords ONLY in sentence-initial capitalized position ("The",
  //        "It") — raw-case matching counts zero of them.
  // doc 2: empty text — 0-char division and 1-token split edge.
  // doc 3: non-ASCII — € (8364), CJK (20013+), Devanagari >= U+0915 (2325+),
  //        and a non-BMP emoji (U+1F600 = 128512); every gram hash overflows
  //        INT32.
  // doc 4: plain-ASCII control — values must be unchanged by any widening.
  val Docs = Seq(
    (1L, "The Cat Sat On My Mat. It Was Quite Nice Here."),
    (2L, ""),
    (3L, "€ 中文 हिन्दी 😀 emoji"),
    (4L, "plain ascii control words stay the same for this doc"))

  // event type "alpha" carries k in three JSON spacing/sign variants; type
  // "beta" has NO k key at all (regex extract yields '' pre-NULLIF).
  val Events = Seq(
    (1L, 1000000000L, 10L, "alpha", 1.0, """{"k": 5}"""),
    (2L, 2000000000L, 11L, "alpha", 2.0, """{"k":  -7}"""),
    (3L, 3000000000L, 12L, "alpha", 3.0, """{"k":12}"""),
    (4L, 4000000000L, 13L, "beta", 4.0, """{}"""),
    (5L, 5000000000L, 14L, "beta", 5.0, """{"x": 3}"""))

  private def rmRf(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmRf)
    f.delete(): Unit
  }

  /** Spark writes a part-file directory; the driver layout (and
    * oracle_check's DuckDB views) want a single `<name>.parquet` FILE.
    */
  private def writeSingleParquet(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = s"$dir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$dir/$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    rmRf(new File(tmp))
  }

  @volatile private var built: String = _

  def dir(spark: SparkSession): String = synchronized {
    if (built != null) return built
    val d = new File("/root/repo/target/round9_fixture")
    rmRf(d)
    d.mkdirs()
    import spark.implicits._
    writeSingleParquet(
      Docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("fixture"))
        .withColumn("n_chars", length(col("text")).cast("long")),
      d.getPath, "documents")
    writeSingleParquet(
      Events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        // the driver fixture's CURRENT on-disk flavor (TIMESTAMP/NTZ since
        // r9): the oracles' epoch_ns() route needs a timestamp column, and
        // Tables.normalizeTs folds it back to the epoch-nanos bigint the
        // Spark side contracts on — tuple values are nanos, so this is a
        // pure representation change
        .withColumn("ts", expr(
          "CAST(timestamp_seconds(ts / 1000000000.0) AS TIMESTAMP_NTZ)")),
      d.getPath, "events")
    built = d.getPath
    built
  }
}
