package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The dump itself, separated from session lifecycle so Round9Spec can
    * run the SAME gate (dump + tools/oracle_check.py) over an adversarial
    * fixture dir inside the shared test session without stopping it.
    */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]] = None): Unit = {
    new java.io.File(outDir).mkdirs()
    only.foreach { names =>
      require(names.nonEmpty,
        "op filter is set but names no ops — the dump would be " +
          "empty and the oracle check would pass vacuously")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"op filter names unknown ops: ${unknown.mkString(", ")}")
    }
    def selected(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(e => selected(e._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    writeOracleJson(outDir, SparkEntry.oracleSql.filter(e => selected(e._1)))
  }

  /** Write `<outDir>/oracle_sql.json` — factored out of [[dump]] so the
    * oracle-COST gate (Round15Spec + tools/oracle_profile.py) can profile
    * every oracle without executing any Spark query first.
    *
    * JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def writeOracleJson(outDir: String, oracles: Map[String, String]): Unit = {
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // -Dgraft.verify.ops=a,b restricts the dump (and the oracle json) for
    // fast local iteration on a changed operator; the driver runs unfiltered.
    // Names are trimmed and validated — a typo'd op would otherwise dump
    // nothing and make the subsequent oracle check pass vacuously.
    val only = sys.props.get("graft.verify.ops")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    dump(spark, sfDir, outDir, only)
    spark.stop()
  }
}
