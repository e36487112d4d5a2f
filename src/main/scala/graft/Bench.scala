package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered operator on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully materialized through the `noop` sink (a bare
  * `count()` would let Catalyst prune the computed columns away).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: touch every table + exercise codegen/shuffle machinery once,
    // so the first measured query doesn't pay JVM/classloading costs
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      graft.model.Tables.table(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    graft.model.Tables.metrics(spark, sfDir)
      .groupBy("path").count().write.format("noop").mode("overwrite").save()

    val results = Registry.ops.map { op =>
      val t0 = System.nanoTime()
      try op.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${op.name} failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // inter-query isolation: one op must not re-price the ones after it.
      // clearCache drops Dataset-level cache entries; the RDD sweep frees
      // localCheckpoint blocks, which live OUTSIDE the CacheManager.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      op.name -> dt
    }

    val qs = results
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
