package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.MetricsApi
import graft.model.Tables
import graft.operators.{Dedup, Rollups, Similarity, TextOps}
import graft.sources.RollupStore
import graft.streaming.CarbonStream

/** End-to-end lifecycle demo: everything a cassabon user does, plus the
  * training-data pipeline, in one run. `runMain graft.Demo [sfDir]`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_demo_store").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. ingest: the streaming path (file source standing in for the
    //    carbon socket), complete-mode windowed rollup
    val streamed = CarbonStream.rollupQuery(spark, dir)
    println(s"[demo] streaming ingest: ${streamed.count()} open rollup windows")

    // 2. the full multi-window write set, flushed to the partitioned store
    RollupStore.write(Rollups.rollups(spark, dir), store)
    val now = Tables.metrics(spark, dir).agg(max("ts")).collect().head.getLong(0)
    val retained = RollupStore.readRetained(spark, store, now).count()
    println(s"[demo] store flush: $retained rows retained under TTL at $store")

    // 3. the query API
    val paths = MetricsApi.getPaths(spark, dir, "servers.*.u3")
    println(s"[demo] GET /paths servers.*.u3 -> ${paths.map(_.path).mkString(", ")}")
    val resp = MetricsApi.getMetrics(spark, dir, Seq("servers.view.u5"), now - 172800, now)
    val series = resp.series("servers.view.u5")
    println(s"[demo] GET /metrics: step=${resp.step}s slots=${series.size} " +
      s"gaps=${series.count(_.isEmpty)}")
    val (dry, _) = MetricsApi.deleteMetrics(spark, dir,
      Seq("servers.error.u1"), now - 604800, now - 86400, dryRun = true)
    println(s"[demo] DELETE /metrics dry-run: ${dry.totalDeleted} rows would go")

    // 4. the training-data pipeline over documents
    val nearDups = Dedup.minhashLsh(spark, dir).count()
    val sampled = TextOps.sampleStratified(spark, dir).count()
    val bins = TextOps.packSequences(spark, dir).agg(max("bin")).collect().head.getLong(0) + 1
    println(s"[demo] pipeline: $nearDups near-dup pairs, $sampled docs sampled, $bins context bins")

    // 5. pair candidates alone can't be acted on: collapse transitive
    //    chains to one kept doc per cluster, then check the ANN quality
    //    dial the sketches depend on
    val dropped = Dedup.cluster(spark, dir).filter(!col("keep")).count()
    println(s"[demo] dedup_cluster: $dropped docs dropped as transitive near-dups")
    val rec = Similarity.recall(spark, dir).collect()
      .map(r => s"${r.getString(0)}=${r.getDouble(3)}").sorted.mkString(", ")
    println(s"[demo] ann recall@5 vs brute force: $rec")

    spark.stop()
  }
}
