package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Multi-JVM smoke: run `dedup_cluster` under `local-cluster[2,2,1024]` —
  * real standalone workers whose executors are FORKED JVMs with their own
  * working directories — and require bit-identical labels vs the
  * single-JVM run. This is the mechanical check for the r5 verdict's one
  * `weak` finding: operator state parked on a driver-local path only
  * provably breaks when executors stop sharing the driver's filesystem
  * view, which `local[n]` can never exercise. `runMain graft.ClusterSmoke
  * [sfDir]`; exits nonzero on any mismatch.
  *
  * Executors know nothing of sbt's classpath, so the current JVM's
  * classpath is handed to them via `spark.executor.extraClassPath`.
  * Sessions run SEQUENTIALLY (one SparkContext per JVM).
  */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")

    def labels(spark: SparkSession)
        : (Set[(Long, Long, Long, Boolean)], Seq[(Int, String, String, Long)],
           Set[(String, Long, Int, Long, Long, Double)],
           Set[(String, Long, Long, Double, Long, Double)],
           Set[(Long, Long, Option[Long], Boolean)],
           Set[(Long, String, Double, Long, Double, Boolean)],
           Set[(Long, Long)],
           Set[(Long, Long, Int, Double)],
           Set[(Long, Long, Int, Double)]) =
      try {
        val lbl = graft.operators.Dedup.cluster(spark, sf)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .toSet
        // bpe_train's driver loop (per-round 1-row TakeOrdered collects)
        // is the other driver-resident path; its merge trajectory must be
        // bit-stable under forked executors too
        graft.operators.Bpe.clearMergeCache()
        val merges = graft.operators.Bpe.trainedMerges(spark, sf)
        // mix_rebalance's config-sized rate-frame pin is the third
        // driver-resident path (eager collect -> local frame); its rates
        // and kept counts must be identical under forked executors
        val mix = graft.operators.TextOps.mixRebalance(spark, sf)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
            r.getLong(4), r.getDouble(5)))
          .toSet
        // mix_temperature shares the eager-collect rate-frame pattern; its
        // sqrt-law rates and salted-hash kept counts must match too
        val temp = graft.operators.TextOps.mixTemperature(spark, sf)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getLong(4), r.getDouble(5)))
          .toSet
        // dedup_semantic's cell assignment rides a broadcast centroid frame
        // + max_by argmax; its keep/drop verdicts must be bit-stable under
        // forked executors (broadcast serialization path)
        val sem = graft.operators.Similarity.semanticDedup(spark, sf)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
          .toSet
        // quality_select's cut pairs come off a distributed RANGE sort
        // (withGlobalRank) and an eager |langs|-row collect — the r12
        // driver-resident path; verdicts must be bit-stable under forked
        // executors (range-partition sampling runs ON the executors)
        val qs = graft.operators.TextOps.qualitySelect(spark, sf)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
            r.getLong(3), r.getDouble(4), r.getBoolean(5)))
          .toSet
        // knn_graph_refined rides the r13 per-round Spill gate (every
        // NN-Descent round writes/reads shared storage) — its degrees
        // must be bit-stable when the spill I/O runs on forked executors
        val kg = graft.operators.Similarity.knnGraphRefined(spark, sf)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toSet
        // ann_ivf_stored writes the partitioned index through the shared
        // spill root and reads it back partition-pruned — the write/read
        // cycle must be bit-stable when executor tasks commit the files
        // from forked JVMs (r14)
        val stored = graft.operators.Similarity.ivfStored(spark, sf)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSet
        // ann_ivf_stored_live runs the store MAINTENANCE machinery
        // (append-only flush slices, compaction lease + manifest +
        // additive swap, fold) with every file committed by forked-
        // executor tasks — the distributed form of Round15Spec's
        // lifecycle; its probe must stay bit-identical to the write-once
        // stored index (same quantizer, append-order-immune algebra)
        val live = graft.operators.Similarity.ivfStoredLive(spark, sf)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSet
        (lbl, merges, mix, temp, sem, qs, kg, stored, live)
      } finally spark.stop()

    def builder(master: String) = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

    val (expected, expectedMerges, expectedMix, expectedTemp, expectedSem,
      expectedQs, expectedKg, expectedStored, expectedLive) =
      labels(builder("local[2]").getOrCreate())

    val spillRoot = Files.createTempDirectory("cluster_smoke_spill").toString
    val (clustered, clusterMerges, clusterMix, clusterTemp, clusterSem,
      clusterQs, clusterKg, clusterStored, clusterLive) = labels(
      builder("local-cluster[2,2,1024]")
        .appName("graft-cluster-smoke")
        .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
        .config("spark.graft.spillDir", spillRoot)
        .getOrCreate())

    val spills = Files.list(Paths.get(spillRoot)).iterator().asScala.toSeq
    require(spills.exists(_.getFileName.toString.startsWith("cc_labels_")),
      s"no cc_labels_* spill under the shared $spillRoot: $spills")
    require(expected.nonEmpty && expected.exists(!_._4),
      "fixture must drop at least one transitive near-dup")
    require(clustered == expected,
      s"multi-JVM labels diverge: ${(clustered diff expected).take(5)} vs " +
        s"${(expected diff clustered).take(5)}")
    require(expectedMerges.nonEmpty && clusterMerges == expectedMerges,
      s"multi-JVM BPE merge trajectory diverges: $clusterMerges vs $expectedMerges")
    require(expectedMix.nonEmpty && clusterMix == expectedMix,
      s"multi-JVM mix_rebalance diverges: $clusterMix vs $expectedMix")
    require(expectedTemp.nonEmpty && clusterTemp == expectedTemp,
      s"multi-JVM mix_temperature diverges: $clusterTemp vs $expectedTemp")
    require(expectedSem.exists(!_._4) && clusterSem == expectedSem,
      s"multi-JVM dedup_semantic diverges: ${(clusterSem diff expectedSem).take(5)}")
    require(expectedQs.exists(_._6) && expectedQs.exists(!_._6) &&
      clusterQs == expectedQs,
      s"multi-JVM quality_select diverges: ${(clusterQs diff expectedQs).take(5)}")
    require(expectedKg.exists(_._2 > 0L) && clusterKg == expectedKg,
      s"multi-JVM knn_graph_refined diverges: ${(clusterKg diff expectedKg).take(5)}")
    require(expectedStored.nonEmpty && clusterStored == expectedStored,
      s"multi-JVM ann_ivf_stored diverges: ${(clusterStored diff expectedStored).take(5)}")
    require(expectedLive == expectedStored,
      "live-maintained index diverged from the write-once build in ONE JVM")
    require(clusterLive == expectedStored,
      s"multi-JVM live-store maintenance diverges: ${(clusterLive diff expectedStored).take(5)}")
    // the marker ClusterSmokeSpec greps for
    println(s"CLUSTER_SMOKE_OK rows=${expected.size} " +
      s"dropped=${expected.count(!_._4)} merges=${expectedMerges.size} spill=$spillRoot")
  }
}
