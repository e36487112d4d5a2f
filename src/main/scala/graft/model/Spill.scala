package graft.model

import org.apache.spark.sql.SparkSession

/** Durable spill locations for operators that must park an intermediate
  * result outside Spark's block manager (e.g. dedup_cluster's converged
  * label table, which outlives the checkpoint sweep that frees the
  * iteration's RDDs).
  *
  * Why not a `java.nio.file` temp directory: a driver-local temp path is
  * only correct in `local[*]` — on a real cluster each executor
  * commits its task files to its OWN local disk and a read-back sees an
  * incomplete dataset (silent row loss). Spill paths must live on storage
  * every executor shares, exactly like `sparkContext.setCheckpointDir`.
  *
  * Resolution order:
  *   1. `spark.graft.spillDir` — set this to a shared filesystem/object
  *      store path (`hdfs://…`, `s3a://…`) on a real deployment;
  *   2. default: `<spark.sql.warehouse.dir>/graft_spill` — the warehouse
  *      dir is already required to be shared storage for any multi-node
  *      Spark SQL deployment, so the default inherits that guarantee.
  *
  * GC contract: each call returns a per-(tag, input) path that the writer
  * overwrites (`mode("overwrite")`), so repeated runs occupy ONE copy per
  * distinct input — growth is bounded by the operator × dataset product,
  * and `rm -r <spillRoot>` at any quiet moment reclaims everything without
  * breaking future runs. Concurrent runs of the SAME operator on the SAME
  * input would race on the overwrite; callers that need that run benched
  * fixtures on distinct inputs instead.
  */
object Spill {
  val SpillDirConf = "spark.graft.spillDir"

  /** Shared-storage spill directory for `tag` over input `dir`. */
  def path(spark: SparkSession, tag: String, dir: String): String = {
    val root = spark.conf.getOption(SpillDirConf)
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/graft_spill")
    val inputKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"$root/${tag}_$inputKey"
  }
}
