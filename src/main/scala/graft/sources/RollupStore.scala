package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.RollupConfig

/** The storage mapping for cassabon's Cassandra backend: one logical table
  * per retention (`rollup_%09d`, reference datastore/metricmanager.go:155-171)
  * becomes a partition of ONE parquet dataset, sub-partitioned by stat date:
  *
  *   /store/tbl=rollup_000007200/stat_date=2024-01-05/part-*.parquet
  *
  * Cassandra's `default_time_to_live` maps to a partition-prune filter:
  * expired data is never read (and at scale is dropped by deleting whole
  * date partitions — no tombstones, no compaction debt). Both `tbl` and
  * `stat_date` are partition columns, so retention filters resolve at file
  * listing, before any I/O.
  */
object RollupStore {

  /** Persist a rollup write set (tbl, path, stat_time, stat), partitioned
    * for prune-friendly reads. `maxRecordsPerFile` guards against giant
    * files on 1000-executor writes; dynamic overwrite only replaces the
    * partitions present in this batch (the streaming flush contract).
    */
  def write(rollups: DataFrame, path: String): Unit = {
    recoverIfNeeded(rollups.sparkSession, path)
    rollups
      .withColumn("stat_date", to_date(timestamp_seconds(col("stat_time"))))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tbl", "stat_date")
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    recoverIfNeeded(spark, path)
    spark.read.parquet(path)
  }

  /** Append one flush cycle's MERGEABLE rollup state (see
    * `Rollups.mergeableFrom`) into the same partition layout — the
    * streaming-flush write path (`CarbonStream.streamRollupsToStore`).
    * Append-only: collisions between cycles are resolved by the
    * associative merge at read ([[readFinalized]]) or by a compaction
    * rewrite, never by read-modify-write during ingest.
    *
    * Rows are clustered onto their `(tbl, stat_date)` partition before
    * the write: without it every hash-partitioned task scatters a few
    * rows into EVERY partition directory, so each flush commits
    * tasks × directories tiny files and every later read/compaction pays
    * the listing+open cost. One file per directory per slice is the
    * right shape for state slices at any scale — a slice's rows per
    * (tbl, date) are bounded by |paths| × windows/day, not by the point
    * count, and `maxRecordsPerFile` still splits a pathological
    * directory. (What this does NOT remove is the per-directory writer
    * open/commit cost itself — a flush's wall time scales with how many
    * partitions it touches, which is why flush cycles should be
    * time-contiguous; see `Rollups.storeLifecycle`.)
    */
  def appendStateSlice(state: DataFrame, path: String): Unit = {
    recoverIfNeeded(state.sparkSession, path)
    state
      .withColumn("stat_date", to_date(timestamp_seconds(col("stat_time"))))
      .repartition(col("tbl"), col("stat_date"))
      .write
      .mode("append")
      .option("maxRecordsPerFile", 5000000)
      .partitionBy("tbl", "stat_date")
      .parquet(path)
  }

  /** Merge-on-read over an append-only state store: collapse all flush
    * cycles' slices and finalize to (tbl, path, stat_time, stat) — by the
    * associativity of the state algebra, equal to a single batch pass over
    * the raw points no matter how ingest was sliced.
    */
  def readFinalized(spark: SparkSession, path: String): DataFrame =
    graft.operators.Rollups.finalize(
      graft.operators.Rollups.mergeAll(
        read(spark, path).drop("stat_date")))

  /** Compaction: fold each key's accumulated slices to ONE row — the
    * same associative `mergeAll` the reader applies, run once so
    * subsequent reads don't re-pay it. State stays MERGEABLE (compaction
    * is lossless re-slicing, not finalization), so ingest can keep
    * appending afterwards and [[readFinalized]] is unchanged before,
    * during intent, and after.
    *
    * SELECTIVE per-partition: because every flush is one merged file per
    * `(tbl, stat_date)` directory ([[appendStateSlice]]), a directory
    * with a single file is already one-row-per-key — only MULTI-file
    * directories (ones several flush cycles landed in) are read and
    * rewritten; the rest of the store is never touched. That is the
    * behind-the-ingest-frontier maintenance pass at 100 TB: work scales
    * with the partitions recent flushes touched, not with store size —
    * cassabon leans on Cassandra compaction for exactly this (upsert
    * columns collapse in SSTable merges); here it's explicit and
    * schedulable. The rewrite stages through `_compact` + renames
    * because a write READING FROM the partitions being replaced would
    * race its own file listing; each directory is swapped (delete +
    * rename) individually AFTER the staged write is fully committed, so
    * a crash exposes at most the ONE directory mid-swap — and the next
    * `compact()` SELF-HEALS via [[recover]]: `_compact/_SUCCESS` present
    * means the staged copies are committed truth, so the remaining ones
    * (renames remove staged dirs as they land, so what's left is exactly
    * what hasn't been swapped) are swapped in before anything else;
    * `_SUCCESS` absent means the staged WRITE itself crashed, the source
    * directories are untouched, and the garbage is dropped.
    */
  /** How long a compaction lease protects an in-flight `_compact` from
    * concurrent recovery. A LIVE compactor finishes a staged write well
    * inside this window; a lease older than it is a crashed compactor's
    * orphan and recovery may take over. Tests override via the `leaseMs`
    * parameters.
    */
  val CompactLeaseMs: Long = 15L * 60 * 1000

  private def leasePath(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_compact.lease") // '_' prefix: invisible to parquet listing

  private def leaseIsYoung(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path,
                           leaseMs: Long): Boolean = {
    val l = leasePath(root)
    try fs.exists(l) &&
      System.currentTimeMillis() - fs.getFileStatus(l).getModificationTime < leaseMs
    catch { case _: java.io.FileNotFoundException => false } // lost exists/stat race
  }

  def compact(spark: SparkSession, path: String): Unit =
    compact(spark, path, CompactLeaseMs)

  private[graft] def compact(spark: SparkSession, path: String, leaseMs: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return // never-written store: nothing to fold
    val staged = new org.apache.hadoop.fs.Path(root, "_compact")
    // another compactor's lease is live: skip this pass rather than race
    // its staged write / swap. (The store stays correct un-compacted —
    // compaction is lossless re-slicing, so "later" is always safe.)
    if (leaseIsYoung(fs, root, leaseMs)) return
    recover(fs, root, staged, leaseMs)
    def parquets(d: org.apache.hadoop.fs.Path) =
      fs.listStatus(d).filter(_.getPath.getName.endsWith(".parquet"))
    val multi = Option(fs
        .globStatus(new org.apache.hadoop.fs.Path(root, "tbl=*/stat_date=*")))
      .getOrElse(Array.empty)
      .map(_.getPath)
      .filter(d => parquets(d).length > 1)
    if (multi.isEmpty) return
    // take the lease BEFORE the staged write so every other entry point's
    // recovery leaves the in-flight _compact alone until we finish or die —
    // and HEARTBEAT it while the write runs: a staged write's duration is
    // unbounded by store size, so a once-written lease would silently age
    // out mid-flight on a big compaction and hand the hazard right back.
    // The heartbeat dies with the process (daemon thread), so a crashed
    // compactor's lease stops refreshing and ages out as intended.
    fs.create(leasePath(root), true).close()
    val heartbeat = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(math.max(leaseMs / 3, 1L))
        fs.setTimes(leasePath(root), System.currentTimeMillis(), -1)
      } catch { case _: InterruptedException => () }
    }, "graft-compact-lease-heartbeat")
    heartbeat.setDaemon(true)
    heartbeat.start()
    try {
      graft.operators.Rollups.mergeAll(
          spark.read.option("basePath", path)
            .parquet(multi.map(_.toString).toIndexedSeq: _*)
            .drop("stat_date"))
        .withColumn("stat_date", to_date(timestamp_seconds(col("stat_time"))))
        .repartition(col("tbl"), col("stat_date")) // one file per directory
        .write.mode("overwrite").option("maxRecordsPerFile", 5000000)
        .partitionBy("tbl", "stat_date").parquet(staged.toString)
      swapIn(fs, root, staged)
    } finally {
      heartbeat.interrupt()
      fs.delete(leasePath(root), false)
    }
  }

  /** Swap every staged partition directory into place, one delete+rename
    * at a time — the crash-vulnerable window is a single directory, never
    * the store — then drop the staging root.
    *
    * CONCURRENCY CONTRACT: one maintenance writer at a time, now ENFORCED
    * by the compaction lease rather than merely documented — readers and
    * appenders racing an in-progress `compact` skip recovery while the
    * lease is young (see [[recover]]), and a second `compact` bails out on
    * a live lease instead of double-swapping. What the lease does NOT
    * cover is two compactors starting inside the same lease-check window
    * (no atomic create-if-absent on every Hadoop fs) — run compaction from
    * one scheduled maintenance job (the cassabon model: one metricmanager
    * owns the store, datastore/metricmanager.go:127-180). Ingest itself is
    * safe because every entry point serializes through recovery BEFORE
    * touching files and flush cycles come from one streaming query. Each
    * rename/delete below is checked so a lost race (or a filesystem
    * refusing the swap) fails LOUDLY instead of silently dropping a
    * partition directory.
    */
  private[graft] def swapIn(fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path,
                            staged: org.apache.hadoop.fs.Path): Unit = {
    fs.listStatus(staged).filter(_.getPath.getName.startsWith("tbl="))
      .foreach { t =>
        val destTbl = new org.apache.hadoop.fs.Path(root, t.getPath.getName)
        require(fs.mkdirs(destTbl) || fs.exists(destTbl),
          s"compact swap: cannot create $destTbl")
        fs.listStatus(t.getPath).foreach { d =>
          val dest = new org.apache.hadoop.fs.Path(destTbl, d.getPath.getName)
          if (fs.exists(dest))
            require(fs.delete(dest, true), s"compact swap: cannot delete $dest")
          require(fs.rename(d.getPath, dest),
            s"compact swap: rename ${d.getPath} -> $dest failed (concurrent writer?)")
        }
      }
    require(fs.delete(staged, true),
      s"compact swap: cannot drop staging root $staged")
  }

  /** Finish (committed staged write → swap the leftovers in) or discard
    * (uncommitted → sources untouched, drop the garbage) a compaction a
    * crash interrupted. Idempotent; no-op when `_compact` is absent.
    *
    * LEASE GUARD (closes the r7/r8 concurrent-recover hazard): a `_compact`
    * younger than the compactor's lease is an IN-FLIGHT compaction, not a
    * crash — recovery leaves it (and the lease) completely alone. Reads
    * stay correct against the un-swapped store (merge-on-read folds the
    * very duplicates compaction would have folded), and the live compactor
    * swaps in when its staged write commits. Only once the lease has aged
    * out does recovery treat `_compact` as crash debt: finish it if
    * `_SUCCESS` committed, discard it otherwise, and clear the orphan
    * lease either way.
    */
  private[graft] def recover(fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path,
                             staged: org.apache.hadoop.fs.Path,
                             leaseMs: Long = CompactLeaseMs): Unit =
    if (!leaseIsYoung(fs, root, leaseMs)) {
      if (fs.exists(staged)) {
        // re-check the lease IMMEDIATELY before acting: a compactor may
        // have taken it between our first check and the exists() above
        // (this host's documented steal spikes can park a thread for
        // many seconds) — the destructive branch must see a fresh view
        if (leaseIsYoung(fs, root, leaseMs)) return
        if (fs.exists(new org.apache.hadoop.fs.Path(staged, "_SUCCESS")))
          swapIn(fs, root, staged)
        else fs.delete(staged, true)
      }
      fs.delete(leasePath(root), false) // clear a stale orphan lease, if any
    }

  /** EVERY public entry point recovers before touching the store, not just
    * `compact()`. Two failure modes this closes (both real data loss):
    * a crash mid-swap leaves one partition's dest dir deleted with its
    * staged replacement not yet renamed in — a read that skipped recovery
    * would silently return a store missing that partition's rows; and an
    * `appendStateSlice` that landed a fresh slice in such a partition
    * BEFORE the next compact would have that slice deleted when recover's
    * swapIn later replaced the whole directory. Recovering first means no
    * slice can ever land in (and no read can ever observe) a half-swapped
    * store. Cost when healthy: one `exists` on `_compact`, nothing else.
    */
  private def recoverIfNeeded(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      recover(fs, root, new org.apache.hadoop.fs.Path(root, "_compact"))
  }

  /** TTL-enforced read: each table only yields rows newer than its
    * retention, with the cutoff expressed on the PARTITION columns so the
    * planner prunes expired directories at listing time
    * (`.explain` shows them in PartitionFilters, not PushedFilters).
    */
  def readRetained(spark: SparkSession, path: String, nowSec: Long): DataFrame = {
    val keep = RollupConfig.tables.map { t =>
      val retention = RollupConfig.reference.flatMap(_.windows)
        .find(_.table == t).get.retentionSec
      val cutoff = java.time.LocalDate.ofInstant(
        java.time.Instant.ofEpochSecond(nowSec - retention),
        java.time.ZoneOffset.UTC)
      col("tbl") === t && col("stat_date") >= lit(cutoff.toString).cast("date")
    }.reduce(_ || _)
    read(spark, path).filter(keep).filter(col("stat_time") > {
      // exact row-level TTL on top of the coarse partition prune
      val retentionOf = RollupConfig.tables.foldLeft(lit(0L)) { (acc, t) =>
        when(col("tbl") === t,
          RollupConfig.reference.flatMap(_.windows).find(_.table == t).get.retentionSec)
          .otherwise(acc)
      }
      lit(nowSec) - retentionOf
    })
  }
}
