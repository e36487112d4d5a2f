package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.functions.{col, timestamp_seconds, to_date}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rollups
import graft.sources.RollupStore

/** Round-11 gates: the store survives maintenance racing live ingest.
  *
  *  - ADDITIVE swap (r10 advice, medium): a slice appended AFTER a
  *    compactor's staged read used to be silently destroyed when the swap
  *    replaced the whole partition directory; the fold manifest limits the
  *    swap's deletes to exactly the files it folded.
  *  - Lease hardening: the heartbeat survives `setTimes` failure (object
  *    stores without mtime updates) and acquisition is atomic
  *    create-if-absent, so two compactors passing the same young-lease
  *    check resolve to one winner.
  *  - Physical TTL ([[RollupStore.dropExpired]]): the
  *    `default_time_to_live` half of the reference's retention
  *    (datastore/metricmanager.go:166-171) that read-filtering doesn't
  *    cover — whole expired date partitions are deleted, the per-table
  *    boundary day is rewritten exactly, and afterwards the retention
  *    filter has nothing left to remove.
  */
class Round11Spec extends AnyFunSuite with TestSpark {

  private def hfs(store: String): (FileSystem, Path) = {
    val root = new Path(store)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("additive swap: a slice appended after the staged read survives the swap") {
    val store = Files.createTempDirectory("round11_additive").toString
    val (fs, root) = hfs(store)
    val state = Rollups.rollupsMergeable(spark, Sf)
    RollupStore.appendStateSlice(state, store)
    RollupStore.appendStateSlice(state, store)
    // the compactor's staged read: fold the multi-file dirs, commit to _compact
    val multi = fs.globStatus(new Path(root, "tbl=*/stat_date=*")).map(_.getPath)
      .filter(d => fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet")) > 1)
    assert(multi.nonEmpty)
    val folded = multi.flatMap(d =>
      fs.listStatus(d).filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => s"${d.getParent.getName}/${d.getName}/${f.getPath.getName}"))
    Rollups.mergeAll(spark.read.option("basePath", store)
        .parquet(multi.map(_.toString).toIndexedSeq: _*).drop("stat_date"))
      .withColumn("stat_date", to_date(timestamp_seconds(col("stat_time"))))
      .repartition(col("tbl"), col("stat_date"))
      .write.mode("overwrite").partitionBy("tbl", "stat_date")
      .parquet(new Path(root, "_compact").toString)
    // the manifest the compactor records BEFORE staging (its on-disk format
    // is part of the recovery contract: relative paths, one per line)
    val out = fs.create(RollupStore.manifestPath(root), true)
    out.write(folded.mkString("\n").getBytes("UTF-8")); out.close()
    // live ingest lands a THIRD slice mid-compaction — after the staged
    // read, before the swap; pre-manifest this slice was silently deleted
    RollupStore.appendStateSlice(state, store)
    // compactor crashed post-commit pre-swap; recovery (no lease) finishes
    val got = rows(RollupStore.readFinalized(spark, store))
    val want = rows(Rollups.finalize(Rollups.mergeAll(
      state.unionByName(state).unionByName(state))))
    assert(got == want, "mid-compaction appended slice was lost or double-counted by the swap")
    assert(!fs.exists(new Path(root, "_compact")), "staging not drained")
    assert(!fs.exists(RollupStore.manifestPath(root)), "manifest not cleaned up")
    // and the next compact() folds the surviving slice in normally
    RollupStore.compact(spark, store)
    assert(rows(RollupStore.readFinalized(spark, store)) == want)
  }

  test("compact() itself is additive: a slice appended DURING the staged write survives") {
    val store = Files.createTempDirectory("round11_additive2").toString
    val (fs, root) = hfs(store)
    val state = Rollups.rollupsMergeable(spark, Sf).cache()
    RollupStore.appendStateSlice(state, store)
    RollupStore.appendStateSlice(state, store)
    // race a real appender against the real compactor; the additive swap
    // guarantees whichever interleaving the scheduler picks, nothing is
    // lost and nothing double-counts
    val appender = new Thread(() => RollupStore.appendStateSlice(state, store))
    appender.start()
    RollupStore.compact(spark, store)
    appender.join()
    val got = rows(RollupStore.readFinalized(spark, store))
    val want = rows(Rollups.finalize(Rollups.mergeAll(
      state.unionByName(state).unionByName(state))))
    assert(got == want, "append racing compact() lost or doubled rows")
    state.unpersist()
  }

  test("lease acquisition is create-if-absent: exactly one of two compactors wins") {
    val store = Files.createTempDirectory("round11_acquire").toString
    val (fs, root) = hfs(store)
    fs.mkdirs(root)
    assert(RollupStore.acquireLease(fs, root), "first compactor must win the lease")
    assert(!RollupStore.acquireLease(fs, root), "second compactor in the same window must bail")
  }

  test("lease heartbeat survives setTimes failure via delete+recreate") {
    val store = Files.createTempDirectory("round11_heartbeat").toString
    val (fs, root) = hfs(store)
    fs.mkdirs(root)
    // an object store that refuses mtime updates: setTimes always throws
    val noMtime: FileSystem = new FilterFileSystem(fs) {
      override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
        throw new java.io.IOException("mtime updates not supported")
    }
    assert(RollupStore.acquireLease(noMtime, root))
    val before = fs.getFileStatus(new Path(root, "_compact.lease")).getModificationTime
    val hb = RollupStore.startHeartbeat(noMtime, root, leaseMs = 150)
    try {
      Thread.sleep(600)
      val lease = new Path(root, "_compact.lease")
      assert(fs.exists(lease), "heartbeat died and the lease vanished")
      val after = fs.getFileStatus(lease).getModificationTime
      assert(after > before || System.currentTimeMillis() - after < 150,
        s"lease aged out under a failing setTimes (mtime $after, started $before)")
    } finally { hb.interrupt(); fs.delete(new Path(root, "_compact.lease"), false) }
  }

  test("dropExpired: expired partitions physically gone; read == readRetained row-for-row") {
    val store = Files.createTempDirectory("round11_ttl").toString
    val (fs, root) = hfs(store)
    val state = Rollups.rollupsMergeable(spark, Sf)
    RollupStore.appendStateSlice(state, store)
    // "now" two hours past the newest point: the 2h-retention table expires
    // all but its newest sliver, the long-retention tables keep everything
    val now = Rollups.finalize(Rollups.mergeAll(state))
      .agg(org.apache.spark.sql.functions.max("stat_time")).head().getLong(0) + 7200
    val retainedBefore = rows(RollupStore.readRetained(spark, store, now).drop("stat_date"))
    val allBefore = rows(RollupStore.read(spark, store).drop("stat_date"))
    assert(retainedBefore.size < allBefore.size, "fixture must have something to expire")
    RollupStore.dropExpired(spark, store, now)
    assert(rows(RollupStore.readRetained(spark, store, now).drop("stat_date")) == retainedBefore,
      "physical expiry changed what the retention filter returns")
    assert(rows(RollupStore.read(spark, store).drop("stat_date")) == retainedBefore,
      "expired rows still physically present after dropExpired")
    // idempotent: a second pass deletes nothing more
    RollupStore.dropExpired(spark, store, now)
    assert(rows(RollupStore.read(spark, store).drop("stat_date")) == retainedBefore)
  }

  test("dropExpired defers to a live compaction lease, like compact()") {
    val store = Files.createTempDirectory("round11_ttl_lease").toString
    val (fs, root) = hfs(store)
    val state = Rollups.rollupsMergeable(spark, Sf)
    RollupStore.appendStateSlice(state, store)
    val now = Rollups.finalize(Rollups.mergeAll(state))
      .agg(org.apache.spark.sql.functions.max("stat_time")).head().getLong(0) + 7200
    val allBefore = rows(RollupStore.read(spark, store).drop("stat_date"))
    fs.create(new Path(root, "_compact.lease"), true).close()
    RollupStore.dropExpired(spark, store, now) // must be a no-op under the live lease
    assert(rows(spark.read.parquet(store).drop("stat_date")) == allBefore,
      "dropExpired ran maintenance under another writer's live lease")
    fs.delete(new Path(root, "_compact.lease"), false)
    RollupStore.dropExpired(spark, store, now)
    assert(rows(spark.read.parquet(store).drop("stat_date")).size < allBefore.size)
  }

  // --------------------------------------------- peer wire payload (r10 advice)

  test("parseWirePayload: comma-in-value is legal, trailing comma is malformed") {
    import graft.model.PeerList
    assert(PeerList.parseWirePayload("""{"a":"x,y:1","b":"10.0.0.2:2003"}""")
      == Some(Map("a" -> "x,y:1", "b" -> "10.0.0.2:2003")),
      "a comma inside a quoted value must not be read as a pair separator")
    assert(PeerList.parseWirePayload("""{"a":"10.0.0.1:2003",}""").isEmpty,
      "a trailing comma is malformed JSON (String.split used to drop the empty token)")
    assert(PeerList.parseWirePayload("{}") == Some(Map.empty))
    assert(PeerList.parseWirePayload("""{"a":"1" junk}""").isEmpty)
    assert(PeerList.parseWirePayload("""{"a":"1"; "b":"2"}""").isEmpty)
  }

  test("peer_reload derives the ring from entry count, not comma count; empty map = no change") {
    import spark.implicits._
    import graft.operators.Carbon
    val cases = Seq(
      ("""{"a":"10.0.0.1:2003","b":"10.0.0.2:2003"}""", 2),
      ("""{"a":"a,b:1","b":"c:2"}""", 2), // comma-splitting would read 3 peers
      ("{}", Carbon.PeerCount),          // ValidatePeerList rejects empty: ring unchanged
      (null.asInstanceOf[String], Carbon.PeerCount)) // feed with no command at all
    cases.foreach { case (p, want) =>
      val got = Seq(Tuple1(p)).toDF("payload")
        .select(Carbon.newPeersFromPayload(col("payload"))).head().getInt(0)
      assert(got == want, s"payload: $p")
    }
  }

  // ------------------------------------------------- IVF train-once cache

  test("IVF training memoizes per (dir, iters): callers share one trajectory") {
    import graft.operators.Similarity
    val a = Similarity.trainedCents(spark, Sf)
    val b = Similarity.trainedCents(spark, Sf)
    assert(a eq b, "second trainedCents call must return the cached instance")
    val c = Similarity.trainedCentsBalanced(spark, Sf)
    val d = Similarity.trainedCentsBalanced(spark, Sf)
    assert(c eq d, "second trainedCentsBalanced call must return the cached instance")
  }

  // ------------------------------------------------- statsd push emitter

  test("OpsStats.emit pushes every live gauge as a statsd UDP gauge line") {
    import graft.operators.OpsStats
    val sink = new java.net.DatagramSocket(0, java.net.InetAddress.getByName("127.0.0.1"))
    sink.setSoTimeout(5000)
    try {
      val wanted = OpsStats.liveGauges(spark).map(_._1).toSet
      OpsStats.emit(spark, "127.0.0.1", sink.getLocalPort, prefix = "cassabon")
      val gaugeLine = """cassabon\.([a-z_.]+):(-?\d+)\|g""".r
      val got = (1 to wanted.size).map { _ =>
        val buf = new Array[Byte](512)
        val pkt = new java.net.DatagramPacket(buf, buf.length)
        sink.receive(pkt)
        new String(pkt.getData, 0, pkt.getLength, "UTF-8")
      }
      got.foreach(l => assert(gaugeLine.matches(l), s"not a statsd gauge line: $l"))
      assert(got.map { case gaugeLine(n, _) => n }.toSet == wanted,
        "every liveGauges name must arrive exactly once")
    } finally sink.close()
  }
}
