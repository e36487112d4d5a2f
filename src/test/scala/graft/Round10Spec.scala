package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 gates: the events `ts` contract survived the fixture
  * regeneration that turned parquet TIMESTAMP(NANOS) into plain
  * TIMESTAMP(MICROS). `Tables.normalizeTs` is the single adapter back to
  * the epoch-nanosecond bigint every downstream contract assumes
  * (`ts DIV 1e9`, the LAST tiebreak key `ts * 2^24 + event_id`) — these
  * pin its branches and both load paths so the NEXT on-disk flavor change
  * fails here, in one named test, instead of as 26 missing verify keys and
  * three silently-truncated streams (CORRECTNESS_r09).
  */
class Round10Spec extends AnyFunSuite with TestSpark {
  import graft.model.Tables

  test("events.ts loads as epoch-nanosecond bigint from the on-disk fixture") {
    val ev = Tables.events(spark, Sf)
    assert(ev.schema("ts").dataType == LongType)
    val r = ev.agg(min("ts"), max("ts")).head()
    // fixture spans Jan 2024; epoch NANOS of that window. A micros or
    // millis misread (the r9 failure mode: streams saw values 1000x
    // small and watermark-dropped most rows) lands 3-6 orders below.
    assert(r.getLong(0) >= 1704067200L * 1000000000L, s"min ${r.getLong(0)} below 2024-01-01 in nanos")
    assert(r.getLong(1) <= 1706745600L * 1000000000L, s"max ${r.getLong(1)} past 2024-02-01 in nanos")
  }

  test("normalizeTs long branch passes epoch nanos through untouched") {
    import spark.implicits._
    val df = Seq((1704458096789012345L, "a")).toDF("ts", "tag")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.head().getLong(0) == 1704458096789012345L)
  }

  test("normalizeTs NTZ branch is session-timezone independent (UTC wall clock)") {
    import spark.implicits._
    val expected = 1704458096789012000L // 2024-01-05 12:34:56.789012 UTC in nanos
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York", "Asia/Kolkata")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val ntz = Seq("2024-01-05 12:34:56.789012").toDF("s")
          .select(expr("to_timestamp_ntz(s)").as("ts"))
        assert(Tables.normalizeTs(ntz).head().getLong(0) == expected,
          s"NTZ normalization drifted under session tz $tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("normalizeTs LTZ branch converts the absolute instant") {
    import spark.implicits._
    val ltz = Seq("2024-01-05 12:34:56.789012").toDF("s")
      .select(to_timestamp(col("s")).as("ts")) // session tz is UTC in specs
    assert(Tables.normalizeTs(ltz).head().getLong(0) == 1704458096789012000L)
  }

  test("eventsStream carries the same nanos ts contract as the batch loader") {
    val st = graft.streaming.CarbonStream.eventsStream(spark, Sf)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == LongType)
    assert(st.schema.fieldNames.sameElements(Tables.events(spark, Sf).schema.fieldNames))
  }

  // ------------------------------------------------- peer wire commands

  test("carbon wire: peer commands classify as commands, not failed metrics") {
    import spark.implicits._
    val parsed = graft.operators.Carbon.withParsedLine(Seq(
      """<<peerlist={"h:1":"1"}>>""", // a peer command (carbon_plaintext.go:30 regex)
      "<<PEERLIST=x>>",               // uppercase: [a-z]+ does NOT match -> malformed metric
      """ <<peerlist={}>>""",         // leading blank: the RAW line is matched, no trim -> malformed
      "a.b 1.0 100").toDF("line"), "line")
      .select("line", "peer_cmd", "valid").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(parsed("""<<peerlist={"h:1":"1"}>>""") == (("peerlist", false)))
    assert(parsed("<<PEERLIST=x>>") == (("", false)))
    assert(parsed(""" <<peerlist={}>>""") == (("", false)))
    assert(parsed("a.b 1.0 100") == (("", true)))
  }

  // ------------------------------------------------- peer-list front door

  test("PeerList.validate mirrors ValidatePeerList's edges") {
    import graft.model.PeerList
    val good = Map("a" -> "10.0.0.1:2003", "b" -> "10.0.0.2:2003")
    // empty list rejected (config_parser.go:172-174)
    assert(PeerList.validate("10.0.0.1:2003", Map.empty) == Left("No peers in peer list"))
    // every VALUE must be tcp4 host:port (175-179)
    assert(PeerList.validate("10.0.0.1:2003", good + ("c" -> "10.0.0.3")).isLeft)   // no port
    assert(PeerList.validate("10.0.0.1:2003", good + ("c" -> "10.0.0.3:99999")).isLeft) // port range
    assert(PeerList.validate("10.0.0.1:2003", good + ("c" -> "300.0.0.1:2003")).isLeft) // octet range
    // the local address must be IN the list (183-185)
    assert(PeerList.validate("10.0.0.9:2003", good).isLeft)
    assert(PeerList.validate("10.0.0.1:2003", good) == Right(()))
    // hostnames accepted syntactically (documented offline deviation)
    assert(PeerList.validate("peer-1.internal:2003",
      Map("a" -> "peer-1.internal:2003")) == Right(()))
    // the fixture's wire payload parses and validates as peer 'a'
    val wire = PeerList.parseWirePayload(graft.operators.Carbon.PeerlistWirePayload)
    assert(wire.contains(Map("a" -> "10.0.0.1:2003", "b" -> "10.0.0.2:2003")))
    assert(PeerList.validate("10.0.0.1:2003", wire.get) == Right(()))
    assert(PeerList.parseWirePayload("not json").isEmpty)
    assert(PeerList.parseWirePayload("{}").contains(Map.empty[String, String]))
  }

  // ------------------------------------------------- live HTTP serving

  test("HTTP server: the daemon's six routes serve live over real sockets") {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val srv = new graft.api.MetricsHttpServer(spark, Sf)
    val port = srv.start()
    val http = HttpClient.newHttpClient()
    def req(method: String, pathAndQuery: String): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$pathAndQuery"))
          .method(method, HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // GET / — the info document shape (message/github/version)
      val root = req("GET", "/")
      assert(root.statusCode() == 200 && root.body().contains("\"version\""))
      // GET /healthcheck — plain-text liveness
      assert(req("GET", "/healthcheck").body() == "ALIVE")
      // GET /paths?query= — same rows as the library call, as JSON
      val glob = graft.operators.Index.GlobQuery
      val paths = req("GET", s"/paths?query=$glob")
      val viaApi = graft.api.MetricsApi.getPaths(spark, Sf, glob)
      assert(paths.statusCode() == 200)
      assert("\"path\"".r.findAllIn(paths.body()).size == viaApi.size)
      assert(viaApi.forall(e => paths.body().contains("\"" + e.path + "\"")))
      // &tenant= opts into tenant-scoped execution; a wrong tenant sees nothing
      assert(req("GET", s"/paths?query=$glob&tenant=servers").body() == paths.body())
      assert(req("GET", s"/paths?query=$glob&tenant=acme").body() == "[]")
      // GET /metrics — series on the step grid for two fixture paths
      val ps = viaApi.take(2).map(e => s"path=${e.path}").mkString("&")
      val m = req("GET", s"/metrics?$ps&from=1704067200&to=1704070800")
      assert(m.statusCode() == 200)
      assert(m.body().contains("\"step\":") && m.body().contains("\"series\":"))
      // DELETE /metrics — dry-run by DEFAULT, totals match the library
      val del = req("DELETE", s"/metrics?${ps}&from=1704067200&to=1704070800")
      assert(del.statusCode() == 200 && del.body().contains("\"dryrun\":true"))
      val (resp, _) = graft.api.MetricsApi.deleteMetrics(spark, Sf,
        viaApi.take(2).map(_.path), 1704067200L, 1704070800L, dryRun = true)
      assert(del.body().contains(s""""total_deleted":${resp.totalDeleted}"""))
      // DELETE /paths — orphan-prune rebuild, remaining count matches index_delete
      val dp = req("DELETE", s"/paths?query=${graft.operators.Index.DeleteGlob}")
      assert(dp.statusCode() == 200)
      assert(dp.body() ==
        s"""{"remaining_nodes":${graft.operators.Index.delete(spark, Sf).count()}}""")
      // anything else — the 404 handler
      assert(req("GET", "/nope").statusCode() == 404)
    } finally srv.stop()
  }

  // ------------------------------------------------- self-telemetry

  test("runtime_stats: live gauges speak stats.go's vocabulary; the ledger matches its subsystems") {
    import graft.operators.{Index, OpsStats, Rollups}
    val g = OpsStats.liveGauges(spark).toMap
    assert(g.keySet == Set("goroutines", "executors", "memory.alloc",
      "memory.heap.size", "memory.heap.in_use", "memory.heap.idle",
      "memory.sys", "memory.gc", "memory.gc_pause"))
    assert(g("goroutines") > 0 && g("executors") > 0)
    assert(g("memory.alloc") > 0 && g("memory.alloc") <= g("memory.heap.size"))
    assert(g.values.forall(_ >= 0L))
    val led = OpsStats.runtimeStats(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(led("points.received") == Tables.metrics(spark, Sf).count())
    assert(led("index.nodes") == Index.build(spark, Sf).count())
    assert(led("index.leaves") ==
      Index.build(spark, Sf).filter(col("leaf")).count())
    assert(led("rollup.windows") == Rollups.rollups(spark, Sf).count())
    assert(led("rollup.tables") == graft.model.RollupConfig.tables.size.toLong)
  }

  // ------------------------------------------------- multi-tenant index

  test("index tenants: nodes carry their namespace tenant; glob and delete are tenant-scoped") {
    import spark.implicits._
    import graft.operators.Index
    val paths = Seq(
      "acme.error.u3", "acme.click.u3",
      "globex.error.u3", "globex.error.u7").toDF("path")
    val idx = Index.indexFrom(paths)
    // every node is tagged with its top-level segment, including the
    // depth-1 tenant roots themselves
    assert(idx.filter($"tenant" === "acme").count() == 5)   // acme, acme.error, acme.click, 2 leaves
    assert(idx.filter($"tenant" === "globex").count() == 4) // globex, globex.error, 2 leaves
    // a wildcard-first-segment glob would lexically match BOTH tenants'
    // nodes — scoping to the querying tenant must keep it inside acme
    val g = Index.globNodes(idx, "*.error.u3", "acme").collect()
    assert(g.map(_.getString(0)).sameElements(Array("acme.error.u3")), g.mkString(","))
    // acme's delete of *.error.* reaches only acme's namespace: globex's
    // identical sub-paths survive, acme's orphaned prefix disappears,
    // acme's root survives via its remaining click path
    val d = Index.deleteFrom(paths, "*.error.*", "acme")
    assert(d.filter($"node" === "acme.error.u3").count() == 0)
    assert(d.filter($"node" === "acme.error").count() == 0, "orphaned prefix survived the delete")
    assert(d.filter($"node" === "acme").count() == 1)
    assert(d.filter($"tenant" === "globex").count() == 4, "delete leaked into another tenant")
  }

  // ------------------------------------------------- compaction lease
  // r8 advice item 6: before the lease, a reader racing an in-progress
  // compact() observed `_compact` without `_SUCCESS` and DELETED the
  // compactor's in-flight staged write (recover() treated in-flight and
  // crashed identically). The lease distinguishes them by age.

  private def ageOutLease(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit =
    fs.setTimes(new org.apache.hadoop.fs.Path(root, "_compact.lease"),
      System.currentTimeMillis() - graft.sources.RollupStore.CompactLeaseMs - 1000, -1)

  test("compaction lease: concurrent reads leave an in-flight uncommitted _compact alone") {
    import graft.operators.Rollups
    import graft.sources.RollupStore
    import org.apache.hadoop.fs.Path
    val store = java.nio.file.Files.createTempDirectory("round10_lease").toString
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = Rollups.rollupsMergeable(spark, Sf)
    RollupStore.appendStateSlice(state, store)
    RollupStore.appendStateSlice(state, store)
    val want = Rollups.finalize(Rollups.mergeAll(state.unionByName(state)))
      .collect().map(_.toString).sorted
    // a live compactor mid-staged-write: partial _compact, no _SUCCESS, fresh lease
    val staged = new Path(root, "_compact")
    val partial = new Path(staged, "tbl=rollup_000007200/stat_date=2024-01-05")
    fs.mkdirs(partial)
    fs.createNewFile(new Path(partial, "part-inflight.parquet"))
    fs.create(new Path(root, "_compact.lease"), true).close()
    // concurrent reader: correct answer off the un-swapped store, staged SURVIVES
    assert(RollupStore.readFinalized(spark, store)
      .collect().map(_.toString).sorted.sameElements(want))
    assert(fs.exists(staged), "reader discarded the live compactor's staged write")
    // concurrent second compactor: bails out instead of racing the swap
    RollupStore.compact(spark, store)
    assert(fs.exists(staged), "second compactor raced a live lease")
    // the compactor dies without committing: lease ages out, next read heals
    ageOutLease(fs, root)
    assert(RollupStore.readFinalized(spark, store)
      .collect().map(_.toString).sorted.sameElements(want))
    assert(!fs.exists(staged), "stale uncommitted staging not discarded")
    assert(!fs.exists(new Path(root, "_compact.lease")), "orphan lease not cleared")
  }

  test("compaction lease: committed staged write defers to the live compactor, then finishes") {
    import graft.operators.Rollups
    import graft.sources.RollupStore
    import org.apache.spark.sql.functions.{col, timestamp_seconds, to_date}
    import org.apache.hadoop.fs.Path
    val store = java.nio.file.Files.createTempDirectory("round10_lease2").toString
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = Rollups.rollupsMergeable(spark, Sf)
    RollupStore.appendStateSlice(state, store)
    RollupStore.appendStateSlice(state, store)
    val want = Rollups.finalize(Rollups.mergeAll(state.unionByName(state)))
      .collect().map(_.toString).sorted
    // commit a real staged compaction (the writer shape compact() uses),
    // with the compactor still holding a fresh lease, not yet swapped in
    val staged = new Path(root, "_compact")
    val multi = fs.globStatus(new Path(root, "tbl=*/stat_date=*")).map(_.getPath)
      .filter(d => fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet")) > 1)
    assert(multi.nonEmpty)
    Rollups.mergeAll(spark.read.option("basePath", store)
        .parquet(multi.map(_.toString).toIndexedSeq: _*).drop("stat_date"))
      .withColumn("stat_date", to_date(timestamp_seconds(col("stat_time"))))
      .repartition(col("tbl"), col("stat_date"))
      .write.mode("overwrite").partitionBy("tbl", "stat_date")
      .parquet(staged.toString)
    assert(fs.exists(new Path(staged, "_SUCCESS")))
    fs.create(new Path(root, "_compact.lease"), true).close()
    // a reader while the lease is live must NOT run the swap under the
    // compactor's feet — and still answers correctly off the sources
    assert(RollupStore.readFinalized(spark, store)
      .collect().map(_.toString).sorted.sameElements(want))
    assert(fs.exists(staged), "reader swapped in a live compactor's staging")
    // compactor dies post-commit pre-swap: stale lease, recovery finishes it
    ageOutLease(fs, root)
    assert(RollupStore.readFinalized(spark, store)
      .collect().map(_.toString).sorted.sameElements(want))
    assert(!fs.exists(staged), "committed staging not swapped in after lease expiry")
    assert(!fs.exists(new Path(root, "_compact.lease")))
    // post-swap store is compacted: every directory is back to one file
    val remaining = fs.globStatus(new Path(root, "tbl=*/stat_date=*")).map(_.getPath)
      .filter(d => fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet")) > 1)
    assert(remaining.isEmpty, "swap finished but slices were not folded")
  }
}
