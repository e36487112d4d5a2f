package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 gates: the float-portability sweep the r12 verdict mandated.
  *
  *  1. The failure class that made `series_linreg`/`stream_linreg`
  *     driver-red: `round(CAST(wide AS DOUBLE) / …, 6)` where `wide` is a
  *     HUGEINT/decimal(38) value past 2^53 — the narrowing conversion and
  *     the round() are ENGINE-IMPLEMENTED there, so one ULP of difference
  *     between DuckDB builds flips the compare hash. The scan walks every
  *     registered oracle (the SQL mirrors the Spark algebra by contract)
  *     and bans wide-int SQL from co-occurring with a double cast unless
  *     the key is in an audited allowlist (empty today: every wide-int
  *     oracle — anomaly's z² comparison, linreg's micro-units, Pearson's
  *     pack — stays integer end-to-end).
  *  2. linreg's quotient/remainder micro-split must truncate toward zero
  *     on NEGATIVE slopes with both terms sharing a sign (the property
  *     that makes the two-term sum equal the true truncated quotient in
  *     both engines).
  *  3. `transitionsMachine` must reject an event whose key EQUALS the
  *     high-water mark (duplicate redelivery) — accepting it would emit an
  *     extra pair and diverge from batch lag semantics (packMachine's
  *     stricter guard, now shared).
  */
class Round13Spec extends AnyFunSuite with TestSpark {

  // -------------------------------------------- wide-int → double oracle ban

  /** Keys audited as safe despite combining wide-int SQL with a double
    * cast. Empty: no registered oracle may narrow a HUGEINT/decimal(38)
    * value to double — emit integer fixed-point (micro-units, the
    * knn_pagerank ppm pattern) instead.
    */
  private val WideDoubleAllowlist: Set[String] = Set.empty

  test("no oracle narrows HUGEINT/decimal(38) to double") {
    val offenders = Registry.ops.flatMap { op =>
      op.oracle.flatMap { sql =>
        val u = sql.toUpperCase
        val wide = u.contains("HUGEINT") || u.contains("DECIMAL(38")
        val dbl = u.contains("AS DOUBLE")
        if (wide && dbl && !WideDoubleAllowlist(op.name)) Some(op.name)
        else None
      }
    }
    assert(offenders.isEmpty,
      s"oracles mixing wide-int SQL with a double cast: $offenders — a " +
        "HUGEINT/decimal(38)→double narrowing is engine-implemented past " +
        "2^53 and can flip the compare hash across DuckDB builds; emit " +
        "exact integer micro-units (the linreg quotient/remainder split) " +
        "or audit the bound in WideDoubleAllowlist")
  }

  // ------------------------------------------------- linreg truncation law

  test("linreg micro-split truncates toward zero on negative slopes") {
    import spark.implicits._
    import graft.operators.Series
    // points (t=0, 100 cents), (t=3, 0 cents): slope = -1/3 value/s →
    // micro = trunc(-333333.33…) = -333333 (toward zero, NOT floor
    // -333334); fit at x_last=3 is exactly 0. Pins that q = fn DIV fd and
    // r = fn MOD fd share the dividend's sign so the two-term sum equals
    // the true truncated quotient.
    val cents = Seq(("a", 0L, 1L, 100L), ("a", 3L, 2L, 0L))
      .toDF("path", "ts", "event_id", "cents")
    val r = Series.linregFrom(Series.linregMomentsFrom(cents)).collect()(0)
    assert(r.getLong(2) == -333333L,
      s"slope_micro = ${r.getLong(2)} — expected trunc-toward-zero -333333")
    assert(r.getLong(3) == 0L)
  }

  // --------------------------------------------- withGlobalRank width law

  test("withGlobalRank width follows spark.sql.shuffle.partitions; slices bounded") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val df = (1 to 1000).map(i => (i * 37 % 1000, i)).toDF("k", "id")
      assert(graft.operators.Partitioning.rankParts(df) == 8,
        "range exchange width must track the session shuffle config")
      // the range exchange the primitive plans (explicit numPartitions —
      // AQE does not coalesce a user-specified repartition): every slice
      // must stay bounded, no single-task degenerate sort
      val sizes = df.repartitionByRange(8, df("k"), df("id"))
        .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
        .groupBy("pid").count()
        .collect().map(_.getLong(1))
      assert(sizes.length == 8 && sizes.max <= 3 * 1000 / 8,
        s"slice sizes ${sizes.toSeq} — one range slice holds too much")
      graft.operators.Partitioning.withGlobalRank(df, Seq("k", "id")) { ranked =>
        val ranks = ranked.select("grank").as[Long].collect().sorted
        assert(ranks.toSeq == (1L to 1000L),
          "exact global rank must still assign 1..n at the config width")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  // ------------------------------------------------------- log reopen

  test("Logging.reopen recreates a rotated-away log file (logger.go Reopen)") {
    val dir = java.nio.file.Files.createTempDirectory("r13_logrotate")
    val logFile = dir.resolve("graft.log")
    val cfg = dir.resolve("log4j2-reopen.xml")
    java.nio.file.Files.write(cfg,
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Configuration status="WARN">
         |  <Appenders>
         |    <File name="f" fileName="${logFile}">
         |      <PatternLayout pattern="%m%n"/>
         |    </File>
         |    <Console name="c" target="SYSTEM_ERR">
         |      <PatternLayout pattern="%m%n"/>
         |    </Console>
         |  </Appenders>
         |  <Loggers>
         |    <Logger name="graft.r13.reopen" level="info" additivity="false">
         |      <AppenderRef ref="f"/>
         |    </Logger>
         |    <Root level="error"><AppenderRef ref="c"/></Root>
         |  </Loggers>
         |</Configuration>
         |""".stripMargin.getBytes("UTF-8"))
    val ctx = org.apache.logging.log4j.core.LoggerContext.getContext(false)
    val prev = ctx.getConfigLocation
    try {
      ctx.setConfigLocation(cfg.toUri)
      val log = org.apache.logging.log4j.LogManager.getLogger("graft.r13.reopen")
      log.info("before-rotate")
      assert(new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
        .contains("before-rotate"))
      // logrotate's flow: MOVE the live file away, then signal the daemon
      val rotated = dir.resolve("graft.log.1")
      java.nio.file.Files.move(logFile, rotated)
      graft.Logging.reopen()
      log.info("after-rotate")
      assert(java.nio.file.Files.exists(logFile),
        "reopen must recreate the log file at its configured path")
      val fresh = new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
      assert(fresh.contains("after-rotate") && !fresh.contains("before-rotate"),
        s"fresh file content drifted: $fresh")
      val old = new String(java.nio.file.Files.readAllBytes(rotated), "UTF-8")
      assert(old.contains("before-rotate") && !old.contains("after-rotate"),
        "the rotated file must keep only pre-rotation lines")
    } finally {
      // restore whatever config the test JVM was running with
      if (prev != null) ctx.setConfigLocation(prev) else ctx.reconfigure()
    }
  }

  // ------------------------------------------------ API access logging

  test("every HTTP route emits a requestlogger access line: status, route, elapsed") {
    import graft.api.{MetricsApi, MetricsHttpServer}
    val backend = new MetricsHttpServer.Backend {
      def healthcheck(): Boolean = true
      def getPaths(glob: String, tenant: Option[String]): Seq[MetricsApi.PathEntry] = Nil
      def deletePaths(glob: String): Long = 0L
      def getMetrics(paths: Seq[String], from: Long, to: Long): MetricsApi.MetricsResponse =
        MetricsApi.MetricsResponse(from, to, 1L, Map.empty)
      def deleteMetrics(paths: Seq[String], from: Long, to: Long,
          dryRun: Boolean): MetricsApi.DeleteResponse =
        MetricsApi.DeleteResponse(dryRun, Map.empty, 0L)
    }
    val srv = new MetricsHttpServer(backend)
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    srv.accessLogSink = l => { lines.add(l); () }
    val port = srv.start()
    def get(p: String): Int = {
      val c = new java.net.URL(s"http://127.0.0.1:$port$p")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      try { c.getResponseCode } finally c.disconnect()
    }
    try {
      assert(get("/") == 200)
      assert(get("/healthcheck") == 200)
      assert(get("/nope") == 404)
      val got = lines.toArray(Array.empty[String]).toSeq
      val shape = """\[(\d{3})\] GET (\S+) \((\d+)us\)""".r
      assert(got.size == 3, s"expected 3 access lines, got $got")
      got.foreach(l => assert(shape.matches(l), s"line shape drifted: $l"))
      assert(got.exists(_.startsWith("[200] GET / ")), got.toString)
      assert(got.exists(_.startsWith("[200] GET /healthcheck ")), got.toString)
      assert(got.exists(_.startsWith("[404] GET /nope ")), got.toString)
    } finally srv.stop()
  }

  // ----------------------------------------- real-codec multimodal seam

  /** Encode a solid-color PNG with the JDK's own ImageIO. */
  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("multimodal seam decodes REAL PNG bytes: dims, resize raster, features") {
    import spark.implicits._
    import graft.operators.Multimodal
    val blobs = Seq(
      (1L, solidPng(40, 20, 0xFF0000)), // wide red
      (2L, solidPng(10, 30, 0x0000FF))  // tall blue
    ).toDF("doc_id", "blob")

    val meta = Multimodal.decodeImageMeta(spark, blobs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getInt(2) == 40 && meta(1L).getInt(3) == 20)
    assert(meta(2L).getInt(2) == 10 && meta(2L).getInt(3) == 30)
    assert(meta(1L).getInt(4) == 3, "RGB PNG must decode to 3 channels")

    val rs = Multimodal.resizeImage(spark, blobs, box = 224)
      .collect().map(r => r.getLong(0) -> r).toMap
    // exact integer aspect-fit: 40x20 -> 224x112; 10x30 -> 74x224
    assert(rs(1L).getInt(1) == 224 && rs(1L).getInt(2) == 112)
    assert(rs(2L).getInt(1) == 10 * 224 / 30 && rs(2L).getInt(2) == 224)
    assert(rs(1L).getBoolean(3) && rs(2L).getBoolean(3), "both upscale")
    // a solid color must survive an actual raster scale EXACTLY
    assert((rs(1L).getLong(4), rs(1L).getLong(5), rs(1L).getLong(6)) == ((255L, 0L, 0L)))
    assert((rs(2L).getLong(4), rs(2L).getLong(5), rs(2L).getLong(6)) == ((0L, 0L, 255L)))

    val ft = Multimodal.imageFeatures(spark, blobs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // 16-bit lanes: mean 255 maps to exactly 65535 (x257), dims ride f3/f4
    assert(ft(1L).getLong(1) == 65535L && ft(1L).getLong(2) == 0L)
    assert(ft(2L).getLong(3) == 65535L && ft(2L).getLong(1) == 0L)
    assert(ft(1L).getLong(4) == 40L && ft(1L).getLong(5) == 20L)
  }

  // --------------------------------------- watermark-buffered out-of-order

  test("transitionsBufferedMachine absorbs cross-batch disorder the write-once form rejects") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionStream
    implicit val sq = spark.sqlContext
    implicit val be = org.apache.spark.sql.Encoders.product[SessionStream.BufEvent]
    def ev(u: Long, t: String, sec: Long) =
      SessionStream.BufEvent(u, t, sec * graft.model.RollupConfig.LastKeyShift,
        new java.sql.Timestamp(sec * 1000L))
    val ms = MemoryStream[SessionStream.BufEvent]
    val q = SessionStream.transitionsBufferedMachine(
        ms.toDS().withWatermark("et", "250 seconds")
          .as[SessionStream.BufEvent])
      .toDF()
      .writeStream.format("memory").queryName("r13_buf_trans")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "a", 100), ev(1, "c", 300))
      q.processAllAvailable()
      // batch 2 delivers an event BELOW batch 1's high-water mark — the
      // write-once machine throws on this exact shape (spec above); the
      // buffered form orders it once the watermark passes
      ms.addData(ev(1, "b", 200), ev(1, "d", 1000))
      q.processAllAvailable()
      ms.addData(ev(2, "z", 3000)) // advances the watermark past d
      q.processAllAvailable()
      val pairs = spark.table("r13_buf_trans")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(pairs == Set(("a", "b"), ("b", "c"), ("c", "d")),
        s"finalized pairs drifted: $pairs")
    } finally {
      q.stop(); spark.catalog.dropTempView("r13_buf_trans")
    }
  }

  // ------------------------------------- duplicate-redelivery guard (equal k)

  test("stream_transitions rejects an equal-key duplicate redelivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionStream
    implicit val sq = spark.sqlContext
    implicit val te = org.apache.spark.sql.Encoders.product[SessionStream.TransEvent]
    val ms = MemoryStream[SessionStream.TransEvent]
    val q = SessionStream.transitionsMachine(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("r13_dup_trans")
      .outputMode("append").start()
    try {
      ms.addData(SessionStream.TransEvent(1L, "view", 100L))
      q.processAllAvailable()
      // SAME key as the high-water mark: a redelivered duplicate — must
      // fail the contract, not emit a second (view -> view) pair
      ms.addData(SessionStream.TransEvent(1L, "view", 100L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(e: Throwable): Seq[String] =
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).toSeq
      assert(chain(ex).exists(m => m != null && m.contains("out-of-order")),
        s"expected the out-of-order guard on an equal key, got: ${chain(ex)}")
    } finally {
      q.stop(); spark.catalog.dropTempView("r13_dup_trans")
    }
  }
}
