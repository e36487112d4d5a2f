package graft

import java.net.{InetAddress, Socket}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Carbon, Rollups}
import graft.sources.RollupStore

/** The real TCP front door (the reference's primary transport): byte
  * streams over live connections → per-connection line scanning with
  * bufio.Scanner semantics → the SAME metricHandler the UDP arm uses →
  * staged flush slices → store. Parse fidelity is gated against the
  * batch engine exactly like UdpSpec.
  */
class TcpSpec extends AnyFunSuite with TestSpark {

  private val loop = InetAddress.getByName("127.0.0.1")

  /** Write `payload` in `chunk`-byte writes with flushes — guarantees the
    * kernel may deliver mid-line reads the carry must heal.
    */
  private def sendChunked(port: Int, payload: Array[Byte], chunk: Int): Unit = {
    val sock = new Socket(loop, port)
    try {
      sock.setTcpNoDelay(true)
      val out = sock.getOutputStream
      var off = 0
      while (off < payload.length) {
        val len = math.min(chunk, payload.length - off)
        out.write(payload, off, len)
        out.flush()
        off += len
        if ((off / chunk) % 16 == 0) Thread.sleep(2)
      }
      out.flush()
    } finally sock.close()
  }

  private def awaitLines(l: TcpListener, want: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (l.receivedOk.get + l.receivedFail.get + l.peerCmds.get < want
        && System.nanoTime() < deadline) Thread.sleep(20)
  }

  test("TCP listener scans connection streams exactly like the batch engine") {
    val lines = Carbon.lines(spark, Sf).orderBy("line_id")
      .select("line").collect().map(_.getString(0))
    val listener = new TcpListener
    try {
      // one connection, 512-byte writes → mid-line reads
      sendChunked(listener.port, lines.mkString("", "\n", "\n").getBytes("UTF-8"), 512)
      awaitLines(listener, lines.length.toLong)

      val batch = Carbon.parse(spark, Sf).orderBy("line_id").collect()
      val wantOk = batch.count(_.getBoolean(1))
      val wantCmd = batch.count(_.getString(2) != "")
      val wantFail = batch.length - wantOk - wantCmd
      assert(listener.receivedOk.get === wantOk.toLong, "ok counter")
      assert(listener.receivedFail.get === wantFail.toLong, "fail counter")
      assert(listener.peerCmds.get === wantCmd.toLong, "peer-cmd counter")
      assert(listener.connections.get === 1L)

      val got = listener.snapshot.map(r => (r._1, r._2, r._3))
      val want = batch.filter(_.getBoolean(1))
        .map(r => (r.getString(3), r.getDouble(4), r.getLong(5))).toSeq
      assert(got === want, "accepted (path, value, ts) stream diverged")
    } finally listener.stop()
  }

  test("scanner edges: CRLF stripped, EOF delivers the final unterminated line") {
    val listener = new TcpListener
    try {
      // \r\n line endings (ScanLines strips the \r), and a final line with
      // NO trailing newline — delivered at EOF like bufio.Scanner
      sendChunked(listener.port,
        "a.b 1.5 100\r\nbad line\r\nc.d 2 200".getBytes("UTF-8"), 7)
      awaitLines(listener, 3L)
      assert(listener.receivedOk.get === 2L)
      assert(listener.receivedFail.get === 1L)
      assert(listener.snapshot.map(r => (r._1, r._2, r._3)) ===
        Vector(("a.b", 1.5, 100L), ("c.d", 2.0, 200L)))
    } finally listener.stop()
  }

  test("two concurrent connections carry INDEPENDENT tails") {
    val listener = new TcpListener
    try {
      // each connection's stream splits mid-line; interleaved sends would
      // corrupt each other if the carry were shared
      val a = (1 to 40).map(i => s"conn.a.m$i $i 10$i").mkString("", "\n", "\n")
      val b = (1 to 40).map(i => s"conn.b.m$i $i 20$i").mkString("", "\n", "\n")
      val ta = new Thread(() => sendChunked(listener.port, a.getBytes("UTF-8"), 13))
      val tb = new Thread(() => sendChunked(listener.port, b.getBytes("UTF-8"), 17))
      ta.start(); tb.start(); ta.join(); tb.join()
      awaitLines(listener, 80L)
      assert(listener.receivedOk.get === 80L)
      assert(listener.receivedFail.get === 0L, "a shared carry would corrupt lines")
      assert(listener.connections.get === 2L)
      // per-connection arrival order is preserved within each path family
      val got = listener.snapshot.map(_._1)
      val aSeq = got.filter(_.startsWith("conn.a."))
      val bSeq = got.filter(_.startsWith("conn.b."))
      assert(aSeq === (1 to 40).map(i => s"conn.a.m$i"))
      assert(bSeq === (1 to 40).map(i => s"conn.b.m$i"))
    } finally listener.stop()
  }

  test("daemon TCP arm: sockets -> flush slices -> store, end to end") {
    val store = java.nio.file.Files.createTempDirectory("tcp_store").toString
    val src = java.nio.file.Files.createTempDirectory("tcp_src").toString
    val now = graft.model.Tables.metrics(spark, Sf).agg(max("ts")).head().getLong(0)
    val daemon = new Daemon(spark, store, Some(now))
    try {
      val tcpPort = daemon.startTcpIngest(src)
      val lines = Carbon.lines(spark, Sf).orderBy("line_id")
        .select("line").collect().map(_.getString(0))
      val (a, b) = lines.splitAt(lines.length / 2)
      sendChunked(tcpPort, a.mkString("", "\n", "\n").getBytes("UTF-8"), 512)
      awaitLines(daemon.tcpListener, a.length.toLong)
      assert(daemon.tcpFlush("s0.parquet") > 0)
      sendChunked(tcpPort, b.mkString("", "\n", "\n").getBytes("UTF-8"), 512)
      awaitLines(daemon.tcpListener, lines.length.toLong)
      assert(daemon.tcpFlush("s1.parquet") > 0)
      daemon.ingestQuery.processAllAvailable()

      import spark.implicits._
      val allAccepted = Carbon.parse(spark, Sf).filter(col("valid"))
        .orderBy("line_id")
        .select(col("path"), col("value"), col("ts"))
        .collect().zipWithIndex
        .map { case (r, i) => (r.getString(0), r.getDouble(1), r.getLong(2), i.toLong) }
        .toSeq
      val want = Rollups.finalize(Rollups.mergeableFrom(
          allAccepted.toDF("path", "value", "ts", "event_id")))
        .collect().map(_.toString).sorted
      val got = RollupStore.readFinalized(spark, store)
        .collect().map(_.toString).sorted
      assert(got === want, "store content diverged from the batch rollup")
    } finally daemon.stop()
  }
}
