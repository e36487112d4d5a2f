package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Carbon, Rollups}
import graft.sources.RollupStore

/** The real UDP front door (r11): datagrams → remainder-carry reassembly →
  * metricHandler parse → staged flush slices → the daemon's metric rollup
  * stream → the store. Parse fidelity is gated against the BATCH engine:
  * the same line stream replayed through `Carbon.parse` must accept the
  * same rows with the same counters.
  */
class UdpSpec extends AnyFunSuite with TestSpark {

  private val loop = InetAddress.getByName("127.0.0.1")

  private def sendAll(port: Int, payload: Array[Byte], packetBytes: Int): Int = {
    val sock = new DatagramSocket()
    try {
      var sent = 0
      var off = 0
      while (off < payload.length) {
        val len = math.min(packetBytes, payload.length - off)
        sock.send(new DatagramPacket(payload, off, len, loop, port))
        sent += 1
        off += len
        if (sent % 16 == 0) Thread.sleep(5) // don't outrun the socket buffer
      }
      sent
    } finally sock.close()
  }

  private def awaitLines(l: UdpListener, want: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (l.receivedOk.get + l.receivedFail.get + l.peerCmds.get < want
        && System.nanoTime() < deadline) Thread.sleep(20)
  }

  test("UDP listener reassembles and parses exactly like the batch engine") {
    // the full fixture line stream (valid, five malformed variants, peer
    // wire commands), newline-terminated, cut into 512-byte datagrams —
    // guaranteed mid-line splits the carry must heal
    val lines = Carbon.lines(spark, Sf).orderBy("line_id")
      .select("line").collect().map(_.getString(0))
    val listener = new UdpListener
    try {
      val bytes = lines.mkString("", "\n", "\n").getBytes("UTF-8")
      val packets = sendAll(listener.port, bytes, 512)
      assert(packets > lines.length / 20, "fixture too small to split lines")
      awaitLines(listener, lines.length.toLong)

      val batch = Carbon.parse(spark, Sf).orderBy("line_id").collect()
      val wantOk = batch.count(_.getBoolean(1))
      val wantCmd = batch.count(_.getString(2) != "")
      val wantFail = batch.length - wantOk - wantCmd
      assert(listener.receivedOk.get === wantOk.toLong, "ok counter")
      assert(listener.receivedFail.get === wantFail.toLong, "fail counter")
      assert(listener.peerCmds.get === wantCmd.toLong, "peer-cmd counter")
      assert(listener.lastPeerCmd.get ===
        (("peerlist", Carbon.PeerlistWirePayload)))

      // accepted rows equal the batch engine's valid rows, in line order
      val got = listener.snapshot.map(r => (r._1, r._2, r._3))
      val want = batch.filter(_.getBoolean(1))
        .map(r => (r.getString(3), r.getDouble(4), r.getLong(5))).toSeq
      assert(got === want, "accepted (path, value, ts) stream diverged")
    } finally listener.stop()
  }

  test("daemon UDP arm: socket -> flush slices -> store -> HTTP, end to end") {
    val store = java.nio.file.Files.createTempDirectory("udp_store").toString
    val src = java.nio.file.Files.createTempDirectory("udp_src").toString
    val now = graft.model.Tables.metrics(spark, Sf).agg(max("ts")).head().getLong(0)
    val daemon = new Daemon(spark, store, Some(now))
    try {
      val httpPort = daemon.startHttp()
      val udpPort = daemon.startUdpIngest(src)

      // two flush cycles, split mid-stream so the second datagram run
      // starts with a carried tail from nothing (fresh) but the byte cut
      // inside each run still splits lines
      val lines = Carbon.lines(spark, Sf).orderBy("line_id")
        .select("line").collect().map(_.getString(0))
      val (a, b) = lines.splitAt(lines.length / 2)
      sendAll(udpPort, a.mkString("", "\n", "\n").getBytes("UTF-8"), 512)
      awaitLines(daemon.listener, a.length.toLong)
      assert(daemon.udpFlush("s0.parquet") > 0)
      sendAll(udpPort, b.mkString("", "\n", "\n").getBytes("UTF-8"), 512)
      awaitLines(daemon.listener, lines.length.toLong)
      val accepted = daemon.listener.snapshot // second half, pre-flush
      assert(daemon.udpFlush("s1.parquet") > 0)
      daemon.ingestQuery.processAllAvailable()

      // the store's merge-on-read answer equals the single-pass batch
      // rollup of exactly what the listener accepted (both cycles)
      import spark.implicits._
      val allAccepted = Carbon.parse(spark, Sf).filter(col("valid"))
        .orderBy("line_id")
        .select(col("path"), col("value"), col("ts"))
        .collect().zipWithIndex
        .map { case (r, i) => (r.getString(0), r.getDouble(1), r.getLong(2), i.toLong) }
        .toSeq
      assert(accepted.size < allAccepted.size, "flush boundary was vacuous")
      val want = Rollups.finalize(Rollups.mergeableFrom(
          allAccepted.toDF("path", "value", "ts", "event_id")))
        .collect().map(_.toString).sorted
      val got = RollupStore.readFinalized(spark, store)
        .collect().map(_.toString).sorted
      assert(got === want, "store content diverged from the batch rollup")

      // and the HTTP arm serves it
      val http = java.net.http.HttpClient.newHttpClient()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://127.0.0.1:$httpPort/healthcheck")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
    } finally daemon.stop()
  }
}
