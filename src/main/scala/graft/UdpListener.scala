package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

/** The REAL UDP front door: a datagram socket receiving carbon plaintext,
  * reassembled with the reference listener's remainder-carry loop
  * (carbon_plaintext.go:149-207 — read a datagram, append to the carried
  * buffer, dispatch every complete line, keep the truncated tail), parsed
  * per metricHandler's rules, and staged as one parquet metric slice per
  * flush — the socket-to-slice bridge in front of [[Daemon]]'s ingest
  * stream.
  *
  * Driver-side BY DESIGN, like [[graft.api.MetricsHttpServer]]: the
  * reference's listener is one socket-reader goroutine too. Distribution
  * starts at the staged slice (each flush is one micro-batch of the
  * Structured Streaming rollup query); horizontal scale = more listener
  * processes, exactly cassabon's peer model. Parse fidelity to the
  * Spark-side [[graft.operators.Carbon]] parse is SPEC-GATED: UdpSpec
  * replays the same lines through `Carbon.withParsedLine` and asserts the
  * listener's accepted rows match exactly.
  */
final class UdpListener {

  /** received-ok / received-fail / peer-command counters — the listener's
    * statsd emissions (carbon_plaintext.go:219-243, logging/stats.go).
    */
  val receivedOk = new AtomicLong(0)
  val receivedFail = new AtomicLong(0)
  val peerCmds = new AtomicLong(0)
  /** Last peer wire-command payload seen (`<<name=payload>>`). */
  val lastPeerCmd = new AtomicReference[(String, String)]()

  private val socket = new DatagramSocket(0, InetAddress.getByName("127.0.0.1"))
  socket.setSoTimeout(250)
  private val buffered = ArrayBuffer.empty[(String, Double, Long, Long)]
  private val arrivals = new AtomicLong(0)
  private var carry = ""
  @volatile private var running = true

  private val peerCmdRe = "^<<([a-z]+)=(.*)>>$".r
  // plain decimal/scientific floats only — the dialect Go's ParseFloat and
  // Spark's try_cast share; Java's parseDouble ALSO accepts hex floats and
  // d/f suffixes, which would silently diverge from both engines
  private val numRe = "[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?".r

  private def parseNum(s: String): Option[Double] = s match {
    case numRe(_*) =>
      try Some(java.lang.Double.parseDouble(s))
      catch { case _: NumberFormatException => None }
    case _ => None
  }

  /** metricHandler (carbon_plaintext.go:208-243): peer commands are
    * inspected FIRST on the raw line and bump neither receive counter;
    * metrics tokenize with Fields (any whitespace runs), need exactly
    * 3 fields, value parses as float, ts parses as float and floors.
    */
  private def dispatchLine(line: String): Unit = line match {
    case peerCmdRe(cmd, payload) =>
      peerCmds.incrementAndGet()
      lastPeerCmd.set((cmd, payload))
    case _ =>
      val fields = line.trim.split("\\s+").filter(_.nonEmpty)
      val parsed =
        if (fields.length != 3) None
        else for (v <- parseNum(fields(1)); t <- parseNum(fields(2)))
          yield (fields(0), v, math.floor(t).toLong)
      parsed match {
        case Some((path, v, t)) =>
          receivedOk.incrementAndGet()
          buffered.synchronized {
            buffered += ((path, v, t, arrivals.getAndIncrement()))
          }
        case None =>
          receivedFail.incrementAndGet(): Unit
      }
  }

  private val reader = new Thread(() => {
    val buf = new Array[Byte](16384) // the reference's datagram size
    while (running) {
      try {
        val pkt = new DatagramPacket(buf, buf.length)
        socket.receive(pkt)
        // the remainder-carry loop: buffer = carry + datagram, dispatch
        // complete lines, keep the truncated tail for the next read
        val data = carry + new String(pkt.getData, 0, pkt.getLength, "UTF-8")
        val parts = data.split("\n", -1)
        parts.dropRight(1).foreach(l => if (l.nonEmpty) dispatchLine(l))
        carry = parts.last
      } catch {
        case _: java.net.SocketTimeoutException => // poll the running flag
        case _: java.net.SocketException if !running => // closed in stop()
      }
    }
  }, "graft-udp-listener")
  reader.setDaemon(true)
  reader.start()

  def port: Int = socket.getLocalPort

  /** Number of metric rows accepted and not yet flushed. */
  def pending: Int = buffered.synchronized(buffered.size)

  /** Unflushed accepted rows, in arrival order (spec surface). */
  def snapshot: Vector[(String, Double, Long, Long)] =
    buffered.synchronized(buffered.toVector)

  /** Drain the accepted rows into ONE staged parquet slice in `srcDir`
    * (the flush-cycle unit [[Daemon.stageSlice]] documents) and return
    * how many rows flushed. `event_id` is the arrival index — the LAST
    * tiebreak key, mirroring the reference's arrival-order semantics.
    */
  def flush(spark: SparkSession, srcDir: String, name: String): Int = {
    val rows = buffered.synchronized {
      val snap = buffered.toVector
      buffered.clear()
      snap
    }
    if (rows.nonEmpty) {
      import spark.implicits._
      Daemon.stageSlice(
        rows.toDF("path", "value", "ts", "event_id"), srcDir, name)
    }
    rows.size
  }

  def stop(): Unit = {
    running = false
    socket.close()
    reader.join(2000)
  }
}
