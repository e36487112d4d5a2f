package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Pearson

/** The live peer ring — cassabon's consistent path placement as the
  * LISTENER sees it (listener/peerlist.go): the ring is the peers map's
  * VALUES ordered by sorted KEY (sortedMapToArray, peerlist.go:158-168),
  * and a path's owner is `Hash8(path) % len(ring)` (OwnerOf,
  * peerlist.go:112-119) — the same placement the batch `peer_route` /
  * `peer_forward` operators compute with the codegen'd `pearson_hash8`,
  * so the live split and the batch verdict can be reconciled line for
  * line (PeerForwardSpec does exactly that).
  */
private[graft] final class PeerRing(val selfHostPort: String,
    val peersMap: Map[String, String]) {

  val ring: Vector[String] = peersMap.toSeq.sortBy(_._1).map(_._2).toVector
  require(ring.nonEmpty, "empty peer ring")

  /** (owner index, is it mine) — OwnerOf, peerlist.go:112-119. */
  def ownerOf(path: String): (Int, Boolean) = {
    val idx = Pearson.hash8(UTF8String.fromString(path)) % ring.length
    (idx, ring(idx) == selfHostPort)
  }

  /** IsEqual (peerlist.go:88-110): same local address, same ring. */
  def isEqual(hostPort: String, peers: Map[String, String]): Boolean =
    selfHostPort == hostPort &&
      ring == peers.toSeq.sortBy(_._1).map(_._2).toVector
}

private[graft] object StubbornConn {
  /** What happened to one Send: landed first try, landed after the
    * reconnect-and-rewrite path, or exhausted its retries — the three
    * verdicts `peer_forward`'s batch accounting models as
    * delivered/retried/dropped.
    */
  sealed trait Outcome
  case object Delivered extends Outcome
  case object Retried extends Outcome
  case object Dropped extends Outcome
}

/** A peer connection that persistently retries dropped links — the
  * StubbornTCPConn contract (listener/stubborntcpconn.go): `send` makes
  * up to TWO write attempts (`retriesRemaining = 2`, go:40-66), reopening
  * the socket before each attempt if it is closed; a failed write closes
  * the socket so the next attempt (this call's second, or the next
  * call's first) dials fresh. The socket stays open across sends — one
  * long-lived link per peer, exactly one `\n`-terminated line per send.
  *
  * `dial`/`writeLine` are seams so the retry CONTROL FLOW is spec-testable
  * deterministically (a loopback TCP write to a dead peer may succeed
  * into the kernel buffer — the real failure surfaces on a later send,
  * which is also how the reference behaves).
  */
private[graft] class StubbornConn(hostPort: String) {
  import StubbornConn._

  private var isOpen = false
  private var conn: java.net.Socket = _
  private var openFailed = false // throttles repeat logging, go:73-79

  protected def dial(): java.net.Socket = {
    val i = hostPort.lastIndexOf(':')
    new java.net.Socket(hostPort.take(i), hostPort.drop(i + 1).toInt)
  }

  protected def writeLine(s: java.net.Socket, line: String): Unit = {
    val out = s.getOutputStream
    out.write((line + "\n").getBytes("UTF-8"))
    out.flush()
  }

  def close(): Unit = synchronized {
    if (isOpen) { try conn.close() catch { case _: java.io.IOException => } }
    isOpen = false
  }

  private def internalOpen(): Unit = {
    try {
      conn = dial()
      isOpen = true
      openFailed = false
    } catch {
      case _: java.io.IOException => openFailed = true
    }
  }

  /** Send with the reference's exact retry loop (go:40-66): on a write
    * failure the socket closes and ONE reopen-and-rewrite is attempted;
    * on an unopenable peer both loop passes fail and the line drops
    * (cassabon accepts the loss rather than buffering unboundedly).
    */
  def send(line: String): Outcome = synchronized {
    var retriesRemaining = 2
    var failed = false
    var wrote = false
    while (retriesRemaining > 0) {
      if (!isOpen) internalOpen()
      if (isOpen) {
        try {
          writeLine(conn, line)
          retriesRemaining -= 1
          wrote = true
        } catch {
          case _: java.io.IOException =>
            failed = true
            close()
        }
      }
      retriesRemaining -= 1
    }
    if (!wrote) Dropped else if (failed) Retried else Delivered
  }
}

/** One stubborn link per peer plus the delivery ledger — the forwarding
  * half of the listener (peerlist.go:53-86 opens a StubbornTCPConn per
  * non-self peer; the target channel drains through Send). Counters are
  * the live twins of `peer_forward`'s batch columns.
  */
private[graft] final class PeerForwarder(
    mkConn: String => StubbornConn = hp => new StubbornConn(hp)) {
  import StubbornConn._

  private val conns = new ConcurrentHashMap[String, StubbornConn]()
  val delivered = new AtomicLong(0)
  val retried = new AtomicLong(0)
  val dropped = new AtomicLong(0)

  def send(hostPort: String, line: String): Unit = {
    val c = conns.computeIfAbsent(hostPort, hp => mkConn(hp))
    c.send(line) match {
      case Delivered => delivered.incrementAndGet()
      case Retried => retried.incrementAndGet()
      case Dropped => dropped.incrementAndGet()
    }
    ()
  }

  /** Drop links to peers no longer in the ring (Start's keep/close sweep,
    * peerlist.go:55-70) and pre-open links to new non-self peers.
    */
  def reconcile(ring: PeerRing): Unit = {
    val want = ring.ring.filter(_ != ring.selfHostPort).toSet
    conns.forEach { (hp, c) => if (!want.contains(hp)) { c.close(); conns.remove(hp); () } }
  }

  def close(): Unit = conns.forEach((_, c) => c.close())
}
