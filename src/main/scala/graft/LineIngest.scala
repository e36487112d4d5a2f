package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

/** The listener-side metricHandler (carbon_plaintext.go:208-243), shared
  * by the UDP and TCP front doors so the two transports cannot drift:
  * peer wire-commands are inspected FIRST on the raw line and bump
  * neither receive counter; metrics tokenize with Fields (any whitespace
  * runs), need exactly 3 fields, value parses as float, ts parses as
  * float and floors. Accepted rows buffer in arrival order (`event_id` =
  * arrival index — the LAST tiebreak key) until a flush stages them as
  * ONE parquet slice for the daemon's rollup stream.
  */
private[graft] final class LineIngest {

  /** received-ok / received-fail / peer-command counters — the listener's
    * statsd emissions (carbon_plaintext.go:219-243, logging/stats.go).
    */
  val receivedOk = new AtomicLong(0)
  val receivedFail = new AtomicLong(0)
  val peerCmds = new AtomicLong(0)
  /** Last peer wire-command payload seen (`<<name=payload>>`). */
  val lastPeerCmd = new AtomicReference[(String, String)]()

  private val buffered = ArrayBuffer.empty[(String, Double, Long, Long)]
  private val arrivals = new AtomicLong(0)

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

  def dispatchLine(line: String): Unit = line match {
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

  /** Number of metric rows accepted and not yet flushed. */
  def pending: Int = buffered.synchronized(buffered.size)

  /** Unflushed accepted rows, in arrival order (spec surface). */
  def snapshot: Vector[(String, Double, Long, Long)] =
    buffered.synchronized(buffered.toVector)

  /** Drain the accepted rows into ONE staged parquet slice in `srcDir`
    * (the flush-cycle unit [[Daemon.stageSlice]] documents) and return
    * how many rows flushed.
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
}
