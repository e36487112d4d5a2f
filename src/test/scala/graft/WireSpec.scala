package graft

import java.io.File

import scala.sys.process.{Process, ProcessLogger}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Carbon, Wire}

/** The transport surface: UDP datagram reassembly and peer forwarding
  * (operators/Wire.scala vs reference listener/carbon_plaintext.go's UDP
  * path and listener/stubborntcpconn.go).
  */
class WireSpec extends AnyFunSuite with TestSpark {

  test("reassembly round-trips: parsed lines equal carbon_parse's, exactly") {
    // carbon_parse keys by line_id, reassembly by (conn, line_no) — the
    // CONTENT multiset is the framing-independent invariant.
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("valid"), col("peer_cmd"), col("path"), col("value"), col("ts"))
      .collect()
      .map(_.toString)
      .sorted
    val direct = key(Carbon.parse(spark, Sf))
    val framed = key(Wire.reassemble(spark, Sf))
    assert(framed.length === direct.length)
    assert(framed.toSeq === direct.toSeq)
  }

  test("packet cuts actually split lines (the reassembly is not vacuous)") {
    val payloads = Wire.packets(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // fixture integrity: per conn, payload concat == line concat
    val streams = payloads.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).mkString).toMap
    val expected = Carbon.lines(spark, Sf)
      .withColumn("conn", col("line_id") % Wire.Conns)
      .collect()
      .map(r => (r.getAs[Long]("conn"), r.getAs[Long]("line_id"), r.getAs[String]("line")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3 + "\n").mkString).toMap
    assert(streams === expected)
    // non-vacuity: if no line crossed a cut, every non-final packet would
    // end exactly on a newline — mid-line cuts are the whole point.
    val midLineCuts = payloads.count { case (_, _, payload) =>
      payload.length == Wire.PacketBytes && !payload.endsWith("\n")
    }
    assert(midLineCuts > 0, "no packet cut fell mid-line; the fixture is degenerate")
    // every line survives framing
    assert(Wire.reassemble(spark, Sf).count() === Carbon.parse(spark, Sf).count())
  }

  test("peer_forward: verdicts partition the forwarded stream; self keeps all") {
    val rows = Wire.peerForward(spark, Sf).collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }
    assert(rows.nonEmpty && rows.length <= Carbon.PeerCount)
    rows.foreach { case (peer, kept, fwd, delivered, retried, dropped) =>
      assert(delivered + retried + dropped === fwd, s"peer $peer verdict split")
      if (peer == 0) {
        assert(fwd === 0, "self-owned lines never hit the network")
        assert(kept > 0)
      } else assert(kept === 0, s"peer $peer cannot store locally")
    }
    // totals: every valid parsed line is either kept or forwarded
    val valid = Carbon.parse(spark, Sf).filter(col("valid")).count()
    assert(rows.map(r => r._2 + r._3).sum === valid)
    // the outage schedule actually fires at fixture scale
    assert(rows.map(_._6).sum > 0, "no drops — the staggered outage model is dead code")
  }

  test("stream_reassemble equals the batch algebra row-for-row, carry crossing batches") {
    // the live remainder-carry state machine must reproduce carbon_reassemble
    // exactly, including (conn, line_no) keys — not just the content multiset
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val batch = keyed(Wire.reassemble(spark, Sf))
    val streamed = keyed(graft.streaming.WireStream.reassembleQuery(spark, Sf))
    assert(streamed === batch)
    // non-vacuity of the 3-file replay: at least one connection must end
    // batch 0 mid-line, so its tail genuinely rides group state into the
    // next micro-batch (same tertile cut the query uses)
    val pkts = Wire.packets(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val mx = pkts.map(_._2).max
    val carried = pkts.filter(_._2 <= mx / 3).groupBy(_._1).values.count { conn =>
      !conn.maxBy(_._2)._3.endsWith("\n")
    }
    assert(carried > 0, "every conn ended batch 0 newline-aligned; the carry is untested")
  }

  test("wire ops pass the DuckDB oracle gate on the adversarial fixture") {
    // 5 events over 4 conns: every conn fits ONE packet — the degenerate
    // no-split geometry the sf fixtures never produce (there the non-vacuity
    // test asserts the opposite). Replay through the REAL driver gate.
    val fixtureDir = AdversarialFixture.dir(spark)
    val out = "/root/repo/target/wire_verify"
    Verify.dump(spark, fixtureDir, out,
      Some(Set("carbon_reassemble", "peer_forward")))
    val log = new StringBuilder
    val exit = Process(
      Seq("python3", "tools/oracle_check.py", fixtureDir, out),
      new File("/root/repo")).!(ProcessLogger(s => log.append(s).append('\n')))
    assert(exit === 0, s"oracle_check failed on the adversarial fixture:\n$log")
  }
}
