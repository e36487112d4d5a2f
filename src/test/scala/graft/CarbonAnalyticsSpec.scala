package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.{Analytics, Carbon}

class CarbonAnalyticsSpec extends AnyFunSuite with TestSpark {

  test("carbon parse: corruption residues are rejected, the rest parse clean") {
    val rows = Carbon.parse(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val total = Tables.events(spark, Sf).count()
    assert(rows.length === total)
    rows.foreach { case (id, valid) =>
      val corrupted = id % 17 == 0 || id % 13 == 0 || id % 19 == 0
      // a peer wire command is not a metric either (but it's also not a
      // receive failure — see the stats test); it only reaches the %31
      // branch when no earlier line variant claimed the id
      val peerCmd = id % 31 == 0 &&
        !(id % 17 == 0 || id % 13 == 0 || id % 19 == 0 || id % 23 == 0 || id % 29 == 0)
      assert(valid === !(corrupted || peerCmd), s"line $id")
    }
  }

  test("receive stats: ok + fail + peer commands == line count overall") {
    val stats = Carbon.receiveStats(spark, Sf)
      .agg(sum("received_ok").as("ok"), sum("received_fail").as("fail"),
        sum("peer_cmds").as("peer"))
      .collect().head
    val total = Tables.events(spark, Sf).count()
    assert(stats.getLong(0) + stats.getLong(1) + stats.getLong(2) === total)
    assert(stats.getLong(1) > 0, "fixture must contain malformed lines")
    assert(stats.getLong(2) > 0, "fixture must contain peer wire commands")
  }

  test("peer route: all points accounted for, every peer in range") {
    val rows = Carbon.peerRoute(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum === Tables.events(spark, Sf).count())
    rows.foreach { case (peer, _, _) => assert(peer >= 0 && peer < Carbon.PeerCount) }
  }

  test("sessionize: event counts conserved; same-user sessions separated by > gap") {
    val sessions = Analytics.sessionize(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sessions.map(_._5).sum === Tables.events(spark, Sf).count())
    sessions.groupBy(_._1).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === (1L to ordered.length))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._4 > Analytics.SessionGapSec,
            s"sessions ${a._2} and ${b._2} of user ${a._1} not separated by gap")
        case _ =>
      }
      ss.foreach(s => assert(s._4 >= s._3))
    }
  }

  test("funnel_steps matches a driver-side strict-order replay") {
    val shift = graft.model.RollupConfig.LastKeyShift
    val ev = Tables.events(spark, Sf)
      .selectExpr("user_id", "event_type", s"(ts DIV 1000000000) * $shift + event_id AS k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def mins(step: String, prev: Map[Long, Long]): Map[Long, Long] =
      ev.filter(e => e._2 == step && prev.get(e._1).exists(e._3 > _))
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val all = ev.map(_._1).distinct.map(_ -> Long.MinValue).toMap
    val k1 = ev.filter(_._2 == Analytics.FunnelSteps.head)
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val k2 = mins(Analytics.FunnelSteps(1), k1)
    val k3 = mins(Analytics.FunnelSteps(2), k2)
    assert(all.nonEmpty)
    val got = Analytics.funnelSteps(spark, Sf).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4))).toMap
    assert(got(1)._2 === k1.size && got(2)._2 === k2.size && got(3)._2 === k3.size)
    assert(k1.size >= k2.size && k2.size >= k3.size, "funnel must be monotone")
    assert(got(1)._3.isEmpty && got(1)._4 === 100.0)
    // mean hop latency recounts exactly (integer seconds, one division)
    val lat2 = k2.map { case (u, k) => k / shift - k1(u) / shift }.sum
    assert(got(2)._3.exists(v =>
      math.abs(v - lat2.toDouble / k2.size) < 1e-6), "step-2 latency")
    k2.foreach { case (u, k) => assert(k > k1(u), s"user $u step 2 not after step 1") }
    k3.foreach { case (u, k) => assert(k > k2(u), s"user $u step 3 not after step 2") }
  }

  test("cohort_retention: week-0 is the whole cohort, shares bounded, users conserved") {
    val rows = Analytics.cohortRetention(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n, size, pct) =>
      assert(off >= 0 && n <= size && pct <= 100.0 + 1e-9)
      assert(math.abs(pct - n * 100.0 / size) < 1e-4)
    }
    // by construction every user is active in their first week
    rows.filter(_._2 == 0).foreach { case (cw, _, n, size, _) =>
      assert(n === size, s"cohort $cw week 0 must cover the whole cohort")
    }
    // cohort sizes partition the distinct-user population
    val users = Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0).map(_._4).sum === users)
  }

  test("event_attribution: users partition by first touch, conversions and revenue conserved") {
    val rows = Analytics.eventAttribution(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ev = Tables.events(spark, Sf)
    val users = ev.select("user_id").distinct().count()
    assert(rows.values.map(_._1).sum === users, "first touch must partition users")
    val purchases = ev.filter(col("event_type") === Analytics.AttributionConversion)
    assert(rows.values.map(_._2).sum === purchases.count(), "conversions conserved")
    val totalRev = purchases
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))).head().getLong(0) / 100.0
    assert(math.abs(rows.values.map(_._3).sum - totalRev) < 1e-6, "revenue conserved")
    // driver recount of the first-touch channel per user
    val shift = graft.model.RollupConfig.LastKeyShift
    val first = ev.selectExpr("user_id", "event_type",
        s"(ts DIV 1000000000) * $shift + event_id AS k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (_, xs) => xs.minBy(_._3)._2 }
    first.groupBy(identity).foreach { case (ch, xs) =>
      assert(rows(ch)._1 === xs.size.toLong, s"channel $ch user count")
    }
    rows.foreach { case (ch, (n, _, rev, rpu)) =>
      assert(math.abs(rpu - rev / n) < 1e-5, s"channel $ch revenue_per_user")
    }
  }

  test("user_rfm: quartile scores partition users evenly and order by the underlying metric") {
    val rows = Analytics.userRfm(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toMap
    val users = Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(rows.size.toLong === users)
    rows.values.foreach { case (r, f, m, seg) =>
      assert(Seq(r, f, m).forall(s => s >= 1 && s <= 4))
      assert(seg === s"$r$f$m")
    }
    // rank-quartiles split the population into four near-equal bands
    Seq[((Int, Int, Int, String)) => Int](_._1, _._2, _._3).foreach { dim =>
      val sizes = rows.values.groupBy(dim).view.mapValues(_.size).toMap
      assert(sizes.keySet === Set(1, 2, 3, 4))
      assert(sizes.values.max - sizes.values.min <= 1, s"uneven quartiles: $sizes")
    }
    // monotone in frequency: a user with strictly more events never scores lower
    val freq = Tables.events(spark, Sf).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (u, (_, fs, _, _)) =>
      rows.foreach { case (v, (_, gs, _, _)) =>
        if (freq(u) > freq(v)) assert(fs >= gs, s"user $u vs $v frequency order")
      }
    }
  }

  test("q1 aggregates are internally consistent (avg * count == sum)") {
    val rows = Analytics.q1Pricing(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sumQty = r.getDouble(2)
      val avgQty = r.getDouble(6)
      val n = r.getLong(9)
      assert(math.abs(avgQty - sumQty / n) < 1e-6)
    }
  }

  test("quantile sketch stays within one bin width of its rank statistic") {
    // the rigorous histogram bound: the estimate lives in the bin that
    // contains the ceil(n*q)-th smallest value, so it is within one bin
    // width of that ORDER STATISTIC. (The interpolating `percentile` can
    // sit further away when adjacent tail samples gap wider than a bin —
    // that's a property of the data's tail, not of the sketch.)
    val values = graft.model.Tables.events(spark, Sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def stat(t: String, num: Long, den: Long): Double = {
      val v = values(t)
      v(((v.length * num + den - 1) / den - 1).toInt)
    }
    val sketch = Carbon.valueQuantilesSketch(spark, Sf).collect()
    assert(sketch.map(_.getString(0)).toSet === values.keySet)
    sketch.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(4) === values(t).length.toLong, s"$t: count drifted")
      Seq((r.getDouble(1), stat(t, 1, 2), "p50"),
          (r.getDouble(2), stat(t, 19, 20), "p95"),
          (r.getDouble(3), stat(t, 99, 100), "p99")).foreach { case (est, tru, q) =>
        assert(math.abs(est - tru) <= Carbon.QuantileBinW,
          s"$t $q: sketch $est vs rank statistic $tru exceeds one bin")
      }
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3),
        "quantile estimates must be monotone")
    }
  }

  test("count-min never underestimates, and wider buckets shrink the overestimate") {
    // The two count-min laws. (1) est >= exact for EVERY key: each
    // occurrence incremented all of its depth buckets, collisions only
    // ADD — a violation means the slices/probe drifted. (2) The width
    // dial: the narrow default (w=16 vs the 40-path catalog) must
    // actually collide on this fixture — otherwise both laws are
    // vacuous — and widening the buckets must shrink the reported
    // overestimate (the Round8Spec dial-pin pattern).
    val top = Carbon.heavyHittersSketch(spark, Sf).collect()
    assert(top.length === 10)
    top.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: count-min underestimated (${r.getLong(2)} < ${r.getLong(1)})")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
    def totalOver(bits: Int): Long =
      graft.operators.Carbon.heavyHittersWith(spark, Sf, bits)
        .agg(sum("over_est")).head().getLong(0)
    val narrow = totalOver(Carbon.CmsBucketBits)
    assert(narrow > 0, "narrow dial must produce observable collisions")
    assert(totalOver(12) < narrow, "wider buckets must shrink the overestimate")
  }
}
