package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.{Rollups, Series}

/** The graphite-function family: counter derivative, integral, top-k
  * series, gap repair, and z-score outliers — hand-checked semantics on
  * sf0.001 (the DuckDB hash gate runs via Verify).
  */
class SeriesSpec extends AnyFunSuite with TestSpark {

  test("nonneg derivative: never negative, null exactly where the raw delta is") {
    val raw = Rollups.seriesDerivative(spark, Sf)
      .select("path", "ts", "event_id", "rate")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val nn = Series.nonNegDerivative(spark, Sf).collect()
    assert(nn.nonEmpty)
    var negSeen = 0
    nn.foreach { r =>
      val key = (r.getString(0), r.getLong(1), r.getLong(2))
      val rate = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      rate.foreach(v => assert(v >= 0, s"negative rate survived at $key"))
      raw(key) match {
        case Some(v) if v >= 0 => assert(rate === Some(v), s"positive delta changed at $key")
        case Some(_)           => negSeen += 1; assert(rate.isEmpty, s"counter reset not nulled at $key")
        case None              => assert(rate.isEmpty)
      }
    }
    assert(negSeen > 0, "fixture has no counter resets — test is vacuous")
  }

  test("integral: per-path final value equals the exact total") {
    val rows = Series.integral(spark, Sf)
      .groupBy("path").agg(max_by(col("total"), struct(col("ts"), col("event_id"))).as("last"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Tables.metrics(spark, Sf)
      .groupBy("path")
      .agg((sum(expr("CAST(round(value * 100) AS BIGINT)")) / 100.0).as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows === want)
  }

  test("series_top keeps exactly K whole series, ranked by true mean") {
    val got = Series.topSeries(spark, Sf)
    val perPath = got.groupBy("path", "path_rank").count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(perPath.map(_._2).toSet === (1 to Series.TopSeriesK).toSet)
    val counts = Tables.metrics(spark, Sf).groupBy("path").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perPath.foreach { case (p, _, n) => assert(n === counts(p), s"series $p truncated") }
    // the kept paths really are the K highest means
    val means = Tables.metrics(spark, Sf).groupBy("path")
      .agg((sum(expr("CAST(round(value*100) AS BIGINT)")) / (count(lit(1)) * 100.0)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val keptMin = perPath.map { case (p, _, _) => means(p) }.min
    val droppedMax = means.filterNot { case (p, _) => perPath.exists(_._1 == p) }.values.max
    assert(keptMin >= droppedMax)
  }

  test("series_fill: non-null slots unchanged; gaps repaired with the last seen stat") {
    val rows = Series.fillLast(spark, Sf)
      .orderBy("slot_ts").collect()
    assert(rows.nonEmpty)
    var lastSeen: Option[Double] = None
    var repaired = 0
    rows.foreach { r =>
      val stat = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val filled = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      stat match {
        case Some(v) => assert(filled === Some(v)); lastSeen = Some(v)
        case None    => assert(filled === lastSeen, s"gap at ${r.getLong(1)}"); if (filled.isDefined) repaired += 1
      }
    }
    assert(repaired > 0, "fixture fetch window has no repairable gap — test is vacuous")
  }

  test("stream_series_fill: live rollup state serves the batch fetch+fill read") {
    val batch = Series.fillLast(spark, Sf).collect().map(_.toString).sorted
    val live = graft.streaming.CarbonStream.fillQuery(spark, Sf)
      .collect().map(_.toString).sorted
    assert(live === batch)
    assert(batch.nonEmpty)
  }

  test("stream_anomaly: live moments land on the batch verdicts exactly") {
    val batch = Series.anomaly(spark, Sf).collect().map(_.toString).sorted
    val live = graft.streaming.CarbonStream.anomalyQuery(spark, Sf)
      .collect().map(_.toString).sorted
    assert(live === batch)
    assert(batch.nonEmpty)
  }

  test("series_summarize: buckets partition the points and conserve the exact total") {
    val got = Series.summarize(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, b, _, _) =>
      assert(b % Series.SummarizeBucketSec == 0, s"bucket $b off-grid") }
    val nByPath = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val totByPath = got.groupBy(_._1).view
      .mapValues(_.map(x => math.round(x._4 * 100)).sum).toMap
    val want = Tables.metrics(spark, Sf).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1)
    want.foreach { case (p, xs) =>
      assert(nByPath(p) === xs.length.toLong, s"$p point count not conserved")
      assert(totByPath(p) === xs.map(_._2).sum, s"$p cents not conserved")
    }
  }

  test("series_percentile: p50/p90 are the exact nearest-rank order statistics") {
    val buckets = Series.summarize(spark, Sf).collect()
      .map(r => (r.getLong(1), math.round(r.getDouble(3) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Series.percentileOfSeries(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (b, n) = (r.getLong(0), r.getLong(1))
      val sums = buckets(b)
      assert(n === sums.length.toLong)
      def pick(p: Int) = sums(((n * p + 99) / 100).toInt - 1) / 100.0
      assert(r.getDouble(2) === pick(50), s"p50 at bucket $b")
      assert(r.getDouble(3) === pick(90), s"p90 at bucket $b")
    }
    assert(got.exists(r => r.getLong(1) > 1), "no multi-series bucket — vacuous")
  }

  test("series_aspercent: shares recount exactly and cover each bucket's total") {
    val sums = Series.summarize(spark, Sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), math.round(r.getDouble(3) * 100)))
      .toMap
    val totals = sums.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val got = Series.asPercent(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val total = totals(key._2)
      if (total == 0) assert(r.isNullAt(2), s"zero-total bucket ${key._2} must be null")
      else {
        val want = BigDecimal(sums(key) * 100 / total.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(2) === want, s"share at $key")
      }
    }
    // shares within a bucket sum to ~100 (rounding residue < 1e-3)
    got.filter(r => !r.isNullAt(2)).groupBy(_.getLong(1)).foreach { case (b, rs) =>
      assert(math.abs(rs.map(_.getDouble(2)).sum - 100.0) < 1e-3, s"bucket $b shares")
    }
  }

  test("series_stddev: trailing-window sigma matches an exact moment recount") {
    val pts = Tables.metrics(spark, Sf).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._3, x._4)).toVector).toMap
    val got = Series.movingStdDev(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (path, ts, eid) = (r.getString(0), r.getLong(1), r.getLong(2))
      val series = pts(path)
      val i = series.indexWhere(x => x._3 == ts && x._4 == eid)
      val win = series.slice(math.max(0, i - (Series.StdDevPoints - 1)), i + 1)
      val n = win.length.toLong
      val s = win.map(_._2).sum
      val q = win.map(x => x._2 * x._2).sum
      val want = BigDecimal(math.sqrt((n * q - s * s) / (n * n * 10000.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want, s"($path,$ts,$eid)")
    }
  }

  test("series_moving_median agrees with a driver-side sorted-window recount") {
    val got = Series.movingMedian(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty)
    val byPath = Tables.metrics(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1)
    byPath.foreach { case (path, xs) =>
      val series = xs.sortBy(x => (x._2, x._3))
      series.indices.foreach { i =>
        val win = series.slice(math.max(0, i - (Series.MedianPoints - 1)), i + 1)
          .map(_._4).sorted
        val want = win((win.length + 1) / 2 - 1) / 100.0
        val (_, ts, eid, _) = series(i)
        assert(got((path, ts, eid)) === want, s"($path,$ts,$eid)")
      }
    }
  }

  test("series_ewma agrees with a driver-side power-of-two weighted recount") {
    val got = Series.ewma(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val byPath = Tables.metrics(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1)
    byPath.foreach { case (path, xs) =>
      val series = xs.sortBy(x => (x._2, x._3))
      series.indices.foreach { i =>
        val win = series.slice(math.max(0, i - (Series.EwmaPoints - 1)), i + 1).map(_._4)
        val num = win.zipWithIndex.map { case (c, j) => c * (1L << j) }.sum
        val den = (1L << win.length) - 1
        val want = BigDecimal(num / (den * 100.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (_, ts, eid, _) = series(i)
        assert(got((path, ts, eid)) === want, s"($path,$ts,$eid)")
        // newest point dominates: ewma is within half a window-max of it
        assert(math.abs(got((path, ts, eid)) - win.last / 100.0)
          <= win.map(_.abs).max / 100.0)
      }
    }
  }

  test("series_timeshift: totals ride summarize's buckets, deltas and ratios check out") {
    val sums = Series.summarize(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val rows = Series.timeShift(spark, Sf).collect()
    assert(rows.length === sums.size, "timeshift must emit one row per summarized bucket")
    var withPrev = 0
    rows.foreach { r =>
      val (path, bucket) = (r.getString(0), r.getLong(1))
      assert(r.getDouble(2) === sums((path, bucket)))
      sums.get((path, bucket - Series.ShiftSec)) match {
        case Some(prev) =>
          withPrev += 1
          assert(r.getDouble(3) === prev)
          assert(math.abs(r.getDouble(4) - (r.getDouble(2) - prev)) < 1e-9)
          if (prev != 0.0)
            assert(math.abs(r.getDouble(5) - r.getDouble(2) * 100 / prev) < 1e-4)
          else assert(r.isNullAt(5))
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      }
    }
    assert(withPrev > 0, "fixture has no hour-adjacent buckets — test is vacuous")
  }

  test("series_holt_forecast agrees with a driver-side integer fold, floor shifts on negatives") {
    val got = Series.holtForecast(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val byPath = Tables.metrics(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1)
    var negSeen = false
    byPath.foreach { case (path, xs) =>
      val series = xs.sortBy(x => (x._2, x._3))
      series.indices.foreach { i =>
        val win = series.slice(math.max(0, i - (Series.HoltPoints - 1)), i + 1).map(_._4)
        var s = win.head * Series.HoltScale
        var b = 0L
        win.tail.foreach { c =>
          val s2 = (c * Series.HoltScale + s + b) >> 1
          b = ((s2 - s) >> 1) + (b >> 1)
          if (b < 0) negSeen = true
          s = s2
        }
        val want = BigDecimal((s + b) / (Series.HoltScale * 100.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (_, ts, eid, _) = series(i)
        assert(got((path, ts, eid)) === want, s"($path,$ts,$eid)")
      }
    }
    assert(negSeen, "no negative trend state anywhere — the floor-shift clause is untested")
  }

  test("series_group_by_node: groups cover the summarize frame and conserve the exact total") {
    val sums = Series.summarize(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = Series.groupByNode(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val want = sums.groupBy { case (p, b, _, _) => (p.split("\\.")(Series.GroupNode), b) }
    assert(got.keySet === want.keySet)
    want.foreach { case (k, xs) =>
      val (nSeries, nPoints, total) = got(k)
      assert(nSeries === xs.map(_._1).distinct.size.toLong, s"$k n_series")
      assert(nPoints === xs.map(_._3).sum, s"$k n_points")
      assert(math.abs(total - xs.map(_._4).sum) < 1e-6, s"$k total")
    }
    // the node really collapses: fewer groups than series-buckets
    assert(got.size < sums.length)
  }

  test("series_anomaly agrees with a driver-side exact z-score recount") {
    val got = Series.anomaly(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getBoolean(4)).toMap
    assert(got.values.count(identity) > 0, "no anomalies flagged — fixture change?")
    val pts = Tables.metrics(spark, Sf).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2), r.getLong(3)))
    val byPath = pts.groupBy(_._1)
    byPath.foreach { case (path, xs) =>
      val n = BigInt(xs.length)
      val s = xs.map(x => BigInt(x._2)).sum
      val q = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val den = n * q - s * s
      xs.foreach { case (_, cents, ts, eid) =>
        val num = n * BigInt(cents) - s
        val want = den > 0 && num * num > BigInt(Series.ZThresh * Series.ZThresh) * den
        assert(got((path, ts, eid)) === want, s"($path,$ts,$eid)")
      }
    }
  }
}
