package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{RollupConfig, Tables}
import graft.operators.Rollups

class RollupSpec extends AnyFunSuite with TestSpark {

  test("priority order: longer regex first, catchall last (config/util.go ByPriority)") {
    val keys = RollupConfig.reference.map(_.key)
    assert(keys.last === RollupConfig.Catchall)
    val lens = keys.dropRight(1).map(_.length)
    assert(lens === lens.sortBy(-_), "non-catchall expressions must be length-descending")
  }

  test("dispatch agrees with a direct Java-regex first-match evaluation") {
    val gotPairs = Rollups.dispatch(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    gotPairs.foreach { case (path, expr) =>
      val expected = RollupConfig.reference
        .find(d => !d.isCatchall &&
          java.util.regex.Pattern.compile(d.key).matcher(path).find())
        .map(_.key).getOrElse(RollupConfig.Catchall)
      assert(expr === expected, s"path $path")
    }
    assert(gotPairs.nonEmpty)
  }

  test("windowed rollup: stat_time is the window close boundary; avg matches by hand") {
    import spark.implicits._
    // one path, points at 10, 59 (window closing 60) and 60 (window closing 120)
    val m = Seq(
      ("p", 2.0, 10L, 1L), ("p", 4.0, 59L, 2L), ("p", 10.0, 60L, 3L)
    ).toDF("path", "value", "ts", "event_id")
    val got = m.groupBy(col("path"), (col("ts") - col("ts") % 60 + 60).as("stat_time"))
      .agg(round(avg("value"), 6).as("stat"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(60L -> 3.0, 120L -> 10.0))
  }

  test("rollup_multi: every row's table belongs to the path's matched expression") {
    val rows = Rollups.rollups(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tbl, path) = (r.getString(0), r.getString(1))
      val d = RollupConfig.reference
        .find(d => !d.isCatchall &&
          java.util.regex.Pattern.compile(d.key).matcher(path).find())
        .getOrElse(RollupConfig.reference.last)
      assert(d.windows.map(_.table).contains(tbl), s"$path wrote to foreign table $tbl")
    }
  }

  test("LAST rollup picks the latest (ts, event_id) value") {
    import spark.implicits._
    val m = Seq(
      ("p", 1.0, 100L, 1L), ("p", 9.0, 100L, 2L), ("p", 5.0, 90L, 3L)
    ).toDF("path", "value", "ts", "event_id")
    val got = m.groupBy("path")
      .agg(expr(s"max_by(value, ts * ${RollupConfig.LastKeyShift} + event_id)").as("stat"))
      .collect().head.getDouble(1)
    assert(got === 9.0) // ts tie broken by event_id
  }
}
