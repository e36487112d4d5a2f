package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{RollupConfig, RollupConfigFile, RollupMethod}

/** Round-8 config front door: yaml files with the reference's
  * `rollups:` shape load into the SAME defs the code embeds, drive a
  * real two-file reload through redispatch, and every LoadRollups
  * validation rule rejects what the reference rejects.
  */
class Round8ConfigSpec extends AnyFunSuite with TestSpark {

  /** [[RollupConfig.reference]], as a user writes it (the template's
    * format, config/cassabon.yaml.template:58-107).
    */
  private val referenceYaml =
    """rollups:
      |  '^servers\.click\..*':
      |    retention:
      |      - 1m:2h
      |      - 1h:1w
      |      - 24h:90d
      |    aggregation: sum
      |  '^servers\.error\..*':
      |    retention: [ 1m:2h, 1h:1w ]
      |    aggregation: MAX
      |  '^servers\.purchase\..*':
      |    retention: [ 5m:1d, 1h:30d ]
      |    aggregation: sum
      |  '^servers\.signup\..*':
      |    retention: [ 1h:30d ]
      |    aggregation: last
      |  '^servers\..*\.u[0-3]$':
      |    retention: [ 1h:1w ]
      |    aggregation: min
      |  default:
      |    retention: [ 10m:1d, 1h:30d, 24h:1y ]
      |    aggregation: average
      |""".stripMargin

  private val reloadedYaml =
    """rollups:
      |  '^servers\.click\..*':
      |    retention: [ 1m:2h, 1h:1w, 24h:90d ]
      |    aggregation: sum
      |  '^servers\.purchase\..*':
      |    retention: [ 1h:30d ]
      |    aggregation: sum
      |  '^servers\.signup\.u[4-7]$':
      |    retention: [ 5m:1d ]
      |    aggregation: sum
      |  '^servers\.signup\..*':
      |    retention: [ 1h:30d ]
      |    aggregation: last
      |  '^servers\..*\.u[0-3]$':
      |    retention: [ 1h:1w ]
      |    aggregation: min
      |  default:
      |    retention: [ 10m:1d, 1h:30d, 24h:1y ]
      |    aggregation: average
      |""".stripMargin

  private def write(text: String): String = {
    val f = Files.createTempFile("rollups", ".yaml")
    Files.write(f, text.getBytes("UTF-8"))
    f.toString
  }

  test("the reference config yaml loads to exactly the embedded defs, in priority order") {
    val loaded = RollupConfigFile.load(write(referenceYaml))
    assert(loaded.clean)
    assert(loaded.defs == RollupConfig.reference,
      "file-loaded defs differ from the embedded reference config")
  }

  test("a two-file reload drives redispatch identically to the registered operator") {
    val oldCfg = RollupConfigFile.load(write(referenceYaml))
    val newCfg = RollupConfigFile.load(write(reloadedYaml))
    assert(oldCfg.clean && newCfg.clean)
    assert(newCfg.defs == RollupConfig.reloaded)
    val fromFiles = graft.operators.Rollups
      .redispatchBetween(spark, Sf, oldCfg.defs, newCfg.defs)
      .collect().map(_.toString).sorted
    val registered = graft.operators.Rollups.redispatch(spark, Sf)
      .collect().map(_.toString).sorted
    assert(fromFiles.sameElements(registered))
  }

  test("window durations parse as Go ParseDuration compounds; retention as m/h/d/w/y") {
    import RollupConfigFile.{parseWindowSec, parseRetentionSec}
    assert(parseWindowSec("6s").contains(6L))
    assert(parseWindowSec("90m").contains(5400L))
    assert(parseWindowSec("1h30m").contains(5400L))
    assert(parseWindowSec("500ms").contains(0L)) // floors below 1 s -> min check rejects
    assert(parseWindowSec("1d").isEmpty)         // Go ParseDuration has no days
    assert(parseWindowSec("bogus").isEmpty)
    assert(parseRetentionSec("30m").contains(1800L))
    assert(parseRetentionSec("1y").contains(31536000L))
    assert(parseRetentionSec("3w").contains(1814400L))
    assert(parseRetentionSec("30s").isEmpty)     // the reference's units have no seconds
  }

  test("every LoadRollups validation rejects what the reference rejects") {
    def loadOne(body: String): RollupConfigFile.Loaded =
      RollupConfigFile.parse(s"rollups:\n$body")
    // invalid aggregation method
    val badAgg = loadOne(
      "  '^a.*':\n    retention: [ 1m:1h ]\n    aggregation: median\n")
    assert(!badAgg.clean && !badAgg.defs.exists(_.key == "^a.*"))
    // malformed regex
    val badRe = loadOne(
      "  '^a[':\n    retention: [ 1m:1h ]\n    aggregation: sum\n")
    assert(!badRe.clean && !badRe.defs.exists(_.key == "^a["))
    // sub-second window
    val badWin = loadOne(
      "  '^a.*':\n    retention: [ 500ms:1h ]\n    aggregation: sum\n")
    assert(!badWin.clean && !badWin.defs.exists(_.key == "^a.*"))
    // windows not multiples of the shortest (90s % 60s != 0)
    val badMult = loadOne(
      "  '^a.*':\n    retention: [ 1m:1h, 90s:1d ]\n    aggregation: sum\n")
    assert(!badMult.clean && !badMult.defs.exists(_.key == "^a.*"))
    // two windows sharing a retention table
    val dupTable = loadOne(
      "  '^a.*':\n    retention: [ 1m:1h, 2m:60m ]\n    aggregation: sum\n")
    assert(!dupTable.clean && !dupTable.defs.exists(_.key == "^a.*"))
  }

  test("a catchall-only config dispatches every path to default — the minimal cassabon config") {
    // the minimal legal config is just a `default:` section; it must not
    // crash the reload path (exprKeyFor used to take .head of zero
    // non-catchall expressions)
    val only = RollupConfigFile.parse(
      "rollups:\n  default:\n    retention: [ 10m:1d ]\n    aggregation: average\n")
    assert(only.clean && only.defs.map(_.key) == Seq(RollupConfig.Catchall))
    val moved = graft.operators.Rollups
      .redispatchBetween(spark, Sf, RollupConfig.reference, only.defs)
      .collect()
    assert(moved.forall(_.getString(1) == RollupConfig.Catchall),
      "every path must re-dispatch to the catchall under a catchall-only config")
  }

  test("a missing default injects the reference fallback: average 10s:1h + 1m:30d") {
    val loaded = RollupConfigFile.parse(
      "rollups:\n  '^a.*':\n    retention: [ 1m:1h ]\n    aggregation: sum\n")
    val d = loaded.defs.last
    assert(d.isCatchall && d.method == RollupMethod.Average)
    assert(d.windows.map(w => (w.windowSec, w.retentionSec)) ==
      Seq((10L, 3600L), (60L, 2592000L)))
  }
}
