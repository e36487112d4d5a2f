package graft.model

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Config-file front door: load a cassabon `rollups:` section (yaml; json
  * parses too — it is a yaml subset) into priority-ordered [[RollupDef]]s.
  * Semantics mirror the reference loader exactly
  * (config/config_parser.go:LoadRollups, template
  * config/cassabon.yaml.template:58-107):
  *
  *  - `aggregation` is case-insensitive average/max/min/sum/last; anything
  *    else rejects the expression;
  *  - window durations are Go `time.ParseDuration` compounds of
  *    h/m/s/ms/us/ns units ("90m", "1h30m"), incl. FRACTIONAL terms
  *    ("1.5h" = 5400 s, like ParseDuration), minimum 1 second; sub-second
  *    remainders floor away (this engine's window boundaries are
  *    second-granular where the daemon keeps nanos);
  *  - retention durations are `<int><unit>` with units m/h/d/w/y (note: NO
  *    seconds), matched UNANCHORED like the reference's
  *    `FindStringSubmatch` — "30dxyz" reads as 30d, quirk included;
  *  - an expression whose retention list is empty is silently dropped
  *    with `configIsClean` untouched (LoadRollups `len(rd.Windows) > 0`
  *    guard — only PAIR-level parse errors dirty the config);
  *  - windows sort ascending, every window must be an exact multiple of
  *    the shortest, and no two windows may share a retention table —
  *    violations reject the whole expression;
  *  - non-catchall keys must compile as regexes;
  *  - a missing (or rejected) `default` injects the reference's fallback:
  *    average over 10s:1h + 1m:30d (config_parser.go:LoadRollups tail);
  *  - priority order is ByPriority (config/util.go): longer regex first,
  *    same length lexical, catchall last.
  *
  * Rejections are RETURNED, not just logged — [[Loaded.clean]] is the
  * reference's `configIsClean`, so a deployment can refuse a dirty reload
  * while a lenient one proceeds with the surviving expressions, exactly
  * the daemon's behavior.
  */
object RollupConfigFile {

  final case class Rejected(expression: String, reason: String)

  final case class Loaded(defs: Seq[RollupDef], rejected: Seq[Rejected]) {
    /** The reference's `configIsClean`: no expression was dropped. */
    def clean: Boolean = rejected.isEmpty
  }

  def load(path: String): Loaded =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Go `time.ParseDuration` for the units a rollup window can use:
    * one or more `<number><unit>` terms, unit in h/m/s/ms/us/ns, number
    * possibly fractional ("1.5h", ".5m" — ParseDuration accepts both).
    * Returns whole seconds, flooring sub-second remainders (a window
    * < 1 s floors to 0 and the minimum check rejects it, mirroring the
    * reference's `window < time.Second`). Signed durations ("-1h", Go
    * accepts them) are treated as malformed here — the reference would
    * reject them one line later on the same 1 s minimum, so the
    * observable outcome (pair rejected, config dirty) is identical.
    */
  private[graft] def parseWindowSec(s: String): Option[Long] = {
    val term = "([0-9]+(?:\\.[0-9]*)?|\\.[0-9]+)(ns|us|ms|h|m|s)".r
    val terms = term.findAllMatchIn(s).toSeq
    if (terms.isEmpty || terms.map(_.matched).mkString != s) None
    else {
      val nanos = terms.map { m =>
        val n = m.group(1).toDouble
        m.group(2) match {
          case "h" => n * 3600e9
          case "m" => n * 60e9
          case "s" => n * 1e9
          case "ms" => n * 1e6
          case "us" => n * 1e3
          case "ns" => n
        }
      }.sum
      Some((nanos / 1e9).toLong)
    }
  }

  /** The reference's manual retention parse: `([0-9]+)([a-z])` via
    * `FindStringSubmatch` — UNANCHORED, so the first `<int><letter>` run
    * anywhere in the string wins ("30dxyz" → 30d, "1h30m" → 1h) — then
    * unit must be one of m/h/d/w/y or the pair rejects.
    */
  private[graft] def parseRetentionSec(s: String): Option[Long] = {
    val re = "([0-9]+)([a-z])".r
    re.findFirstMatchIn(s).flatMap { m =>
      val mult = m.group(2) match {
        case "m" => Some(60L)
        case "h" => Some(3600L)
        case "d" => Some(86400L)
        case "w" => Some(604800L)
        case "y" => Some(31536000L)
        case _ => None
      }
      mult.map(_ * m.group(1).toLong)
    }
  }

  def parse(text: String): Loaded = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(text)
    // accept either a full cassabon config (rollups under `rollups:`) or
    // a bare rollups map
    val rollups = Option(root.get("rollups")).getOrElse(root)
    require(rollups != null && rollups.isObject,
      "config has no rollups mapping (expected `rollups:` or a bare map)")

    val rejected = Seq.newBuilder[Rejected]
    val defs = rollups.properties().asScala.toSeq.flatMap { e =>
      val (key, node) = (e.getKey, e.getValue)
      def reject(reason: String): Option[RollupDef] = {
        rejected += Rejected(key, reason); None
      }
      val method = Option(node.get("aggregation")).map(_.asText.toLowerCase)
        .flatMap(m => RollupMethod.all.find(_.name == m))
      val regexOk = key == RollupConfig.Catchall ||
        scala.util.Try(java.util.regex.Pattern.compile(key)).isSuccess
      if (method.isEmpty) reject("invalid aggregation method")
      else if (!regexOk) reject("malformed regular expression")
      else {
        val pairs = Option(node.get("retention")).toSeq
          .flatMap(_.elements().asScala).map(_.asText)
        val windows = pairs.flatMap { s =>
          s.split(":") match {
            case Array(w, r) =>
              (parseWindowSec(w), parseRetentionSec(r)) match {
                case (Some(ws), Some(rs)) if ws >= 1 => Some(RollupWindow(ws, rs))
                case _ => rejected += Rejected(key, s"malformed pair: $s"); None
              }
            case _ => rejected += Rejected(key, s"malformed pair: $s"); None
          }
        }.sortBy(_.windowSec)
        // empty window list: the reference's `len(rd.Windows) > 0` guard
        // drops the expression SILENTLY — configIsClean only goes false for
        // pair-level errors (already recorded above), not for an empty or
        // fully-absent retention list
        if (windows.isEmpty) None
        else {
          val shortest = windows.head.windowSec
          if (windows.exists(_.windowSec % shortest != 0))
            reject("window not a multiple of the shortest")
          else if (windows.map(_.table).distinct.size != windows.size)
            reject("duplicate retention table")
          else Some(RollupDef(key, method.get, windows))
        }
      }
    }
    // reference fallback: no surviving catchall -> inject average 10s:1h + 1m:30d
    val withDefault =
      if (defs.exists(_.isCatchall)) defs
      else defs :+ RollupDef(RollupConfig.Catchall, RollupMethod.Average,
        Seq(RollupWindow(10, 3600), RollupWindow(60, 2592000)))
    Loaded(RollupConfig.byPriority(withDefault), rejected.result())
  }
}
