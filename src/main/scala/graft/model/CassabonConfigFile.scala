package graft.model

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** FULL cassabon.yaml front door — the whole-file companion to
  * [[RollupConfigFile]] (which owns the `rollups:` section). Shapes and
  * sanitation mirror config/config_parser.go exactly:
  *
  *  - channel capacities clamp to [10, 1000] (LoadStartupValues);
  *  - Cassandra keyspace defaults to "cassabon" when empty;
  *  - carbon TCP/UDP listener timeouts clamp to [1, 30] seconds
  *    (LoadRefreshableValues);
  *  - API per-route timeouts floor at 1 second;
  *  - an unspecified carbon listen host ("0.0.0.0") resolves to the first
  *    non-loopback, non-IPv6 local address ([[resolveUnspecified]]);
  *  - the peer list must be non-empty, syntactically valid host:port
  *    entries, and contain the local listen address
  *    ([[validatePeerList]] = ValidatePeerList, same error texts);
  *  - ElasticSearch URLs derive from BaseURL exactly as LoadStartupValues
  *    builds them (map = base/index, put = map/path, search =
  *    put/_search, count = search?search_type=count), index defaulting to
  *    "cassabon". ONE deliberate divergence: a missing BaseURL is an
  *    `Option.empty`, not the reference's process panic — graft's index
  *    lives in the engine (`index_build`), so an ES endpoint is genuinely
  *    optional here where the daemon could not run without one.
  *
  * Peers accept BOTH yaml shapes in the wild: the struct's
  * `map[string]string` and the sequence form the repo's own
  * config_test.yaml uses.
  */
object CassabonConfigFile {

  final case class Statsd(host: String, port: Int,
    receiveOkKey: String, receiveOkRate: Double,
    receiveFailKey: String, receiveFailRate: Double)

  final case class Channels(metricStore: Int, metricRequest: Int,
    indexStore: Int, indexRequest: Int)

  final case class Carbon(listen: String, protocol: String,
    tcpTimeoutSec: Int, udpTimeoutSec: Int, peers: Seq[String])

  final case class Api(listen: String, healthCheckFile: String,
    getIndexSec: Long, deleteIndexSec: Long,
    getMetricSec: Long, deleteMetricSec: Long)

  final case class Cassandra(hosts: Seq[String], port: String,
    keyspace: String, strategy: String, createOpts: String, batchSize: Int)

  final case class ElasticSearch(baseUrl: String, index: String,
    mapUrl: String, putUrl: String, searchUrl: String, countUrl: String)

  final case class Loaded(
    logdir: String, loglevel: String,
    statsd: Statsd, channels: Channels, carbon: Carbon, api: Api,
    cassandra: Cassandra, elasticSearch: Option[ElasticSearch],
    rollups: RollupConfigFile.Loaded)

  def load(path: String): Loaded =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  private def clamp(v: Int, lo: Int, hi: Int): Int = math.max(lo, math.min(hi, v))

  private def at(n: JsonNode, path: String*): Option[JsonNode] =
    path.foldLeft(Option(n)) { (acc, k) => acc.flatMap(x => Option(x.get(k))) }
  private def str(n: JsonNode, path: String*): String =
    at(n, path: _*).map(_.asText).getOrElse("")
  private def int(n: JsonNode, path: String*): Int =
    at(n, path: _*).map(_.asInt).getOrElse(0)
  private def dbl(n: JsonNode, path: String*): Double =
    at(n, path: _*).map(_.asDouble).getOrElse(0.0)
  private def strSeq(n: JsonNode, path: String*): Seq[String] =
    at(n, path: _*).toSeq.flatMap { node =>
      if (node.isArray) node.elements().asScala.map(_.asText).toSeq
      else if (node.isObject) node.properties().asScala.map(_.getValue.asText).toSeq
      else Seq(node.asText)
    }

  def parse(text: String): Loaded = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(text)
    require(root != null && root.isObject, "config is not a yaml mapping")

    val statsd = Statsd(
      str(root, "statsd", "host"), int(root, "statsd", "port"),
      str(root, "statsd", "events", "receiveok", "key"),
      dbl(root, "statsd", "events", "receiveok", "samplerate"),
      str(root, "statsd", "events", "receivefail", "key"),
      dbl(root, "statsd", "events", "receivefail", "samplerate"))

    val channels = Channels(
      clamp(int(root, "channels", "metricstorechanlen"), 10, 1000),
      clamp(int(root, "channels", "metricrequestchanlen"), 10, 1000),
      clamp(int(root, "channels", "indexstorechanlen"), 10, 1000),
      clamp(int(root, "channels", "indexrequestchanlen"), 10, 1000))

    val carbon = Carbon(
      str(root, "carbon", "listen"),
      str(root, "carbon", "protocol"),
      clamp(int(root, "carbon", "parameters", "tcptimeout"), 1, 30),
      clamp(int(root, "carbon", "parameters", "udptimeout"), 1, 30),
      strSeq(root, "carbon", "peers"))

    val api = Api(
      str(root, "api", "listen"), str(root, "api", "healthcheckfile"),
      math.max(1, int(root, "api", "timeouts", "getindex")).toLong,
      math.max(1, int(root, "api", "timeouts", "deleteindex")).toLong,
      math.max(1, int(root, "api", "timeouts", "getmetric")).toLong,
      math.max(1, int(root, "api", "timeouts", "deletemetric")).toLong)

    val keyspace0 = str(root, "cassandra", "keyspace")
    val cassandra = Cassandra(
      strSeq(root, "cassandra", "hosts"),
      str(root, "cassandra", "port"),
      if (keyspace0.isEmpty) "cassabon" else keyspace0,
      str(root, "cassandra", "strategy"),
      str(root, "cassandra", "createopts"),
      int(root, "cassandra", "batchsize"))

    val es = {
      val base = str(root, "elasticsearch", "baseurl")
      if (base.isEmpty) None
      else {
        val idx0 = str(root, "elasticsearch", "index")
        val idx = if (idx0.isEmpty) "cassabon" else idx0
        val mapUrl = s"$base/$idx"
        val putUrl = s"$mapUrl/path"
        val searchUrl = s"$putUrl/_search"
        Some(ElasticSearch(base, idx, mapUrl, putUrl, searchUrl,
          s"$searchUrl?search_type=count"))
      }
    }

    Loaded(
      str(root, "logging", "logdir"), str(root, "logging", "loglevel"),
      statsd, channels, carbon, api, cassandra, es,
      RollupConfigFile.parse(text))
  }

  /** ValidatePeerList (config_parser.go:169-188): non-empty, every entry a
    * syntactically valid host:port, and the local listen address present.
    * Error strings track the reference's.
    */
  def validatePeerList(localHostPort: String, peers: Seq[String]): Either[String, Unit] = {
    if (peers.isEmpty) return Left("No peers in peer list")
    peers.find(p => !isHostPort(p)) match {
      case Some(bad) => Left(s"""Invalid host:port "$bad" in peer list""")
      case None =>
        if (peers.contains(localHostPort)) Right(())
        else Left(s"Local host:port $localHostPort is not in peer list: " +
          peers.mkString("[", ", ", "]"))
    }
  }

  private def isHostPort(s: String): Boolean = s.lastIndexOf(':') match {
    case -1 => false
    case i =>
      val (host, port) = (s.take(i), s.drop(i + 1))
      host.nonEmpty && port.nonEmpty && port.forall(_.isDigit) &&
        scala.util.Try(port.toInt).toOption.exists(p => p >= 1 && p <= 65535)
  }

  /** The 0.0.0.0 substitution (LoadRefreshableValues): an unspecified
    * listen host becomes the first non-loopback, non-IPv6 local interface
    * address; anything else passes through unchanged.
    */
  def resolveUnspecified(listen: String): String = listen.lastIndexOf(':') match {
    case -1 => listen
    case i =>
      val (host, port) = (listen.take(i), listen.drop(i + 1))
      val unspec = scala.util.Try(
        java.net.InetAddress.getByName(host).isAnyLocalAddress).getOrElse(false)
      if (!unspec) listen
      else {
        val candidates = java.net.NetworkInterface.getNetworkInterfaces.asScala
          .flatMap(_.getInetAddresses.asScala)
          .filter(a => !a.isLoopbackAddress && a.isInstanceOf[java.net.Inet4Address])
          .map(_.getHostAddress)
          .toSeq
        candidates.headOption.map(h => s"$h:$port").getOrElse(listen)
      }
  }
}
