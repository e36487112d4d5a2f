package graft.model

/** The peer-list front door: `config.ValidatePeerList`
  * (reference config/config_parser.go:170-188) reproduced edge-for-edge —
  * the gate `processPeerCommand` applies to a wire-delivered
  * `<<peerlist={json}>>` before flushing and re-dispatching
  * (listener/carbon_plaintext.go:258-283). Same front-door pattern as
  * [[RollupConfigFile]]: a deployment's config surface modeled exactly,
  * spec-pinned, exercised by Demo.
  *
  * Reference semantics mirrored:
  *  - an EMPTY peer map is rejected ("No peers in peer list");
  *  - every map VALUE must be a tcp4 `host:port` (the reference calls
  *    `net.ResolveTCPAddr("tcp4", v)`, which DNS-resolves hostnames; this
  *    engine runs offline, so IPv4 literals are validated exactly —
  *    octets 0-255 — and hostnames syntactically, the one documented
  *    deviation);
  *  - the LOCAL host:port must appear among the values ("Local host:port
  *    %s is not in peer list"), with the reference's exact blank-on-match
  *    loop shape.
  */
object PeerList {

  def validate(localHostPort: String, peers: Map[String, String]): Either[String, Unit] = {
    if (peers.size < 1) return Left("No peers in peer list")
    var local = localHostPort
    for (v <- peers.values) {
      if (!isTcp4HostPort(v))
        return Left(s"""Invalid host:port "$v" in peer list""")
      if (v == local) local = ""
    }
    if (local != "") Left(s"Local host:port $local is not in peer list: $peers")
    else Right(())
  }

  /** tcp4 address syntax: `host:port`, port 0-65535, host an IPv4 literal
    * (octets 0-255) or a hostname (validated syntactically — see class doc).
    */
  private[graft] def isTcp4HostPort(s: String): Boolean = {
    val i = s.lastIndexOf(':')
    if (i <= 0 || i == s.length - 1) return false
    val (h, p) = (s.take(i), s.drop(i + 1))
    val portOk = p.forall(_.isDigit) && p.length <= 5 && p.toInt <= 65535
    val ipv4 = h.matches("""\d{1,3}(\.\d{1,3}){3}""")
    val hostOk =
      if (ipv4) h.split("\\.").forall(_.toInt <= 255)
      else h.nonEmpty && !h.contains(':') &&
        h.matches("""[A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?(\.[A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?)*""")
    portOk && hostOk
  }

  /** Parse a wire peerlist payload — the `{"name":"host:port",...}` JSON
    * map the listener receives (PropagatePeerList marshals a
    * map[string]string with no escapes, so a simple-string parse is
    * faithful; anything shape-violating returns None, which the caller
    * treats as the reference's unmarshal error path).
    */
  def parseWirePayload(payload: String): Option[Map[String, String]] = {
    val t = payload.trim
    if (!t.startsWith("{") || !t.endsWith("}")) return None
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) return Some(Map.empty)
    val pair = """"([^"]*)"\s*:\s*"([^"]*)"""".r
    val pairs = pair.findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toSeq
    // reject payloads with non-pair residue (malformed JSON): blank out the
    // matched pairs and require the residue to be exactly pair-separating
    // commas. A comma INSIDE a quoted value is consumed by the pair match
    // (legal), while a trailing comma leaves an empty residue token
    // (malformed) — `split(",", -1)` keeps that trailing token, where the
    // default split would drop it and wave the payload through.
    val sentinel = "\u0001" // not Unicode whitespace: `strip` keeps it (trim would eat any char <= 0x20)
    val residue = pair.replaceAllIn(body, sentinel).split(",", -1).map(_.strip())
    if (pairs.isEmpty || residue.length != pairs.size || residue.exists(_ != sentinel)) None
    else Some(pairs.toMap)
  }
}
