package graft.sources.k8s

/** Minimal kubeconfig resolution for the live watch client — the role
  * clientcmd plays for the reference (k8sclient.go:37-60 builds the
  * clientset from `kubeconfig` or in-cluster config; config.go:11-17
  * carries the `kubeconfig` key). Resolves the three things
  * [[HttpWatchClient]] needs: the API server URL, a bearer token, and a
  * default namespace.
  *
  * Deliberately NOT a YAML engine (no YAML library ships here): it
  * parses the exact block-style subset `kubectl config view` /
  * `kubectl config set-*` write — block mappings, block sequences of
  * mappings, plain or quoted scalars — plus JSON kubeconfigs (kubectl
  * accepts those too). Exotic YAML (flow style, anchors, multi-line
  * scalars) is out of scope and fails loudly rather than mis-parsing.
  *
  * Auth scope: token-based auth only (`user.token` or
  * `user.tokenFile`). Client-certificate and exec-plugin auth are NOT
  * supported — a documented divergence: the in-cluster deployment the
  * reference targets uses a mounted service-account token, which is
  * exactly the token path. A kubeconfig whose selected user carries
  * only client certs resolves with `token = None` (the server will
  * reject if it required auth, which is the honest failure).
  */
object Kubeconfig {

  /** What the watch client needs from a kubeconfig. */
  final case class KubeContext(server: String, token: Option[String],
      namespace: Option[String])

  /** In-cluster convention (public Kubernetes contract): env
    * KUBERNETES_SERVICE_HOST/PORT + the mounted service-account token.
    * `env`/`tokenPath` are injectable for tests. */
  def inCluster(env: Map[String, String] = sys.env,
      tokenPath: String =
        "/var/run/secrets/kubernetes.io/serviceaccount/token"): KubeContext = {
    val host = env.getOrElse("KUBERNETES_SERVICE_HOST",
      throw new IllegalStateException(
        "not in-cluster: KUBERNETES_SERVICE_HOST unset and no kubeconfig given"))
    val port = env.getOrElse("KUBERNETES_SERVICE_PORT", "443")
    val token = {
      val p = java.nio.file.Paths.get(tokenPath)
      if (java.nio.file.Files.isReadable(p))
        Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
      else None
    }
    KubeContext(s"https://$host:$port", token, None)
  }

  def load(path: String): KubeContext =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(text: String): KubeContext = {
    val root: Any =
      if (text.trim.startsWith("{")) jsonToAny(
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(text))
      else MiniYaml.parse(text)
    def m(a: Any): Map[String, Any] = a match {
      case x: Map[_, _] => x.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
    def seq(a: Any): Seq[Any] = a match {
      case x: Seq[_] => x.asInstanceOf[Seq[Any]]
      case _ => Nil
    }
    def str(a: Any): Option[String] = a match {
      case s: String if s.nonEmpty => Some(s)
      case _ => None
    }
    val top = m(root)
    def byName(section: String, name: Option[String]): Map[String, Any] = {
      val items = seq(top.getOrElse(section, Nil)).map(m)
      name match {
        // A named lookup that misses is an ERROR, not a fallback: clientcmd
        // treats a missing context/cluster/user as fatal, and silently
        // connecting to the FIRST cluster with the FIRST user's token on a
        // typo'd current-context would send credentials to the wrong
        // server. headOption is reserved for the no-name case (single-entry
        // kubeconfigs with no current-context).
        case Some(n) =>
          items.find(i => str(i.getOrElse("name", "")).contains(n)).getOrElse(
            throw new IllegalArgumentException(
              s"kubeconfig: no entry named '$n' in '$section'"))
        case None => items.headOption.getOrElse(Map.empty)
      }
    }
    val ctxName = str(top.getOrElse("current-context", ""))
    val ctx = m(byName("contexts", ctxName).getOrElse("context", Map.empty))
    val cluster = m(byName("clusters",
      str(ctx.getOrElse("cluster", ""))).getOrElse("cluster", Map.empty))
    val user = m(byName("users",
      str(ctx.getOrElse("user", ""))).getOrElse("user", Map.empty))
    val server = str(cluster.getOrElse("server", "")).getOrElse(
      throw new IllegalArgumentException(
        "kubeconfig: no cluster.server for the selected context"))
    val token = str(user.getOrElse("token", "")).orElse {
      str(user.getOrElse("tokenFile", "")).flatMap { p =>
        val f = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.isReadable(f))
          Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim)
        else None
      }
    }
    KubeContext(server, token, str(ctx.getOrElse("namespace", "")))
  }

  private def jsonToAny(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isObject) {
      val b = Map.newBuilder[String, Any]
      n.fields().forEachRemaining(e => b += (e.getKey -> jsonToAny(e.getValue)))
      b.result()
    } else if (n.isArray) {
      (0 until n.size).map(i => jsonToAny(n.get(i)))
    } else n.asText("")
}

/** The YAML subset parser behind [[Kubeconfig]]: block mappings, block
  * sequences whose items are mappings or scalars, plain/quoted scalars,
  * comments. Anything else (flow `{}`/`[]` collections, anchors `&`/`*`,
  * block scalars `|`/`>`) throws — mis-parsing a credential file is
  * worse than rejecting it. */
private[k8s] object MiniYaml {

  def parse(text: String): Any = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.replaceAll("\t", "  "), i + 1) }
      .filter { case (l, _) =>
        val t = stripComment(l).trim
        t.nonEmpty && t != "---"
      }
      .map { case (l, i) => (stripComment(l), i) }
      .toVector
    if (lines.isEmpty) Map.empty[String, Any]
    else parseBlock(lines, indentOf(lines.head._1))._1
  }

  private def stripComment(l: String): String = {
    // a '#' starts a comment unless inside quotes; kubeconfig values
    // never contain unquoted '#', keep it simple but quote-aware
    var inS = false; var inD = false
    val b = new StringBuilder
    for (c <- l) {
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD) return b.toString
      b += c
    }
    b.toString
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private def scalar(raw: String, line: Int): String = {
    val t = raw.trim
    if (t.startsWith("&") || t.startsWith("*") || t == "|" || t == ">" ||
        t.startsWith("|-") || t.startsWith(">-"))
      fail(line, s"unsupported YAML feature: '$t'")
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
    else t
  }

  private def fail(line: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"kubeconfig YAML line $line: $msg")

  /** Parse the block starting at `lines.head`, all at indent `ind`.
    * Returns (value, remaining lines). */
  private def parseBlock(lines: Vector[(String, Int)], ind: Int)
      : (Any, Vector[(String, Int)]) = {
    if (lines.head._1.trim.startsWith("- ") || lines.head._1.trim == "-")
      parseSeq(lines, ind)
    else parseMap(lines, ind)
  }

  private def parseMap(lines0: Vector[(String, Int)], ind: Int)
      : (Map[String, Any], Vector[(String, Int)]) = {
    var lines = lines0
    val out = Map.newBuilder[String, Any]
    while (lines.nonEmpty && indentOf(lines.head._1) == ind &&
        !lines.head._1.trim.startsWith("- ")) {
      val (l, ln) = lines.head
      val t = l.trim
      if (t.startsWith("{") || t.startsWith("["))
        fail(ln, "flow-style collections unsupported")
      val colon = t.indexOf(':')
      if (colon < 0) fail(ln, s"expected 'key: value', got '$t'")
      val key = scalar(t.substring(0, colon), ln)
      val rest = t.substring(colon + 1).trim
      lines = lines.tail
      if (rest.nonEmpty) out += (key -> scalar(rest, ln))
      else if (lines.nonEmpty && indentOf(lines.head._1) > ind) {
        val (v, remaining) = parseBlock(lines, indentOf(lines.head._1))
        out += (key -> v); lines = remaining
      } else if (lines.nonEmpty && indentOf(lines.head._1) == ind &&
          lines.head._1.trim.startsWith("- ")) {
        // kubectl writes sequence items at the SAME indent as the key
        val (v, remaining) = parseSeq(lines, ind)
        out += (key -> v); lines = remaining
      } else out += (key -> "")
    }
    if (lines.nonEmpty && indentOf(lines.head._1) > ind)
      fail(lines.head._2, "unexpected indent")
    (out.result(), lines)
  }

  private def parseSeq(lines0: Vector[(String, Int)], ind: Int)
      : (Seq[Any], Vector[(String, Int)]) = {
    var lines = lines0
    val out = Seq.newBuilder[Any]
    while (lines.nonEmpty && indentOf(lines.head._1) == ind &&
        (lines.head._1.trim.startsWith("- ") || lines.head._1.trim == "-")) {
      val (l, ln) = lines.head
      val afterDash = l.substring(ind + 1) // keep column positions: "- x" -> " x"
      if (afterDash.trim.isEmpty) fail(ln, "empty sequence item unsupported")
      val itemFirst = (" " * (ind + 1)) + afterDash
      // Gather the item body: subsequent lines indented DEEPER than the dash.
      var body = Vector((itemFirst, ln))
      lines = lines.tail
      while (lines.nonEmpty && indentOf(lines.head._1) > ind &&
          !(indentOf(lines.head._1) == ind && lines.head._1.trim.startsWith("- "))) {
        body = body :+ lines.head
        lines = lines.tail
      }
      val firstIndent = indentOf(body.head._1)
      val item: Any =
        if (body.length == 1 && !body.head._1.contains(":"))
          scalar(body.head._1, body.head._2)
        else parseBlock(body, firstIndent)._1
      out += item
    }
    (out.result(), lines)
  }
}
