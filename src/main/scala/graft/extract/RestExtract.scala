package graft.extract

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** REST-extraction layer (SURVEY §2.1 S5–S8, §2.12 O7, §2.3 J5) —
  * deterministic re-implementation of the reference's dlt-based ingestion
  * runner (lambdas/ingestion_agent/agents/ingestion_agent/runner.py and
  * models.py:73-149). Pure driver-side Scala: pagination is inherently a
  * sequential HTTP loop; the extracted records then enter the distributed
  * engine via `spark.read.json(spark.createDataset(records))`.
  *
  * HTTP itself is abstracted behind `Fetcher` (this environment has zero
  * egress); tests replay recorded fixture pages.
  */
object RestExtract {
  /** Body-only transport (legacy shape; headers lost). */
  type Fetcher = String => String

  /** Full transport: request with headers in, body + response headers
    * out. Response header NAMES are matched case-insensitively. */
  final case class Request(url: String, headers: Map[String, String] = Map.empty)
  final case class Response(body: String, headers: Map[String, String] = Map.empty)
  type HttpFetcher = Request => Response

  private val mapper = new ObjectMapper()

  /** Pagination strategies (models.py:73-149): the seven documented
    * `PaginationConfig.type` values plus the two extra types the
    * reference's `_DLT_VALID_FIELDS` passthrough accepts (`json_response`
    * ≡ body cursor, `header_cursor`). */
  sealed trait Pagination
  case object SinglePage extends Pagination
  /** follow a next-URL found at `nextUrlPath` (dot path) in the body */
  final case class JsonLink(nextUrlPath: String) extends Pagination
  /** `totalPath` (models.py:91-97): dot path to the body's declared TOTAL
    * PAGE COUNT — pagination stops once that many pages are fetched, even
    * if the final page is full (an API that 404s past the end would
    * otherwise surface the error instead of terminating). */
  final case class PageNumber(param: String = "page", start: Int = 1,
      maxPages: Int = 1000, totalPath: Option[String] = None) extends Pagination
  /** `totalPath`: dot path to the body's declared TOTAL ITEM COUNT —
    * stops once the next offset reaches it. */
  final case class Offset(param: String = "offset", limit: Int = 100,
      limitParam: String = "limit", totalPath: Option[String] = None)
      extends Pagination
  /** Body-cursor pagination. The reference's accepted set
    * (models.py:124-133 `_DLT_VALID_FIELDS`) also admits the alias type
    * `json_response` with the same cursor_path/cursor_param fields —
    * identical semantics, so both map to this case. */
  final case class Cursor(cursorPath: String, param: String = "cursor")
      extends Pagination
  /** Cursor delivered in a response HEADER (the reference's
    * `header_cursor`, models.py:131): `header` names the response header
    * (matched case-insensitively) carrying the next cursor; pagination
    * stops when it is absent or empty. */
  final case class HeaderCursor(header: String, param: String = "cursor")
      extends Pagination
  /** RFC 5988 `Link: <url>; rel="next"` response-header pagination. */
  case object HeaderLink extends Pagination
  /** The reference's DEFAULT (models.py:77): detect from the first page —
    * a well-known body next-URL → json_link; a Link header with
    * rel="next" → header_link; otherwise a single page. */
  case object Auto extends Pagination

  /** Authentication (models.py:181-235: auth_type bearer/api_key/basic/
    * oauth2 + auth_header). Applied as request headers by the fetch
    * composition — the transport stays a pure function. */
  sealed trait Auth
  case object NoAuth extends Auth
  final case class Bearer(token: String, header: String = "Authorization")
      extends Auth
  final case class ApiKey(key: String, header: String = "Authorization")
      extends Auth
  final case class Basic(user: String, password: String) extends Auth
  /** OAuth2 ROPC (models.py OAuth2Config): the token endpoint is called
    * with Basic(client_id:client_secret) and a password-grant form body;
    * the returned access token then authenticates as Bearer. The exchange
    * itself goes through the injected transport (`oauth2Token`). */
  final case class OAuth2(tokenUrl: String, clientId: String,
      clientSecret: String, username: String, password: String) extends Auth

  private def basicValue(user: String, password: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Headers the auth config adds to every request. OAuth2 must be
    * exchanged for a Bearer first (`oauth2Token`). */
  def authHeaders(auth: Auth): Map[String, String] = auth match {
    case NoAuth => Map.empty
    case Bearer(t, h) => Map(h -> s"Bearer $t")
    case ApiKey(k, h) => Map(h -> k)
    case Basic(u, p) => Map("Authorization" -> basicValue(u, p))
    case _: OAuth2 => throw new IllegalArgumentException(
      "OAuth2 must be exchanged for a Bearer token first (oauth2Token)")
  }

  /** ROPC token exchange: POSTs the password-grant form to the token URL
    * (Basic client auth) via the injected transport and returns the plan
    * auth rewritten as Bearer. `post(url, headers, form)` is the only
    * side-effecting step, so tests replay a fixture. */
  def oauth2Token(cfg: OAuth2,
      post: (String, Map[String, String], String) => String): Bearer = {
    val form = Seq(
      "grant_type" -> "password",
      "username" -> cfg.username,
      "password" -> cfg.password)
      .map { case (k, v) => s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }
      .mkString("&")
    val body = post(cfg.tokenUrl,
      Map("Authorization" -> basicValue(cfg.clientId, cfg.clientSecret),
        "Content-Type" -> "application/x-www-form-urlencoded"), form)
    val tok = Option(mapper.readTree(body).get("access_token"))
      .filter(_.isTextual).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        "token response has no access_token"))
    Bearer(tok)
  }

  final case class Endpoint(
      path: String,
      resourceName: String,
      primaryKey: Option[String] = None,
      dataPath: Option[String] = None,
      params: Map[String, String] = Map.empty,
      isCollection: Boolean = true)

  final case class IngestionPlan(
      baseUrl: String,
      pagination: Pagination = Auto,
      endpoints: Seq[Endpoint] = Nil,
      auth: Auth = NoAuth)

  /** Dot-path navigation into a JSON tree (runner.py:195-217). */
  def atPath(node: JsonNode, path: String): Option[JsonNode] =
    if (path.isEmpty) Option(node)
    else path.split('.').foldLeft(Option(node)) { (acc, seg) =>
      acc.flatMap(n => Option(n.get(seg)))
    }

  /** Extract the record array at `dataPath` ("" = the body itself). */
  def extractData(body: JsonNode, dataPath: String): Seq[JsonNode] =
    atPath(body, dataPath) match {
      case Some(arr) if arr.isArray => arr.elements().asScala.toSeq
      case Some(obj) if obj.isObject => Seq(obj) // single object resource
      case _ => Nil
    }

  /** Well-known wrapper keys, in the reference's preference order
    * (runner.py:221-225 `_PREFERRED_DATA_KEYS`). */
  private val preferredKeys = Seq("results", "data", "items", "records",
    "entries", "content", "hits", "objects", "rows", "values")

  /** Auto-detect the data array (runner.py:227-289), faithfully:
    * 1. a list body → path "" as-is;
    * 2. top-level non-empty arrays-of-objects: exactly one → take it;
    * 3. several → first preferred name, else the largest;
    * 4. none → one level deeper, first hit in field order;
    * 5. still none → a non-empty object is a single record at path "". */
  def detectDataPath(body: JsonNode): Option[(String, Seq[JsonNode])] = {
    def candidate(n: JsonNode): Boolean =
      n != null && n.isArray && n.size() > 0 && n.get(0).isObject

    if (body.isArray)
      return Some(("", body.elements().asScala.toSeq))
    if (!body.isObject) return None

    val candidates = body.properties().asScala.toSeq
      .filter(e => candidate(e.getValue))
      .map(e => (e.getKey, e.getValue.elements().asScala.toSeq))

    if (candidates.size == 1) Some(candidates.head)
    else if (candidates.size > 1) {
      preferredKeys.collectFirst {
        case k if candidates.exists(_._1 == k) => candidates.find(_._1 == k).get
      }.orElse(Some(candidates.maxBy(_._2.size)))
    } else {
      // one level deep: first object field containing an array-of-objects
      body.properties().asScala.toSeq.filter(_.getValue.isObject)
        .flatMap { e =>
          e.getValue.properties().asScala.toSeq.collectFirst {
            case f if candidate(f.getValue) =>
              (s"${e.getKey}.${f.getKey}", f.getValue.elements().asScala.toSeq)
          }
        }.headOption
        // no nested arrays either — whole response is one record
        .orElse(if (body.size() > 0) Some(("", Seq(body))) else None)
    }
  }

  /** PK-detection heuristic (runner.py:292-337):
    * id → {singular}_id → unique *_id → name → url. The depluralization
    * here is the reference's `rstrip("s")` (strip ALL trailing s), which
    * differs from the fuzzy-match normalizer below — kept faithful. */
  def detectPrimaryKey(resourceName: String, sampleFields: Seq[String]): Option[String] = {
    val fields = sampleFields.toSet
    val singular = resourceName.replaceAll("s+$", "")
    if (fields.contains("id")) Some("id")
    else if (singular.nonEmpty && fields.contains(s"${singular}_id"))
      Some(s"${singular}_id")
    else {
      val idFields = sampleFields.filter(_.endsWith("_id"))
      if (idFields.size == 1) Some(idFields.head)
      else if (fields.contains("name")) Some("name")
      else if (fields.contains("url")) Some("url")
      else None
    }
  }

  /** Plural normalization (runner.py:560-576 `_normalize_name`): each
    * underscore segment independently; ies→y (len>3), ses→drop one
    * (len>3), trailing s (not ss, len>2) → drop. */
  def singularize(name: String): String =
    name.split('_').map { part =>
      if (part.endsWith("ies") && part.length > 3) part.dropRight(3) + "y"
      else if (part.endsWith("ses") && part.length > 3) part.dropRight(1)
      else if (part.endsWith("s") && !part.endsWith("ss") && part.length > 2)
        part.dropRight(1)
      else part
    }.mkString("_")

  /** Ratcliff/Obershelp similarity (difflib.SequenceMatcher.ratio) — used
    * to dedupe near-identical endpoint names at ≥0.8 (runner.py:560-611). */
  def similarity(a: String, b: String): Double = {
    def matches(a: String, b: String): Int = {
      if (a.isEmpty || b.isEmpty) return 0
      // longest common substring
      var best = (0, 0, 0) // lenA start, lenB start, len
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best._3) best = (i - dp(i)(j), j - dp(i)(j), dp(i)(j))
        }
      val (sa, sb, len) = best
      if (len == 0) 0
      else len + matches(a.substring(0, sa), b.substring(0, sb)) +
        matches(a.substring(sa + len), b.substring(sb + len))
    }
    if (a.isEmpty && b.isEmpty) 1.0
    else 2.0 * matches(a, b) / (a.length + b.length)
  }

  def namesMatch(a: String, b: String): Boolean =
    similarity(singularize(a.toLowerCase), singularize(b.toLowerCase)) >= 0.8

  /** First URL in a case-insensitive `Link` header with rel="next"
    * (RFC 5988: `<url>; rel="next", <url2>; rel="prev", ...`).
    *
    * Segments run from each `<url>` to the next `<` (URLs cannot contain
    * `<`/`>`), so a comma INSIDE a quoted param value — e.g.
    * `title="a, b"` — cannot truncate the param list the way a
    * split-on-comma parse would. rel matching tolerates whitespace
    * around `=` and finds `next` among space-separated rel values
    * (`rel="next last"`). */
  private[graft] def nextFromLinkHeader(headers: Map[String, String]): Option[String] = {
    val segRe = """<([^>]*)>([^<]*)""".r
    val relRe = """(?i)(?:^|;)\s*rel\s*=\s*("[^"]*"|[^;,"]*)""".r
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase("link") => v }
      .flatMap { value =>
        segRe.findAllMatchIn(value).collectFirst {
          case m if relRe.findFirstMatchIn(m.group(2)).exists { r =>
            r.group(1).replace("\"", "").trim.toLowerCase
              .split("\\s+").contains("next")
          } => m.group(1)
        }.filter(_.nonEmpty)
      }
  }

  /** Well-known body locations of a next-page URL, in the order the
    * reference documents them (models.py:87-89). */
  private val autoNextPaths = Seq("next", "info.next", "paging.next", "links.next")

  /** Auto-detection (the reference's default paginator type): a textual
    * next-URL at a well-known body path → json_link; a Link header with
    * rel="next" → header_link; otherwise single page. */
  private[extract] def detectPagination(body: JsonNode,
      headers: Map[String, String]): Pagination =
    autoNextPaths.collectFirst {
      case p if atPath(body, p).exists(n => n.isTextual
        && n.asText().startsWith("http")) => JsonLink(p): Pagination
    }.getOrElse(
      if (nextFromLinkHeader(headers).isDefined) HeaderLink else SinglePage)

  /** Run one endpoint's pagination loop (body-only transport). The
    * legacy Fetcher cannot carry request headers, so an authed plan here
    * would silently go out unauthenticated (a 401 body parses as an
    * empty page — no signal at all); refuse loudly instead. */
  def fetchEndpoint(plan: IngestionPlan, ep: Endpoint, fetch: Fetcher,
      maxPages: Int = 1000): Seq[String] = {
    require(plan.auth == NoAuth,
      "plan has auth configured; use fetchEndpointHttp (a body-only " +
        "Fetcher cannot carry auth headers)")
    fetchEndpointHttp(plan, ep, req => Response(fetch(req.url)), maxPages)
  }

  /** Run one endpoint's pagination loop, returning raw record JSON. The
    * plan's auth headers ride on every request; `auto` pagination is
    * resolved ONCE from the first page and then pinned. */
  def fetchEndpointHttp(plan: IngestionPlan, ep: Endpoint, fetch: HttpFetcher,
      maxPages: Int = 1000): Seq[String] = {
    val auth = authHeaders(plan.auth)
    val first = buildUrl(plan.baseUrl, ep.path, ep.params)
    val out = Seq.newBuilder[String]
    var page = 0
    var url: Option[String] = Some(first)
    // like dlt, the data path is resolved ONCE (configured, or detected
    // from the first page) and then applied to every page — a later page
    // whose wrapper array is empty must read as "no records", not fall
    // back to whole-body detection
    var resolvedPath: Option[String] = ep.dataPath
    var pagination = plan.pagination
    // dot-path value read as a non-negative count (ints or numeric strings)
    def countAt(body: JsonNode, path: String): Option[Long] =
      atPath(body, path).flatMap { n =>
        if (n.isNumber) Some(n.asLong())
        else if (n.isTextual && n.asText().matches("\\d+")) Some(n.asText().toLong)
        else None
      }
    while (url.isDefined && page < maxPages) {
      val resp = fetch(Request(url.get, auth))
      val body = mapper.readTree(resp.body)
      if (pagination == Auto)
        pagination = detectPagination(body, resp.headers)
      if (resolvedPath.isEmpty)
        resolvedPath = Some(detectDataPath(body).map(_._1).getOrElse(""))
      val records = extractData(body, resolvedPath.get)
      records.foreach(r => out += mapper.writeValueAsString(r))
      page += 1
      url = pagination match {
        case SinglePage | Auto => None
        case JsonLink(p) =>
          atPath(body, p).filter(n => n.isTextual && n.asText().nonEmpty)
            .map(_.asText())
        case HeaderLink => nextFromLinkHeader(resp.headers)
        case PageNumber(param, start, mp, totalPath) =>
          // declared page total bounds the loop even when the final page
          // is full (an API that errors past the end never gets hit);
          // without a total, an empty page terminates
          val doneByTotal = totalPath.exists(tp =>
            countAt(body, tp).exists(total => page >= total))
          if (records.isEmpty || doneByTotal || page >= mp) None
          else Some(buildUrl(plan.baseUrl, ep.path,
            ep.params + (param -> (start + page).toString)))
        case Offset(param, limit, limitParam, totalPath) =>
          // declared item total: stop once the next offset reaches it
          val doneByTotal = totalPath.exists(tp =>
            countAt(body, tp).exists(total => page.toLong * limit >= total))
          if (records.size < limit || doneByTotal) None
          else Some(buildUrl(plan.baseUrl, ep.path,
            ep.params ++ Map(param -> (page * limit).toString,
              limitParam -> limit.toString)))
        case Cursor(cursorPath, param) =>
          atPath(body, cursorPath)
            .filter(n => n.isTextual && n.asText().nonEmpty).map(_.asText())
            .map(c => buildUrl(plan.baseUrl, ep.path, ep.params + (param -> c)))
        case HeaderCursor(header, param) =>
          resp.headers.collectFirst {
            case (k, v) if k.equalsIgnoreCase(header) && v.nonEmpty => v
          }.map(c => buildUrl(plan.baseUrl, ep.path, ep.params + (param -> c)))
      }
    }
    out.result()
  }

  /** Batched delivery (S14, runner.py:824-881): slice records into
    * batches (reference default 25 per POST) and hand each batch to the
    * transport. Returns the number of batches delivered. */
  def deliverBatches(records: Seq[String], batchSize: Int = 25)
      (deliver: Seq[String] => Unit): Int = {
    val groups = records.grouped(batchSize).toSeq
    groups.foreach(deliver)
    groups.size
  }

  private def buildUrl(base: String, path: String, params: Map[String, String]): String = {
    val b = base.stripSuffix("/") + "/" + path.stripPrefix("/")
    if (params.isEmpty) b
    else b + "?" + params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
  }
}
