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
  type Fetcher = String => String
  private val mapper = new ObjectMapper()

  /** Pagination strategies (models.py:73-149). */
  sealed trait Pagination
  case object SinglePage extends Pagination
  /** follow a next-URL found at `nextUrlPath` (dot path) in the body */
  final case class JsonLink(nextUrlPath: String) extends Pagination
  final case class PageNumber(param: String = "page", start: Int = 1,
      maxPages: Int = 1000) extends Pagination
  final case class Offset(param: String = "offset", limit: Int = 100,
      limitParam: String = "limit") extends Pagination
  final case class Cursor(cursorPath: String, param: String = "cursor")
      extends Pagination

  final case class Endpoint(
      path: String,
      resourceName: String,
      primaryKey: Option[String] = None,
      dataPath: Option[String] = None,
      params: Map[String, String] = Map.empty,
      isCollection: Boolean = true)

  final case class IngestionPlan(
      baseUrl: String,
      pagination: Pagination = SinglePage,
      endpoints: Seq[Endpoint] = Nil)

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

  /** Run one endpoint's pagination loop, returning raw record JSON. */
  def fetchEndpoint(plan: IngestionPlan, ep: Endpoint, fetch: Fetcher,
      maxPages: Int = 1000): Seq[String] = {
    val first = buildUrl(plan.baseUrl, ep.path, ep.params)
    val out = Seq.newBuilder[String]
    var page = 0
    var url: Option[String] = Some(first)
    var cursorVal: Option[String] = None
    // like dlt, the data path is resolved ONCE (configured, or detected
    // from the first page) and then applied to every page — a later page
    // whose wrapper array is empty must read as "no records", not fall
    // back to whole-body detection
    var resolvedPath: Option[String] = ep.dataPath
    while (url.isDefined && page < maxPages) {
      val body = mapper.readTree(fetch(url.get))
      if (resolvedPath.isEmpty)
        resolvedPath = Some(detectDataPath(body).map(_._1).getOrElse(""))
      val records = extractData(body, resolvedPath.get)
      records.foreach(r => out += mapper.writeValueAsString(r))
      page += 1
      url = plan.pagination match {
        case SinglePage => None
        case JsonLink(p) =>
          atPath(body, p).filter(n => n.isTextual && n.asText().nonEmpty)
            .map(_.asText())
        case PageNumber(param, start, mp) =>
          if (records.isEmpty || page >= mp) None
          else Some(buildUrl(plan.baseUrl, ep.path,
            ep.params + (param -> (start + page).toString)))
        case Offset(param, limit, limitParam) =>
          if (records.size < limit) None
          else Some(buildUrl(plan.baseUrl, ep.path,
            ep.params ++ Map(param -> (page * limit).toString,
              limitParam -> limit.toString)))
        case Cursor(cursorPath, param) =>
          val next = atPath(body, cursorPath)
            .filter(n => n.isTextual && n.asText().nonEmpty).map(_.asText())
          cursorVal = next
          next.map(c => buildUrl(plan.baseUrl, ep.path, ep.params + (param -> c)))
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
