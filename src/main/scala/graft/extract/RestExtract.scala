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

  /** Well-known wrapper keys, in preference order (runner.py:221-289). */
  private val preferredKeys =
    Seq("results", "data", "items", "records", "list", "rows", "entries")

  /** Auto-detect the array-of-objects field: prefer well-known keys, fall
    * back to the largest array of objects; search one level deep. */
  def detectDataPath(body: JsonNode): Option[(String, Seq[JsonNode])] = {
    def arrayOfObjects(n: JsonNode): Boolean =
      n != null && n.isArray &&
        (n.isEmpty || n.elements().asScala.forall(_.isObject))

    if (body.isArray && arrayOfObjects(body))
      return Some(("", body.elements().asScala.toSeq))

    // preferred keys at the top level
    preferredKeys.collectFirst {
      case k if arrayOfObjects(body.get(k)) =>
        (k, body.get(k).elements().asScala.toSeq)
    }.orElse {
      // largest array-of-objects at the top level
      val top = body.properties().asScala.toSeq
        .filter(e => arrayOfObjects(e.getValue) && e.getValue.size() > 0)
      top.sortBy(-_.getValue.size()).headOption
        .map(e => (e.getKey, e.getValue.elements().asScala.toSeq))
    }.orElse {
      // one level deep: obj.field
      body.properties().asScala.toSeq.filter(_.getValue.isObject).flatMap { e =>
        e.getValue.properties().asScala.toSeq.collect {
          case f if arrayOfObjects(f.getValue) && f.getValue.size() > 0 =>
            (s"${e.getKey}.${f.getKey}", f.getValue.elements().asScala.toSeq)
        }
      }.sortBy(-_._2.size).headOption
    }
  }

  /** PK-detection heuristic (runner.py:292-337):
    * id → {singular}_id → unique *_id → name → url. */
  def detectPrimaryKey(resourceName: String, sampleFields: Seq[String]): Option[String] = {
    val fields = sampleFields.toSet
    val singular = singularize(resourceName)
    if (fields.contains("id")) Some("id")
    else if (fields.contains(s"${singular}_id")) Some(s"${singular}_id")
    else {
      val idFields = sampleFields.filter(_.endsWith("_id"))
      if (idFields.size == 1) Some(idFields.head)
      else if (fields.contains("name")) Some("name")
      else if (fields.contains("url")) Some("url")
      else None
    }
  }

  /** Plural normalization (runner.py:560-576): categories→category,
    * users→user; leaves non-plurals alone. */
  def singularize(name: String): String =
    if (name.endsWith("ies")) name.dropRight(3) + "y"
    else if (name.endsWith("ses")) name.dropRight(2)
    else if (name.endsWith("s") && !name.endsWith("ss")) name.dropRight(1)
    else name

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
    while (url.isDefined && page < maxPages) {
      val body = mapper.readTree(fetch(url.get))
      val records = ep.dataPath match {
        case Some(p) => extractData(body, p)
        case None => detectDataPath(body).map(_._2)
          .getOrElse(if (body.isObject) Seq(body) else Nil)
      }
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
