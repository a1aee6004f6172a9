package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.RestExtract
import graft.extract.RestExtract._

/** Extraction-layer tests replaying the reference's example-plan shapes
  * (FIXTURES.md §4: SWAPI json_link, Rick&Morty nested info.next, offset,
  * page_number, cursor) against recorded fixture pages. */
class ExtractSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def fakeApi(pages: Map[String, String]): Fetcher =
    url => pages.getOrElse(url, throw new RuntimeException(s"404 $url"))

  test("json_link pagination follows next until null (swapi shape)") {
    val plan = IngestionPlan("https://api.test", JsonLink("next"),
      Seq(Endpoint("people", "people", dataPath = Some("results"))))
    val fetch = fakeApi(Map(
      "https://api.test/people" ->
        """{"next": "https://api.test/people?page=2", "results": [{"name": "a"}, {"name": "b"}]}""",
      "https://api.test/people?page=2" ->
        """{"next": null, "results": [{"name": "c"}]}"""))
    val recs = fetchEndpoint(plan, plan.endpoints.head, fetch)
    assert(recs.size == 3)
    assert(mapper.readTree(recs.last).get("name").asText() == "c")
  }

  test("json_link with nested next path (rick&morty info.next shape)") {
    val plan = IngestionPlan("https://api.test", JsonLink("info.next"),
      Seq(Endpoint("characters", "characters", dataPath = Some("results"))))
    val fetch = fakeApi(Map(
      "https://api.test/characters" ->
        """{"info": {"next": "https://api.test/characters?page=2", "pages": 2}, "results": [{"id": 1}]}""",
      "https://api.test/characters?page=2" ->
        """{"info": {"next": null}, "results": [{"id": 2}]}"""))
    assert(fetchEndpoint(plan, plan.endpoints.head, fetch).size == 2)
  }

  test("page_number pagination stops on empty page") {
    val plan = IngestionPlan("https://api.test", PageNumber("page", 1),
      Seq(Endpoint("items", "items")))
    val fetch = fakeApi(Map(
      "https://api.test/items" -> """{"items": [{"i": 1}, {"i": 2}]}""",
      "https://api.test/items?page=2" -> """{"items": [{"i": 3}]}""",
      "https://api.test/items?page=3" -> """{"items": []}"""))
    assert(fetchEndpoint(plan, plan.endpoints.head, fetch).size == 3)
  }

  test("offset pagination stops when fewer than limit returned") {
    val plan = IngestionPlan("https://api.test", Offset("offset", 2, "limit"),
      Seq(Endpoint("rows", "rows", dataPath = Some("data"))))
    val fetch = fakeApi(Map(
      "https://api.test/rows" -> """{"data": [{"i": 1}, {"i": 2}]}""",
      "https://api.test/rows?limit=2&offset=2" -> """{"data": [{"i": 3}]}"""))
    assert(fetchEndpoint(plan, plan.endpoints.head, fetch).size == 3)
  }

  test("cursor pagination threads the cursor param") {
    val plan = IngestionPlan("https://api.test", Cursor("meta.next_cursor", "cursor"),
      Seq(Endpoint("logs", "logs", dataPath = Some("data"))))
    val fetch = fakeApi(Map(
      "https://api.test/logs" ->
        """{"meta": {"next_cursor": "abc"}, "data": [{"i": 1}]}""",
      "https://api.test/logs?cursor=abc" ->
        """{"meta": {"next_cursor": null}, "data": [{"i": 2}]}"""))
    assert(fetchEndpoint(plan, plan.endpoints.head, fetch).size == 2)
  }

  test("data-path detection: bare array, preferred keys, largest, one deep") {
    def detect(json: String) = detectDataPath(mapper.readTree(json))
    assert(detect("""[{"a": 1}]""").get._1 == "")
    assert(detect("""{"results": [{"a": 1}], "junk": [{"b": 1}, {"b": 2}]}""")
      .get._1 == "results")
    assert(detect("""{"small": [{"a": 1}], "big": [{"b": 1}, {"b": 2}]}""")
      .get._1 == "big")
    assert(detect("""{"payload": {"items": [{"a": 1}]}}""").get._1 == "payload.items")
    // no arrays anywhere: the non-empty object IS the single record
    assert(detect("""{"n": 5}""").contains(("",
      Seq(mapper.readTree("""{"n": 5}""")))))
  }

  test("dot-path extraction (runner.py:195-217)") {
    val body = mapper.readTree("""{"data": {"items": [{"x": 1}, {"x": 2}]}}""")
    assert(extractData(body, "data.items").size == 2)
    assert(extractData(body, "data.missing").isEmpty)
  }

  test("singularize + fuzzy name match (runner.py:560-611)") {
    assert(singularize("categories") == "category")
    assert(singularize("users") == "user")
    assert(singularize("status") == "statu") // same naive rule as plural-strip
    assert(RestExtract.similarity("abcd", "abcd") == 1.0)
    assert(RestExtract.similarity("abcd", "wxyz") == 0.0)
    assert(namesMatch("users", "user"))
    assert(namesMatch("categories", "category"))
    assert(!namesMatch("users", "planets"))
  }

  test("pk detection priority chain (runner.py:292-337)") {
    assert(detectPrimaryKey("users", Seq("id", "x")).contains("id"))
    assert(detectPrimaryKey("users", Seq("user_id", "x")).contains("user_id"))
    assert(detectPrimaryKey("posts", Seq("author_id", "t")).contains("author_id"))
    assert(detectPrimaryKey("posts", Seq("a_id", "b_id", "name")).contains("name"))
    assert(detectPrimaryKey("planets", Seq("climate", "url")).contains("url"))
    assert(detectPrimaryKey("x", Seq("a")).isEmpty)
  }

  private def fakeHttp(pages: Map[String, Response]): HttpFetcher =
    req => pages.getOrElse(req.url, throw new RuntimeException(s"404 ${req.url}"))

  test("header_link pagination follows the Link rel=next chain (github shape)") {
    val plan = IngestionPlan("https://api.test", HeaderLink,
      Seq(Endpoint("repos", "repos")))
    val fetch = fakeHttp(Map(
      "https://api.test/repos" -> Response("""[{"id": 1}, {"id": 2}]""",
        Map("Link" -> """<https://api.test/repos?page=2>; rel="next", <https://api.test/repos?page=9>; rel="last"""")),
      "https://api.test/repos?page=2" -> Response("""[{"id": 3}]""",
        Map("link" -> """<https://api.test/repos?page=1>; rel="prev""""))))
    assert(fetchEndpointHttp(plan, plan.endpoints.head, fetch).size == 3)
  }

  test("Link header: quoted commas and spaced rel= do not break rel=next") {
    import graft.extract.RestExtract.nextFromLinkHeader
    // comma INSIDE a quoted title param before rel="next"
    assert(nextFromLinkHeader(Map("Link" ->
      """<https://api/x?page=2>; title="p, q"; rel="next"""")) ==
      Some("https://api/x?page=2"))
    // whitespace around '=' and multi-valued rel
    assert(nextFromLinkHeader(Map("link" ->
      """<https://api/a>; rel = "prev", <https://api/b>; rel= "next last"""")) ==
      Some("https://api/b"))
    // unquoted rel value followed by another link
    assert(nextFromLinkHeader(Map("Link" ->
      """<https://api/a>; rel=prev, <https://api/b>; rel=next""")) ==
      Some("https://api/b"))
    assert(nextFromLinkHeader(Map("Link" ->
      """<https://api/a>; rel="prev"""")).isEmpty)
  }

  test("header_cursor pagination threads a response-header cursor") {
    val plan = IngestionPlan("https://api.test",
      HeaderCursor("X-Next-Cursor", "cursor"),
      Seq(Endpoint("logs", "logs", dataPath = Some("data"))))
    val fetch = fakeHttp(Map(
      "https://api.test/logs" -> Response("""{"data": [{"i": 1}]}""",
        Map("x-next-cursor" -> "abc")), // case-insensitive header match
      "https://api.test/logs?cursor=abc" ->
        Response("""{"data": [{"i": 2}]}""", Map.empty))) // no header → stop
    assert(fetchEndpointHttp(plan, plan.endpoints.head, fetch).size == 2)
  }

  test("page_number total_path stops at the declared page count even on a full final page") {
    val plan = IngestionPlan("https://api.test",
      PageNumber("page", 1, totalPath = Some("info.pages")),
      Seq(Endpoint("items", "items", dataPath = Some("items"))))
    // page 3 does NOT exist (would 404); the declared total must stop us
    val fetch = fakeApi(Map(
      "https://api.test/items" ->
        """{"info": {"pages": 2}, "items": [{"i": 1}, {"i": 2}]}""",
      "https://api.test/items?page=2" ->
        """{"info": {"pages": 2}, "items": [{"i": 3}, {"i": 4}]}"""))
    assert(fetchEndpoint(plan, plan.endpoints.head, fetch).size == 4)
  }

  test("offset total_path stops at the declared item count even on a full final page") {
    val plan = IngestionPlan("https://api.test",
      Offset("offset", 2, "limit", totalPath = Some("total")),
      Seq(Endpoint("rows", "rows", dataPath = Some("data"))))
    val fetch = fakeApi(Map(
      "https://api.test/rows" -> """{"total": 4, "data": [{"i": 1}, {"i": 2}]}""",
      "https://api.test/rows?limit=2&offset=2" ->
        """{"total": 4, "data": [{"i": 3}, {"i": 4}]}"""))
    assert(fetchEndpoint(plan, plan.endpoints.head, fetch).size == 4)
  }

  test("auto pagination resolves json_link from a well-known body path") {
    val plan = IngestionPlan("https://api.test", Auto,
      Seq(Endpoint("people", "people", dataPath = Some("results"))))
    val fetch = fakeApi(Map(
      "https://api.test/people" ->
        """{"next": "https://api.test/people?page=2", "results": [{"n": 1}]}""",
      "https://api.test/people?page=2" ->
        """{"next": null, "results": [{"n": 2}]}"""))
    assert(fetchEndpoint(plan, plan.endpoints.head, fetch).size == 2)
  }

  test("auto pagination falls back to the Link header, then to single page") {
    val planH = IngestionPlan("https://api.test", Auto,
      Seq(Endpoint("repos", "repos")))
    val fetchH = fakeHttp(Map(
      "https://api.test/repos" -> Response("""[{"id": 1}]""",
        Map("Link" -> """<https://api.test/repos?page=2>; rel=next""")),
      "https://api.test/repos?page=2" -> Response("""[{"id": 2}]""")))
    assert(fetchEndpointHttp(planH, planH.endpoints.head, fetchH).size == 2)

    // nothing detectable -> one page only, even though ?page=2 exists
    val planS = IngestionPlan("https://api.test", Auto,
      Seq(Endpoint("flat", "flat")))
    val fetchS = fakeHttp(Map(
      "https://api.test/flat" -> Response("""[{"id": 1}]"""),
      "https://api.test/flat?page=2" -> Response("""[{"id": 99}]""")))
    assert(fetchEndpointHttp(planS, planS.endpoints.head, fetchS).size == 1)
  }

  test("auth headers ride on every request (bearer / api_key / basic)") {
    assert(authHeaders(Bearer("tok")) == Map("Authorization" -> "Bearer tok"))
    assert(authHeaders(ApiKey("k", "X-API-Key")) == Map("X-API-Key" -> "k"))
    assert(authHeaders(Basic("u", "p")) ==
      Map("Authorization" -> "Basic dTpw")) // base64("u:p")
    val plan = IngestionPlan("https://api.test", SinglePage,
      Seq(Endpoint("secure", "secure")), auth = Bearer("tok"))
    var seen: Map[String, String] = Map.empty
    val fetch: HttpFetcher = req => {
      seen = req.headers
      if (req.headers.get("Authorization").contains("Bearer tok"))
        Response("""[{"ok": 1}]""")
      else Response("""{"error": "unauthorized"}""")
    }
    assert(fetchEndpointHttp(plan, plan.endpoints.head, fetch).size == 1)
    assert(seen == Map("Authorization" -> "Bearer tok"))
  }

  test("oauth2 ROPC exchange builds the password-grant request and yields a bearer") {
    val cfg = OAuth2("https://auth.test/token", "cid", "csec", "user", "pw")
    var posted: (String, Map[String, String], String) = null
    val bearer = oauth2Token(cfg, (url, headers, form) => {
      posted = (url, headers, form)
      """{"access_token": "at-123", "token_type": "bearer"}"""
    })
    assert(bearer == Bearer("at-123"))
    assert(posted._1 == "https://auth.test/token")
    assert(posted._2("Authorization") == "Basic " +
      java.util.Base64.getEncoder.encodeToString("cid:csec".getBytes("UTF-8")))
    assert(posted._3 == "grant_type=password&username=user&password=pw")
  }
}
