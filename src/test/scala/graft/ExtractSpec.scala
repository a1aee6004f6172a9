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
}
