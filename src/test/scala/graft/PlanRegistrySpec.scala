package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.PlanRegistry
import graft.extract.RestExtract._

/** Ingestion-plan registry CRUD (r12 verdict task 8; reference:
  * lambdas/ingestion_plans/main.py:56-125). Round-trips every
  * pagination/auth shape, versions like endpoint schemas, and keeps
  * OAuth2 credentials OUT of the persisted YAML. */
class PlanRegistrySpec extends AnyFunSuite {

  private def freshRegistry() =
    new PlanRegistry(Files.createTempDirectory("plan-reg-").toString)

  private def samplePlan(pag: Pagination, auth: Auth) = IngestionPlan(
    baseUrl = "https://api.example.com/v2",
    pagination = pag,
    endpoints = Seq(
      Endpoint("/orders", "orders", primaryKey = Some("id"),
        dataPath = Some("data.results"),
        params = Map("status" -> "open", "expand" -> "lines")),
      Endpoint("/customers/profile", "customer_profile",
        isCollection = false)),
    auth = auth)

  test("save/get/list/delete round-trip across every pagination and " +
      "auth shape") {
    val reg = freshRegistry()
    val shapes = Seq[(String, Pagination, Auth)](
      ("p_single", SinglePage, NoAuth),
      ("p_auto", Auto, Bearer("tok-123", "X-Auth")),
      ("p_link", JsonLink("meta.next"), ApiKey("key-9", "X-Api-Key")),
      ("p_page", PageNumber("page", 1, 500, Some("meta.total_pages")),
        Basic("u", "pw")),
      ("p_offset", Offset("skip", 250, "take", Some("meta.total")), NoAuth),
      ("p_cursor", Cursor("meta.cursor", "after"), NoAuth),
      ("p_hcursor", HeaderCursor("X-Next-Cursor", "cursor"), NoAuth),
      ("p_hlink", HeaderLink, NoAuth))
    shapes.foreach { case (name, pag, auth) =>
      val v = reg.save(PlanRegistry.PlanConfig(name, "sales",
        Seq("daily", "backfill"), samplePlan(pag, auth)))
      assert(v == 1)
      val got = reg.get(name).get
      assert(got.planName == name && got.domain == "sales")
      assert(got.tags == Seq("daily", "backfill"))
      assert(got.plan == samplePlan(pag, auth),
        s"round-trip mismatch for $name")
    }
    assert(reg.list() == shapes.map(_._1).sorted)
    assert(reg.delete("p_single"))
    assert(!reg.delete("p_single"))
    assert(reg.get("p_single").isEmpty)
    assert(reg.list() == shapes.map(_._1).drop(1).sorted)
  }

  test("save versions like endpoint schemas; get defaults to latest") {
    val reg = freshRegistry()
    val p1 = PlanRegistry.PlanConfig("evolving", "ops", Seq("hourly"),
      samplePlan(Auto, NoAuth))
    assert(reg.save(p1) == 1)
    val p2 = p1.copy(tags = Seq("daily"),
      plan = p1.plan.copy(baseUrl = "https://api.example.com/v3"))
    assert(reg.save(p2) == 2)
    assert(reg.listVersions("evolving") == Seq(1, 2))
    assert(reg.get("evolving").get.plan.baseUrl.endsWith("/v3"))
    assert(reg.get("evolving", Some(1)).get.plan.baseUrl.endsWith("/v2"))
    assert(reg.get("evolving", Some(3)).isEmpty)
  }

  test("OAuth2 credentials never reach the persisted YAML (main.py: " +
      "secrets live outside the plan store)") {
    val root = Files.createTempDirectory("plan-reg-sec-").toString
    val reg = new PlanRegistry(root)
    val secret = OAuth2("https://idp/token", "client-id", "SECRET-VALUE",
      "svc-user", "SECRET-PASSWORD")
    reg.save(PlanRegistry.PlanConfig("secure", "sales", Nil,
      samplePlan(Cursor("c", "cursor"), secret)))
    val raw = Files.readString(java.nio.file.Paths.get(
      root, "ingestion_plans", "secure", "config_v1.yaml"))
    Seq("SECRET-VALUE", "SECRET-PASSWORD", "client-id", "svc-user",
      "https://idp/token").foreach { s =>
      assert(!raw.contains(s), s"secret material '$s' leaked into the store")
    }
    assert(raw.contains("oauth2"), "auth type marker missing")
    // a read returns the marker form, never credentials
    assert(reg.get("secure").get.plan.auth == OAuth2("", "", "", "", ""))
  }

  test("single-run trigger: a stored plan fetches its endpoints and " +
      "lands records in bronze (main.py run endpoint)") {
    val root = Files.createTempDirectory("plan-run-").toString
    val lake = new Lake(null, root)
    lake.registry.create(core.EndpointSchema("orders", "sales", 1,
      core.SchemaMode.Manual, core.SchemaDefinition(Seq(
        core.ColumnDefinition("id", core.RefType.IntegerT,
          required = true, primaryKey = true)))))
    lake.plans.save(PlanRegistry.PlanConfig("sales_api", "sales", Seq("daily"),
      IngestionPlan("https://api.example.com",
        pagination = SinglePage,
        endpoints = Seq(Endpoint("/orders", "orders",
          primaryKey = Some("id"), dataPath = Some("data"))))))
    val fetch: HttpFetcher = req =>
      Response("""{"data": [{"id": 1}, {"id": 2}, {"id": 3}]}""")
    val counts = PlanRegistry.run(lake, "sales_api", fetch)
    assert(counts == Map("orders" -> 3))
    val bronze = java.nio.file.Paths.get(lake.bronzePath("sales", "orders"))
    assert(graft.core.Fs.nonEmpty(bronze), "no bronze JSONL landed")
    intercept[NoSuchElementException] {
      PlanRegistry.run(lake, "absent_plan", fetch)
    }
  }

  test("scheduled runs select plans by tag, isolate failures, and " +
      "record status files (r13 verdict task 5: the EventBridge-cron " +
      "analog gold jobs already have)") {
    val root = Files.createTempDirectory("plan-sched-").toString
    val lake = new Lake(null, root)
    lake.registry.create(core.EndpointSchema("orders", "sched",
      1, core.SchemaMode.Manual, core.SchemaDefinition(Seq(
        core.ColumnDefinition("id", core.RefType.IntegerT,
          required = true, primaryKey = true)))))
    def plan(name: String, tags: Seq[String], path: String) =
      PlanRegistry.PlanConfig(name, "sched", tags,
        IngestionPlan("https://api.example.com", pagination = SinglePage,
          endpoints = Seq(Endpoint(path, "orders",
            primaryKey = Some("id"), dataPath = Some("data")))))
    lake.plans.save(plan("good_daily", Seq("daily"), "/ok"))
    lake.plans.save(plan("bad_daily", Seq("daily"), "/boom"))
    lake.plans.save(plan("weekly_only", Seq("weekly"), "/ok"))
    val fetch: HttpFetcher = req =>
      if (req.url.contains("/boom")) sys.error("upstream 500")
      else Response("""{"data": [{"id": 1}, {"id": 2}]}""")
    val runs = PlanRegistry.runScheduled(lake, "daily", fetch)
    // tag selection: weekly_only not run; list() order is sorted
    assert(runs.map(_.planName) == Seq("bad_daily", "good_daily"))
    val byName = runs.map(r => r.planName -> r).toMap
    // isolation: the failing plan did not kill the sweep
    assert(byName("good_daily").status == "success" &&
      byName("good_daily").counts == Map("orders" -> 2))
    assert(byName("bad_daily").status == "failed" &&
      byName("bad_daily").error.exists(_.contains("upstream 500")))
    // status files, the gold-job discipline
    assert(lake.plans.lastExecution("good_daily")
      .exists(s => s.contains("success") && s.contains("orders")))
    assert(lake.plans.lastExecution("bad_daily")
      .exists(_.contains("failed")))
    assert(lake.plans.lastExecution("weekly_only").isEmpty)
    // status files must not pollute the version list
    assert(lake.plans.listVersions("good_daily") == Seq(1))
  }
}
