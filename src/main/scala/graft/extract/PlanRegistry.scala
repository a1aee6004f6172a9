package graft.extract

import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.extract.RestExtract._

/** Ingestion-plan registry — CRUD for persisted ingestion plans, the
  * engine equivalent of the reference's plans API
  * (lambdas/ingestion_plans/main.py:56-125: plans stored as YAML at
  * `{tenant}/ingestion_plans/{plan_name}/config.yaml`, POST create/
  * update, GET list/get, DELETE). Versioned like endpoint schemas
  * (`config_v{n}.yaml`, save bumps, reads default to latest) so a plan
  * edit is auditable the same way a schema edit is.
  *
  * Secrets stay OUT of the store, faithfully: the reference persists
  * OAuth2 credentials in Secrets Manager only (never S3) and strips the
  * secret reference from every read. Here an [[RestExtract.OAuth2]]
  * auth serializes as a bare `{type: oauth2}` marker — the credentials
  * are runtime-injected (AWS infra is scoped out, SURVEY §0); bearer/
  * api-key/basic configs persist inline exactly as the reference's plan
  * dict does.
  */
object PlanRegistry {
  /** The persisted shape (main.py:184-194: plan_name, domain, schedule
    * tags, the IngestionPlan dict). */
  final case class PlanConfig(
      planName: String,
      domain: String,
      tags: Seq[String] = Nil,
      plan: IngestionPlan = IngestionPlan(""))

  /** Single-run trigger — the engine face of
    * `POST /ingestion/plans/{name}/run` (main.py:222-240, which starts
    * the ingestion state machine once): fetch every endpoint of the
    * stored plan through the injected transport and land the records
    * in bronze via the lake's ingest service. Returns records per
    * resource. */
  def run(lake: graft.Lake, planName: String,
      fetch: RestExtract.HttpFetcher): Map[String, Int] = {
    val cfg = lake.plans.get(planName).getOrElse(throw
      new NoSuchElementException(s"ingestion plan '$planName' not found"))
    val counts = cfg.plan.endpoints.map { ep =>
      val recs = RestExtract.fetchEndpointHttp(cfg.plan, ep, fetch)
      lake.ingest.ingest(cfg.domain, ep.resourceName, recs)
      ep.resourceName -> recs.size
    }.toMap
    lake.ingest.flushAll()
    counts
  }

  final case class ScheduledRun(planName: String, status: String,
      counts: Map[String, Int], error: Option[String] = None)

  /** Scheduled ingestion sweep (r13 verdict task 5) — the engine face
    * of the reference's EventBridge cron on the ingestion state machine
    * (stack/serverless_data_lake_stack.py:1060-1063), mirroring
    * [[graft.gold.GoldRunner.runScheduled]]'s tag selection: run every
    * stored plan carrying `tag`, each in ISOLATION (the reference's
    * per-pipeline state-machine runs are independent — one failing
    * endpoint must not kill the sweep), and record a `last_execution`
    * status file per plan, the gold-job discipline applied to
    * ingestion. */
  def runScheduled(lake: graft.Lake, tag: String,
      fetch: RestExtract.HttpFetcher): Seq[ScheduledRun] =
    lake.plans.list().flatMap { name =>
      lake.plans.get(name).filter(_.tags.contains(tag)).map { cfg =>
        val res =
          try ScheduledRun(cfg.planName, "success", run(lake, name, fetch))
          catch {
            case scala.util.control.NonFatal(e) =>
              ScheduledRun(cfg.planName, "failed", Map.empty,
                Some(Option(e.getMessage).getOrElse(e.toString).take(5000)))
          }
        // the status file is bookkeeping, not the run: an IO error
        // writing ONE plan's last_execution.yaml must not abort the
        // rest of the sweep (isolation covers the whole per-plan unit,
        // r14 advisor) — surface it in the returned record instead
        try { lake.plans.writeStatus(name, res); res }
        catch {
          case scala.util.control.NonFatal(e) =>
            res.copy(error = Some((res.error.fold("")(_ + "; ") +
              "status write failed: " +
              Option(e.getMessage).getOrElse(e.toString)).take(5000)))
        }
      }
    }
}

final class PlanRegistry(root: String) {
  import PlanRegistry.PlanConfig

  private val yaml = {
    val f = new com.fasterxml.jackson.dataformat.yaml.YAMLFactory()
    new com.fasterxml.jackson.databind.ObjectMapper(f)
  }

  private def planDir(name: String): Path =
    Paths.get(root, "ingestion_plans", name)

  private val versionRe = """config_v(\d+)\.yaml""".r

  def listVersions(name: String): Seq[Int] =
    graft.core.Fs.children(planDir(name))
      .map(_.getFileName.toString)
      .collect { case versionRe(v) => v.toInt }
      .sorted

  /** Create or update (the reference's POST upserts): writes the next
    * version and returns it. */
  def save(cfg: PlanConfig): Int = {
    val dir = planDir(cfg.planName)
    Files.createDirectories(dir)
    val v = listVersions(cfg.planName).lastOption.getOrElse(0) + 1
    Files.writeString(dir.resolve(s"config_v$v.yaml"),
      yaml.writerWithDefaultPrettyPrinter().writeValueAsString(toNode(cfg)))
    v
  }

  /** Latest (or a specific) version; None when absent/vacated. */
  def get(name: String, version: Option[Int] = None): Option[PlanConfig] = {
    val v = version.orElse(listVersions(name).lastOption)
    v.map(n => planDir(name).resolve(s"config_v$n.yaml"))
      .filter(Files.exists(_))
      .map(p => fromNode(yaml.readTree(Files.readString(p))))
  }

  /** All plan names with at least one version, sorted. */
  def list(): Seq[String] = {
    val dir = Paths.get(root, "ingestion_plans")
    graft.core.Fs.children(dir)
      .filter(d => Files.isDirectory(d) && listVersions(
        d.getFileName.toString).nonEmpty)
      .map(_.getFileName.toString).sorted
  }

  def delete(name: String): Boolean = {
    val dir = planDir(name)
    if (!Files.exists(dir)) false
    else { graft.silver.Upsert.deleteRecursively(dir); true }
  }

  /** `last_execution.yaml` per plan — status, timestamp, per-resource
    * record counts, error ≤5000 chars (the gold-job status-file shape,
    * entrypoint.py:465-488, applied to ingestion plans). */
  def writeStatus(name: String, run: PlanRegistry.ScheduledRun): Unit = {
    val f = planDir(name).resolve("last_execution.yaml")
    Files.createDirectories(f.getParent)
    val n = yaml.createObjectNode()
    n.put("status", run.status)
    n.put("timestamp", java.time.Instant.now().toString)
    val c = n.putObject("records")
    run.counts.toSeq.sortBy(_._1).foreach { case (k, v) => c.put(k, v) }
    run.error.foreach(e => n.put("error", e))
    // stage-and-swap, not write-in-place: a crash mid-write must never
    // leave a truncated YAML for lastExecution to return as-is (r14
    // advisor) — same discipline as every other committed file here
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    Files.writeString(tmp,
      yaml.writerWithDefaultPrettyPrinter().writeValueAsString(n))
    Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The raw last_execution.yaml text, if the plan has ever run. */
  def lastExecution(name: String): Option[String] = {
    val f = planDir(name).resolve("last_execution.yaml")
    if (Files.exists(f)) Some(Files.readString(f)) else None
  }

  // ---- YAML serde (snake_case keys mirroring the reference's dicts) ----

  private[extract] def toNode(cfg: PlanConfig): ObjectNode = {
    val n = yaml.createObjectNode()
    n.put("plan_name", cfg.planName)
    n.put("domain", cfg.domain)
    val tags = n.putArray("tags")
    cfg.tags.foreach(tags.add)
    val p = n.putObject("plan")
    p.put("base_url", cfg.plan.baseUrl)
    p.set[JsonNode]("pagination", paginationNode(cfg.plan.pagination))
    p.set[JsonNode]("auth", authNode(cfg.plan.auth))
    val eps = p.putArray("endpoints")
    cfg.plan.endpoints.foreach { e =>
      val en = eps.addObject()
      en.put("path", e.path)
      en.put("resource_name", e.resourceName)
      e.primaryKey.foreach(en.put("primary_key", _))
      e.dataPath.foreach(en.put("data_path", _))
      en.put("is_collection", e.isCollection)
      if (e.params.nonEmpty) {
        val pn = en.putObject("params")
        e.params.toSeq.sortBy(_._1).foreach { case (k, v) => pn.put(k, v) }
      }
    }
    n
  }

  private def paginationNode(p: Pagination): ObjectNode = {
    val n = yaml.createObjectNode()
    p match {
      case SinglePage => n.put("type", "single_page")
      case Auto => n.put("type", "auto")
      case JsonLink(path) =>
        n.put("type", "json_link"); n.put("next_url_path", path)
      case PageNumber(param, start, maxPages, totalPath) =>
        n.put("type", "page_number"); n.put("param", param)
        n.put("start", start); n.put("max_pages", maxPages)
        totalPath.foreach(n.put("total_path", _))
      case Offset(param, limit, limitParam, totalPath) =>
        n.put("type", "offset"); n.put("param", param)
        n.put("limit", limit); n.put("limit_param", limitParam)
        totalPath.foreach(n.put("total_path", _))
      case Cursor(path, param) =>
        n.put("type", "cursor"); n.put("cursor_path", path)
        n.put("cursor_param", param)
      case HeaderCursor(header, param) =>
        n.put("type", "header_cursor"); n.put("header", header)
        n.put("cursor_param", param)
      case HeaderLink => n.put("type", "header_link")
    }
    n
  }

  private def authNode(a: Auth): ObjectNode = {
    val n = yaml.createObjectNode()
    a match {
      case NoAuth => n.put("type", "none")
      case Bearer(token, header) =>
        n.put("type", "bearer"); n.put("token", token)
        n.put("auth_header", header)
      case ApiKey(key, header) =>
        n.put("type", "api_key"); n.put("key", key)
        n.put("auth_header", header)
      case Basic(user, password) =>
        n.put("type", "basic"); n.put("username", user)
        n.put("password", password)
      case _: OAuth2 =>
        // credentials never touch the store (main.py:107-121: OAuth2 →
        // Secrets Manager; the stored cfg keeps only a reference, and
        // reads strip even that)
        n.put("type", "oauth2")
    }
    n
  }

  private def optText(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(!_.isNull).map(_.asText())

  private[extract] def fromNode(n: JsonNode): PlanConfig = {
    val p = n.get("plan")
    val pag = Option(p.get("pagination")).map { pn =>
      pn.get("type").asText() match {
        case "single_page" => SinglePage
        case "auto" => Auto
        case "json_link" => JsonLink(pn.get("next_url_path").asText())
        case "page_number" => PageNumber(pn.get("param").asText(),
          pn.get("start").asInt(), pn.get("max_pages").asInt(),
          optText(pn, "total_path"))
        case "offset" => Offset(pn.get("param").asText(),
          pn.get("limit").asInt(), pn.get("limit_param").asText(),
          optText(pn, "total_path"))
        case "cursor" => Cursor(pn.get("cursor_path").asText(),
          pn.get("cursor_param").asText())
        case "header_cursor" => HeaderCursor(pn.get("header").asText(),
          pn.get("cursor_param").asText())
        case "header_link" => HeaderLink
      }
    }.getOrElse(Auto)
    val auth = Option(n.get("plan").get("auth")).map { an =>
      an.get("type").asText() match {
        case "none" => NoAuth
        case "bearer" => Bearer(an.get("token").asText(),
          an.get("auth_header").asText())
        case "api_key" => ApiKey(an.get("key").asText(),
          an.get("auth_header").asText())
        case "basic" => Basic(an.get("username").asText(),
          an.get("password").asText())
        case "oauth2" => OAuth2("", "", "", "", "") // runtime-injected
      }
    }.getOrElse(NoAuth)
    val eps = Option(p.get("endpoints")).toSeq.flatMap { arr =>
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map { en =>
        Endpoint(
          path = en.get("path").asText(),
          resourceName = en.get("resource_name").asText(),
          primaryKey = optText(en, "primary_key"),
          dataPath = optText(en, "data_path"),
          params = Option(en.get("params")).map { pn =>
            pn.properties().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap
          }.getOrElse(Map.empty),
          isCollection = en.get("is_collection").asBoolean())
      }.toSeq
    }
    PlanConfig(
      planName = n.get("plan_name").asText(),
      domain = n.get("domain").asText(),
      tags = Option(n.get("tags")).toSeq.flatMap { arr =>
        import scala.jdk.CollectionConverters._
        arr.elements().asScala.map(_.asText()).toSeq
      },
      plan = IngestionPlan(p.get("base_url").asText(), pag, eps, auth))
  }
}
