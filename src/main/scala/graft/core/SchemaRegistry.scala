package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import graft.gold.GoldJob

/** Versioned filesystem schema registry — the engine equivalent of the
  * reference's S3-backed YAML registry
  * (layers/shared/python/shared/schema_registry.py).
  *
  * Layout (mirrors schema_registry.py:68-93, 348-379, 432-462):
  * {{{
  *   <root>/schemas/<domain>/<name>/v<n>.yaml     // immutable versions
  *   <root>/schemas/<domain>/<name>/latest.yaml   // refreshed copy
  *   <root>/silver/<domain>/<table>.yaml          // one-shot silver markers
  *   <root>/schemas/<domain>/gold/<job>/config.yaml
  * }}}
  * Updates write v{n+1} and refresh latest; old versions are never deleted
  * (schema_registry.py:410-430).
  *
  * Scale note: the registry holds table METADATA only (KBs); it is
  * driver-side by design. Data never flows through it.
  */
final class SchemaRegistry(root: String) {
  private val yaml = new ObjectMapper(new YAMLFactory())

  private def endpointDir(domain: String, name: String): Path =
    Paths.get(root, "schemas", domain, name)

  // ---- endpoint schema CRUD (C1-C4) ----------------------------------

  def create(schema: EndpointSchema): EndpointSchema = {
    val dir = endpointDir(schema.domain, schema.name)
    require(!Files.exists(dir.resolve("v1.yaml")),
      s"endpoint ${schema.domain}/${schema.name} already exists")
    val v1 = schema.copy(version = 1)
    writeVersion(v1)
    v1
  }

  /** New version = max existing + 1 (schema_registry.py:68-93). */
  def update(schema: EndpointSchema): EndpointSchema = {
    val next = listVersions(schema.domain, schema.name).maxOption.getOrElse(0) + 1
    val v = schema.copy(version = next)
    writeVersion(v)
    v
  }

  private def writeVersion(s: EndpointSchema): Unit = {
    val dir = endpointDir(s.domain, s.name)
    Files.createDirectories(dir)
    val text = toYaml(s)
    Files.writeString(dir.resolve(s"v${s.version}.yaml"), text)
    Files.writeString(dir.resolve("latest.yaml"), text)
  }

  def get(domain: String, name: String, version: Option[Int] = None): Option[EndpointSchema] = {
    val file = version match {
      case Some(v) => endpointDir(domain, name).resolve(s"v$v.yaml")
      case None    => endpointDir(domain, name).resolve("latest.yaml")
    }
    if (Files.exists(file)) Some(fromYaml(Files.readString(file))) else None
  }

  def listVersions(domain: String, name: String): Seq[Int] = {
    val dir = endpointDir(domain, name)
    Fs.children(dir)
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".yaml") =>
        s.stripPrefix("v").stripSuffix(".yaml").toInt }
      .sorted
  }

  /** Structural diff between two registered schema versions: which
    * columns were added, removed, or changed (type / required /
    * primary-key flags) — the audit surface behind "what did v3 change?"
    * that versioned registries exist for. Returns one (kind, column,
    * detail) tuple per difference, `kind` ∈ {added, removed, changed},
    * ordered by column name. Throws on unknown versions. */
  def diffVersions(domain: String, name: String, fromV: Int, toV: Int)
      : Seq[(String, String, String)] = {
    def cols(v: Int) = get(domain, name, Some(v))
      .getOrElse(throw new IllegalArgumentException(
        s"$domain.$name has no version v$v"))
      .schema.columns.map(c => c.name -> c).toMap
    val a = cols(fromV)
    val b = cols(toV)
    def describe(c: graft.core.ColumnDefinition): String =
      s"${graft.core.RefType.name(c.refType)}" +
        (if (c.required) " required" else "") +
        (if (c.primaryKey) " pk" else "")
    val added = (b.keySet -- a.keySet).toSeq.sorted
      .map(n => ("added", n, describe(b(n))))
    val removed = (a.keySet -- b.keySet).toSeq.sorted
      .map(n => ("removed", n, describe(a(n))))
    val changed = (a.keySet & b.keySet).toSeq.sorted
      .filter(n => describe(a(n)) != describe(b(n)))
      .map(n => ("changed", n, s"${describe(a(n))} -> ${describe(b(n))}"))
    (added ++ removed ++ changed).sortBy(t => (t._2, t._1))
  }

  def listEndpoints(domain: String): Seq[String] = {
    val dir = Paths.get(root, "schemas", domain)
    Fs.children(dir)
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString).filterNot(_ == "gold").sorted
  }

  def delete(domain: String, name: String): Boolean = {
    val dir = endpointDir(domain, name)
    if (!Files.exists(dir)) false
    else { graft.silver.Upsert.deleteRecursively(dir); true }
  }

  // ---- silver registration markers (C5) -------------------------------

  def registerSilver(domain: String, table: String, location: String): Boolean = {
    val file = Paths.get(root, "silver", domain, s"$table.yaml")
    if (Files.exists(file)) false // idempotent (schema_registry.py:348-379)
    else {
      Files.createDirectories(file.getParent)
      val n = yaml.createObjectNode()
      n.put("domain", domain); n.put("table", table); n.put("location", location)
      Files.writeString(file, yaml.writerWithDefaultPrettyPrinter().writeValueAsString(n))
      true
    }
  }

  def listSilver(domain: String): Seq[String] = {
    val dir = Paths.get(root, "silver", domain)
    Fs.children(dir)
      .map(_.getFileName.toString.stripSuffix(".yaml")).sorted
  }

  // ---- gold job configs (C7) ------------------------------------------

  def saveGoldJob(job: GoldJob): Unit = {
    val file = Paths.get(root, "schemas", job.domain, "gold", job.jobName, "config.yaml")
    Files.createDirectories(file.getParent)
    Files.writeString(file,
      yaml.writerWithDefaultPrettyPrinter().writeValueAsString(job.toNode(yaml)))
  }

  def getGoldJob(domain: String, jobName: String): Option[GoldJob] = {
    val file = Paths.get(root, "schemas", domain, "gold", jobName, "config.yaml")
    if (Files.exists(file)) Some(GoldJob.fromNode(yaml.readTree(Files.readString(file))))
    else None
  }

  def listGoldJobs(domain: String): Seq[GoldJob] = {
    val dir = Paths.get(root, "schemas", domain, "gold")
    Fs.children(dir).filter(Files.isDirectory(_))
      .flatMap(d => getGoldJob(domain, d.getFileName.toString))
      .sortBy(_.jobName)
  }

  def deleteGoldJob(domain: String, jobName: String): Boolean = {
    val dir = Paths.get(root, "schemas", domain, "gold", jobName)
    if (!Files.exists(dir)) false
    else { graft.silver.Upsert.deleteRecursively(dir); true }
  }

  // ---- YAML serde (mirrors models.py to_yaml_dict/from_yaml_dict) -----

  def toYaml(s: EndpointSchema): String = {
    val rootN = yaml.createObjectNode()
    rootN.put("name", s.name); rootN.put("domain", s.domain)
    rootN.put("version", s.version); rootN.put("mode", SchemaMode.name(s.mode))
    val schemaN = rootN.putObject("schema")
    val cols = schemaN.putArray("columns")
    s.schema.columns.foreach { c =>
      val cn = cols.addObject()
      cn.put("name", c.name); cn.put("type", RefType.name(c.refType))
      cn.put("required", c.required); cn.put("primary_key", c.primaryKey)
      c.description.foreach(cn.put("description", _))
      c.default.foreach(cn.put("default", _))
    }
    yaml.writerWithDefaultPrettyPrinter().writeValueAsString(rootN)
  }

  def fromYaml(text: String): EndpointSchema = {
    val n = yaml.readTree(text)
    val cols = n.get("schema").get("columns").elements().asScala.map { cn =>
      ColumnDefinition(
        name = cn.get("name").asText(),
        refType = RefType.parse(cn.get("type").asText()).getOrElse(RefType.StringT),
        required = Option(cn.get("required")).exists(_.asBoolean()),
        primaryKey = Option(cn.get("primary_key")).exists(_.asBoolean()),
        description = Option(cn.get("description")).map(_.asText()),
        default = Option(cn.get("default")).map(_.asText()))
    }.toSeq
    EndpointSchema(
      name = n.get("name").asText(),
      domain = n.get("domain").asText(),
      version = n.get("version").asInt(),
      mode = SchemaMode.parse(n.get("mode").asText()),
      schema = SchemaDefinition(cols))
  }
}
