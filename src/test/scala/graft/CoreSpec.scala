package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Unit tests mirroring the reference's tests/test_endpoints.py
  * case-for-case (SURVEY §5). */
class CoreSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("snake_case conversion incl. acronyms (test_endpoints.py:310-338)") {
    assert(Naming.toSnakeCase("userID") == "user_id")
    assert(Naming.toSnakeCase("HTTPResponse") == "http_response")
    assert(Naming.toSnakeCase("XMLHttpRequest") == "xml_http_request")
    assert(Naming.toSnakeCase("camelCase") == "camel_case")
    assert(Naming.toSnakeCase("already_snake") == "already_snake")
    assert(Naming.toSnakeCase("with space") == "with_space")
    assert(Naming.isSnakeCase("valid_name2"))
    assert(!Naming.isSnakeCase("Invalid"))
    assert(!Naming.isSnakeCase("2leading"))
  }

  test("type inference per value (test_endpoints.py:341-477)") {
    def infer(json: String) =
      Inference.inferValueType(mapper.readTree(json))
    assert(infer("5") == RefType.IntegerT)
    assert(infer("5.5") == RefType.FloatT)
    assert(infer("true") == RefType.BooleanT)
    assert(infer("\"hello\"") == RefType.StringT)
    assert(infer("\"2024-01-15T10:30:00Z\"") == RefType.TimestampT)
    assert(infer("\"2024-01-15 10:30:00\"") == RefType.TimestampT)
    assert(infer("\"2024-01-15\"") == RefType.DateT)
    assert(infer("\"2024-13-45\"") == RefType.DateT) // regex-level, like the ref
    assert(infer("[1,2]") == RefType.ArrayT)
    assert(infer("{\"a\":1}") == RefType.JsonT)
    assert(infer("null") == RefType.StringT)
  }

  test("inference: PK flag only for id/uuid/key; required = non-null") {
    val cols = Inference.inferColumns(mapper.readTree(
      """{"id": 1, "uuid": "x", "key": "k", "order_id": 2, "note": null}"""))
    assert(cols.filter(_.primaryKey).map(_.name) == Seq("id", "uuid", "key"))
    assert(!cols.find(_.name == "note").get.required)
    assert(cols.find(_.name == "order_id").exists(c => !c.primaryKey))
  }

  test("composite PK schema (test_endpoints.py:198-205)") {
    val s = SchemaDefinition(Seq(
      ColumnDefinition("tenant_id", RefType.StringT, primaryKey = true),
      ColumnDefinition("user_id", RefType.StringT, primaryKey = true),
      ColumnDefinition("name", RefType.StringT)))
    assert(s.primaryKeys == Seq("tenant_id", "user_id"))
  }

  test("validation: coercion, required, extra passthrough") {
    val schema = EndpointSchema("orders", "sales", 1, SchemaMode.Manual,
      SchemaDefinition(Seq(
        ColumnDefinition("order_id", RefType.IntegerT, required = true),
        ColumnDefinition("amount", RefType.DecimalT, required = true),
        ColumnDefinition("ok", RefType.BooleanT))))
    val good = Validation.validate(schema,
      mapper.readTree("""{"order_id": "7", "amount": "1.5", "ok": "true"}"""))
    assert(good.isValid)
    assert(good.record.get("order_id").asLong() == 7L)
    assert(good.record.get("amount").asDouble() == 1.5)
    assert(good.record.get("ok").asBoolean())

    val bad = Validation.validate(schema, mapper.readTree("""{"order_id": "x"}"""))
    assert(!bad.isValid)
    assert(bad.errors.map(_.field).toSet == Set("order_id", "amount"))
  }

  test("single_column mode skips validation (models.py:199-201)") {
    val schema = EndpointSchema("raw", "x", 1, SchemaMode.SingleColumn,
      SchemaDefinition(Nil))
    assert(Validation.validate(schema, mapper.readTree("""{"anything": 1}""")).isValid)
  }

  test("registry: create/update versions, latest refresh, YAML round-trip") {
    val root = Files.createTempDirectory("graft-reg-").toString
    val reg = new core.SchemaRegistry(root)
    val v1 = reg.create(EndpointSchema("orders", "sales", 1, SchemaMode.Manual,
      SchemaDefinition(Seq(
        ColumnDefinition("order_id", RefType.IntegerT, required = true,
          primaryKey = true, description = Some("pk"))))))
    assert(v1.version == 1)
    val v2 = reg.update(v1.copy(schema = SchemaDefinition(
      v1.schema.columns :+ ColumnDefinition("status", RefType.StringT))))
    assert(v2.version == 2)
    assert(reg.listVersions("sales", "orders") == Seq(1, 2))
    assert(reg.get("sales", "orders").get.schema.columns.map(_.name) ==
      Seq("order_id", "status"))
    assert(reg.get("sales", "orders", Some(1)).get.schema.columns.map(_.name) ==
      Seq("order_id"))
    assert(reg.get("sales", "orders").get.schema.columns.head.description
      .contains("pk"))
    assert(reg.get("sales", "nope").isEmpty)
    intercept[IllegalArgumentException] { reg.create(v1) }
  }

  test("registry: version diff reports added/removed/changed columns") {
    val root = Files.createTempDirectory("graft-regdiff-").toString
    val reg = new core.SchemaRegistry(root)
    val v1 = reg.create(EndpointSchema("orders", "sales", 1, SchemaMode.Manual,
      SchemaDefinition(Seq(
        ColumnDefinition("order_id", RefType.IntegerT, required = true,
          primaryKey = true),
        ColumnDefinition("status", RefType.StringT),
        ColumnDefinition("legacy", RefType.StringT)))))
    reg.update(v1.copy(schema = SchemaDefinition(Seq(
      ColumnDefinition("order_id", RefType.IntegerT, required = true,
        primaryKey = true),
      ColumnDefinition("status", RefType.StringT, required = true), // changed
      ColumnDefinition("amount", RefType.DoubleT))))) // added; legacy removed
    val d = reg.diffVersions("sales", "orders", 1, 2)
    assert(d == Seq(
      ("added", "amount", "double"),
      ("removed", "legacy", "string"),
      ("changed", "status", "string -> string required")), d.toString)
    assert(reg.diffVersions("sales", "orders", 1, 1).isEmpty)
    intercept[IllegalArgumentException] {
      reg.diffVersions("sales", "orders", 1, 9)
    }
  }

  test("ingest retry: 5 attempts with capped exponential backoff (S9)") {
    val lake = new Lake(null, Files.createTempDirectory("graft-retry-").toString)
    val delays = scala.collection.mutable.Buffer.empty[Long]
    lake.ingest.sleepFn = d => delays += d
    var calls = 0
    val out = lake.ingest.retry(5) {
      calls += 1
      if (calls < 4) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 4)
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L))
    // exhausted attempts rethrow; backoff caps at 16 s
    calls = 0
    delays.clear()
    intercept[RuntimeException] {
      lake.ingest.retry(6) { calls += 1; throw new RuntimeException("down") }
    }
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L, 8000L, 16000L))
  }

  test("registry: gold job CRUD + silver markers") {
    val root = Files.createTempDirectory("graft-reg-").toString
    val reg = new core.SchemaRegistry(root)
    val job = gold.GoldJob("sales", "daily_revenue",
      "SELECT 1 AS x", writeMode = "upsert", uniqueKey = Seq("x"),
      scheduleType = "cron", cronSchedule = Some("day"))
    reg.saveGoldJob(job)
    assert(reg.getGoldJob("sales", "daily_revenue").contains(job))
    assert(reg.listGoldJobs("sales").map(_.jobName) == Seq("daily_revenue"))
    assert(reg.deleteGoldJob("sales", "daily_revenue"))
    assert(reg.listGoldJobs("sales").isEmpty)

    assert(reg.registerSilver("sales", "orders", "/tmp/x"))
    assert(!reg.registerSilver("sales", "orders", "/tmp/x")) // idempotent
    assert(reg.listSilver("sales") == Seq("orders"))
  }
}
