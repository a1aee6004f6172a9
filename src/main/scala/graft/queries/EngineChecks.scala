package graft.queries

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Lake
import graft.core._
import graft.extract.RestExtract
import graft.gold.{GoldJob, TagScheduler}
import graft.query.{NameRewriter, QueryGuard}
import graft.sources.Tables
import Q.dec

/** Engine-layer operators (SURVEY §2.11, §2.12, §2.2 P4/P5) exposed as
  * oracle-checked queries. The pure metadata functions (inference, naming,
  * tag scheduling, PK detection, rewriting, guarding, validation) are
  * verified against literal VALUES oracles; the end-to-end pipeline query
  * (q41) runs a real ingest → bronze → silver upsert and is verified
  * against relational SQL over the same source table.
  */
object EngineChecks {
  private val mapper = new ObjectMapper()

  private def valuesOracle(cols: Seq[String], rows: Seq[Seq[Any]]): String = {
    val body = rows.map(_.map {
      case s: String => "'" + s.replace("'", "''") + "'"
      case b: Boolean => b.toString.toUpperCase
      case d: Double => s"CAST($d AS DOUBLE)"
      // bare integer literals are INT32 in DuckDB; Spark-side rows carry
      // Long → the driver's value-hash sees int32 vs int64. Cast to BIGINT.
      case n: Long => s"CAST($n AS BIGINT)"
      case other => other.toString
    }.mkString("(", ", ", ")")).mkString(", ")
    s"SELECT * FROM (VALUES $body) AS t(${cols.mkString(", ")}) ORDER BY ${cols.head}"
  }

  // ---- C4: schema inference fixture (FIXTURES.md §2 + edge cases) -------
  private val inferencePayload =
    """{
      |  "orderId": "abc123",
      |  "totalAmount": 99.90,
      |  "quantity": 5,
      |  "isPaid": true,
      |  "createdAt": "2024-01-15T10:30:00Z",
      |  "shipDate": "2024-01-15",
      |  "items": [{"sku": "A1", "qty": 2}],
      |  "metadata": {"source": "web"},
      |  "id": 7,
      |  "deletedAt": null,
      |  "userID": "u1",
      |  "HTTPResponse": 200
      |}""".stripMargin

  private def inferenceRows: Seq[Seq[Any]] =
    Inference.inferColumns(mapper.readTree(inferencePayload))
      .sortBy(_.name)
      .map(c => Seq[Any](c.name, RefType.name(c.refType), c.required, c.primaryKey))

  // expected per endpoints/main.py:38-103 semantics
  private val inferenceExpected: Seq[Seq[Any]] = Seq(
    Seq("created_at", "timestamp", true, false),
    Seq("deleted_at", "string", false, false),
    Seq("http_response", "integer", true, false),
    Seq("id", "integer", true, true),
    Seq("is_paid", "boolean", true, false),
    Seq("items", "array", true, false),
    Seq("metadata", "json", true, false),
    Seq("order_id", "string", true, false),
    Seq("quantity", "integer", true, false),
    Seq("ship_date", "date", true, false),
    Seq("total_amount", "float", true, false),
    Seq("user_id", "string", true, false))

  // ---- naming conversion fixture (test_endpoints.py:310-338) ------------
  private val snakeCases = Seq(
    "userID" -> "user_id", "HTTPResponse" -> "http_response",
    "camelCase" -> "camel_case", "PascalCase" -> "pascal_case",
    "already_snake" -> "already_snake", "XMLHttpRequest" -> "xml_http_request",
    "orderId" -> "order_id", "a" -> "a", "itemCount2" -> "item_count2")

  // ---- O1: effective-tag fixpoint fixture -------------------------------
  private val tagJobs = Seq(
    GoldJob("d", "a", "q", scheduleType = "cron", cronSchedule = Some("hour")),
    GoldJob("d", "b", "q", scheduleType = "cron", cronSchedule = Some("day")),
    GoldJob("d", "c", "q", scheduleType = "dependency", cronSchedule = None,
      dependencies = Seq("a")),
    GoldJob("d", "d", "q", scheduleType = "dependency", cronSchedule = None,
      dependencies = Seq("b")),
    GoldJob("d", "e", "q", scheduleType = "cron", cronSchedule = Some("month")),
    GoldJob("d", "f", "q", scheduleType = "dependency", cronSchedule = None,
      dependencies = Seq("e", "c")))

  private val tagsExpected = Seq(
    Seq[Any]("a", "hourly"), Seq[Any]("b", "daily"), Seq[Any]("c", "hourly"),
    Seq[Any]("d", "daily"), Seq[Any]("e", "monthly"), Seq[Any]("f", "hourly"))

  // ---- O7: PK-detection fixture (runner.py:292-337) --------------------
  private val pkCases: Seq[(String, Seq[String], String)] = Seq(
    ("users", Seq("id", "name", "email"), "id"),
    ("users", Seq("user_id", "name"), "user_id"),
    ("posts", Seq("author_id", "title"), "author_id"),
    ("posts", Seq("author_id", "site_id", "name"), "name"),
    ("planets", Seq("climate", "url"), "url"),
    ("categories", Seq("category_id", "label"), "category_id"),
    ("things", Seq("a", "b"), "<none>"))

  // ---- O3: name-rewrite fixture (query_api/main.py:162-183) ------------
  private val rewriteCases = Seq(
    "SELECT * FROM sales.silver.orders" ->
      "SELECT * FROM sales_silver.orders",
    "SELECT * FROM sales.gold.daily_revenue" ->
      "SELECT * FROM sales_gold.daily_revenue",
    "SELECT * FROM web.bronze.events" ->
      "SELECT * FROM web_bronze_events",
    "SELECT a.x FROM sales.silver.orders a JOIN ops.silver.items b ON a.id=b.id" ->
      "SELECT a.x FROM sales_silver.orders a JOIN ops_silver.items b ON a.id=b.id",
    "SELECT 'sales.silver.orders' AS lit" ->
      "SELECT 'sales.silver.orders' AS lit")

  // ---- P5: query-guard fixture (query_api/main.py:23-77) ---------------
  private val guardCases: Seq[(String, String, Boolean)] = Seq(
    ("g01", "SELECT 1", true),
    ("g02", "WITH x AS (SELECT 1 AS a) SELECT * FROM x", true),
    ("g03", "INSERT INTO t VALUES (1)", false),
    ("g04", "DROP TABLE t", false),
    ("g05", "SELECT * FROM t; DELETE FROM t", false),
    ("g06", "UPDATE t SET a = 1", false),
    ("g07", "SELECT read_parquet('/x')", false),
    ("g08", "SELECT * FROM read_json('/etc/passwd')", false),
    ("g09", "", false),
    ("g10", "ATTACH '/db' AS x", false),
    ("g11", "SELECT reads FROM t", true),    // substring, not keyword
    ("g12", "SELECT updated_at FROM t", true))

  // ---- P4: payload-validation fixture (models.py:187-250) --------------
  private lazy val ordersSchema = EndpointSchema("orders", "sales", 1,
    SchemaMode.Manual, SchemaDefinition(Seq(
      ColumnDefinition("order_id", RefType.IntegerT, required = true, primaryKey = true),
      ColumnDefinition("customer_id", RefType.IntegerT, required = true),
      ColumnDefinition("total_amount", RefType.DecimalT, required = true),
      ColumnDefinition("status", RefType.StringT),
      ColumnDefinition("created_at", RefType.TimestampT))))

  private val validationCases: Seq[(String, String)] = Seq(
    "v01_ok" -> """{"order_id": 1, "customer_id": 2, "total_amount": 9.5}""",
    "v02_coerce" -> """{"order_id": "3", "customer_id": "4", "total_amount": "7.25"}""",
    "v03_missing_req" -> """{"order_id": 5}""",
    "v04_bad_int" -> """{"order_id": "abc", "customer_id": 2, "total_amount": 1}""",
    "v05_extra_field" -> """{"order_id": 6, "customer_id": 7, "total_amount": 1, "color": "red"}""",
    "v06_bad_ts" -> """{"order_id": 8, "customer_id": 9, "total_amount": 1, "created_at": 12}""")

  private def validationRows: Seq[Seq[Any]] =
    validationCases.map { case (id, json) =>
      val r = Validation.validate(ordersSchema, mapper.readTree(json))
      Seq[Any](id, r.isValid, r.errors.length.toLong)
    }

  private val validationExpected: Seq[Seq[Any]] = Seq(
    Seq("v01_ok", true, 0L),
    Seq("v02_coerce", true, 0L),
    Seq("v03_missing_req", false, 2L),
    Seq("v04_bad_int", false, 1L),
    Seq("v05_extra_field", true, 0L),
    // pydantic v2 does NOT coerce numbers to strings: a numeric
    // created_at fails the str-typed timestamp field
    Seq("v06_bad_ts", false, 1L))

  private def df(spark: SparkSession, cols: Seq[String], rows: Seq[Seq[Any]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fields = cols.zip(rows.head).map {
      case (c, _: String)  => StructField(c, StringType)
      case (c, _: Boolean) => StructField(c, BooleanType)
      case (c, _: Long)    => StructField(c, LongType)
      case (c, _: Int)     => StructField(c, IntegerType)
      case (c, _: Double)  => StructField(c, DoubleType)
      case (c, _)          => StructField(c, StringType)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)), 1),
      StructType(fields)).orderBy(col(cols.head))
  }

  val defs: Map[String, QueryDef] = Map(

    "q34_schema_inference" -> QueryDef(
      build = (spark, _) => df(spark,
        Seq("col_name", "col_type", "required", "primary_key"), inferenceRows),
      oracle = Some(valuesOracle(
        Seq("col_name", "col_type", "required", "primary_key"), inferenceExpected))),

    "q35_snake_case" -> QueryDef(
      build = (spark, _) => df(spark, Seq("input", "snake"),
        snakeCases.map { case (in, _) => Seq[Any](in, Naming.toSnakeCase(in)) }),
      oracle = Some(valuesOracle(Seq("input", "snake"),
        snakeCases.map { case (in, out) => Seq[Any](in, out) }))),

    "q36_effective_tags" -> QueryDef(
      build = (spark, _) => {
        val tags = TagScheduler.effectiveTags(tagJobs)
        df(spark, Seq("job_name", "tag"),
          tags.toSeq.sortBy(_._1).map { case (j, t) => Seq[Any](j, t) })
      },
      oracle = Some(valuesOracle(Seq("job_name", "tag"), tagsExpected))),

    "q37_pk_detection" -> QueryDef(
      build = (spark, _) => df(spark, Seq("resource", "pk"),
        pkCases.map { case (res, fields, _) =>
          Seq[Any](res + ":" + fields.mkString("+"),
            RestExtract.detectPrimaryKey(res, fields).getOrElse("<none>"))
        }),
      oracle = Some(valuesOracle(Seq("resource", "pk"),
        pkCases.map { case (res, fields, exp) =>
          Seq[Any](res + ":" + fields.mkString("+"), exp) }))),

    "q38_name_rewrite" -> QueryDef(
      build = (spark, _) => df(spark, Seq("input", "rewritten"),
        rewriteCases.map { case (in, _) =>
          Seq[Any](in, NameRewriter.rewritePure(in)) }),
      oracle = Some(valuesOracle(Seq("input", "rewritten"),
        rewriteCases.map { case (in, out) => Seq[Any](in, out) }))),

    "q39_query_guard" -> QueryDef(
      build = (spark, _) => df(spark, Seq("case_id", "allowed"),
        guardCases.map { case (id, sql, _) =>
          Seq[Any](id, QueryGuard.validateText(sql).ok) }),
      oracle = Some(valuesOracle(Seq("case_id", "allowed"),
        guardCases.map { case (id, _, exp) => Seq[Any](id, exp) }))),

    "q40_payload_validation" -> QueryDef(
      build = (spark, _) => df(spark, Seq("case_id", "valid", "n_errors"),
        validationRows),
      oracle = Some(valuesOracle(Seq("case_id", "valid", "n_errors"),
        validationExpected))),

    // ---- O8: chart-type heuristics (chat_api/tools.py:85-119) -----------
    "q42_chart_heuristics" -> QueryDef(
      build = (spark, _) => {
        val cases: Seq[(String, Seq[(String, String)], String)] = Seq(
          ("c1_bar", Seq("status" -> "string", "n" -> "bigint"),
            "orders by status"),
          ("c2_line", Seq("order_day" -> "date", "revenue" -> "double"),
            "daily revenue"),
          ("c3_pie", Seq("segment" -> "string", "pct" -> "double"),
            "market share by segment"),
          ("c4_3y", Seq("name" -> "string", "a" -> "double", "b" -> "bigint",
            "c" -> "int", "d" -> "double"), "compare metrics"),
          ("c5_numeric_x", Seq("n1" -> "bigint", "n2" -> "double"),
            "correlation"))
        df(spark, Seq("case_id", "chart_type", "x_col", "y_cols"),
          cases.map { case (id, cols, q) =>
            val s = graft.query.ChartHeuristics.suggest(cols, q)
            Seq[Any](id, s.chartType, s.x, s.ys.mkString("+"))
          })
      },
      oracle = Some(valuesOracle(Seq("case_id", "chart_type", "x_col", "y_cols"),
        Seq(
          Seq("c1_bar", "bar", "status", "n"),
          Seq("c2_line", "line", "order_day", "revenue"),
          Seq("c3_pie", "pie", "segment", "pct"),
          Seq("c4_3y", "bar", "name", "a+b+c"),
          Seq("c5_numeric_x", "bar", "n1", "n1+n2"))))),

    // ---- S8: data-path auto-detection (runner.py:221-289) ---------------
    "q43_data_path" -> QueryDef(
      build = (spark, _) => {
        val cases = Seq(
          "d1_bare_array" -> """[{"a": 1}, {"a": 2}]""",
          "d2_preferred" -> """{"results": [{"a": 1}], "junk": [{"b": 1}, {"b": 2}]}""",
          "d3_largest" -> """{"small": [{"a": 1}], "big": [{"b": 1}, {"b": 2}]}""",
          "d4_nested" -> """{"payload": {"items": [{"a": 1}, {"a": 2}, {"a": 3}]}}""",
          "d5_single_record" -> """{"n": 5}""")
        df(spark, Seq("case_id", "path", "n_records"),
          cases.map { case (id, json) =>
            RestExtract.detectDataPath(mapper.readTree(json)) match {
              case Some((p, recs)) =>
                Seq[Any](id, if (p.isEmpty) "<root>" else p, recs.size.toLong)
              case None => Seq[Any](id, "<none>", 0L)
            }
          })
      },
      oracle = Some(valuesOracle(Seq("case_id", "path", "n_records"), Seq(
        Seq("d1_bare_array", "<root>", 2L),
        Seq("d2_preferred", "results", 1L),
        Seq("d3_largest", "big", 2L),
        Seq("d4_nested", "payload.items", 3L),
        Seq("d5_single_record", "<root>", 1L))))),

    // ---- J5: Ratcliff/Obershelp fuzzy name matching (runner.py:560-611) -
    "q44_fuzzy_match" -> QueryDef(
      build = (spark, _) => {
        val cases = Seq(
          ("users", "user"), ("categories", "category"), ("boxes", "box"),
          ("users", "planets"), ("order", "orders"))
        df(spark, Seq("pair", "similarity", "matched"),
          cases.map { case (a, b) =>
            val sim = RestExtract.similarity(
              RestExtract.singularize(a), RestExtract.singularize(b))
            Seq[Any](s"$a~$b",
              math.rint(sim * 10000) / 10000, RestExtract.namesMatch(a, b))
          })
      },
      // hand-computed Ratcliff/Obershelp ratios after plural normalization:
      // user~user = 1; category~category = 1; boxe~box = 2·3/7 ≈ 0.8571;
      // user~planet shares only 'e' = 2·1/10 = 0.2; order~order = 1
      oracle = Some(valuesOracle(Seq("pair", "similarity", "matched"), Seq(
        Seq("users~user", 1.0, true),
        Seq("categories~category", 1.0, true),
        Seq("boxes~box", 0.8571, true),
        Seq("users~planets", 0.2, false),
        Seq("order~orders", 1.0, true))))),

    // ---- end-to-end: ingest → bronze JSONL → silver upsert → query ------
    // Batch 1 = all events; batch 2 = purchases with doubled value.
    // Within-batch dedup keeps earliest _insert_date per PK (W1); across
    // batches the upsert makes batch 2 win (J3) — so purchases end doubled.
    "q41_pipeline_end2end" -> QueryDef(
      build = (spark, dir) => {
        val root = Files.createTempDirectory("graft-lake-").toString
        val lake = new Lake(spark, root)
        lake.registry.create(EndpointSchema("events", "web", 1,
          SchemaMode.Manual, SchemaDefinition(Seq(
            ColumnDefinition("event_id", RefType.BigintT, required = true, primaryKey = true),
            ColumnDefinition("user_id", RefType.BigintT, required = true),
            ColumnDefinition("event_type", RefType.StringT, required = true),
            ColumnDefinition("value", RefType.DoubleT)))))
        val ev = Tables.load(spark, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        val batch1 = ev.select(to_json(struct(col("*"))).as("j"))
          .collect().map(_.getString(0)).toSeq
        val batch2 = ev.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .select(to_json(struct(col("*"))).as("j"))
          .collect().map(_.getString(0)).toSeq
        lake.ingest.ingest("web", "events", batch1); lake.ingest.flushAll()
        lake.silver.processEndpoint("web", "events")
        lake.ingest.ingest("web", "events", batch2); lake.ingest.flushAll()
        lake.silver.processEndpoint("web", "events")
        lake.query.dataFrame("""
          SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
          FROM web.silver.events GROUP BY event_type ORDER BY event_type""")
      },
      oracle = Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value * 2
                                  ELSE value END AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
