package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Command

/** SELECT-only SQL validation — port of the reference's regex guards
  * (lambdas/query_api/main.py:23-77) PLUS the idiomatic Spark upgrade the
  * survey recommends (§2.2 P5): parse the statement and reject any plan
  * that is a Command (DDL/DML) rather than a pure query.
  */
object QueryGuard {
  val MaxQueryLength = 10000 // query_api/main.py:19

  // DDL/DML keyword blocklist — the reference's _BLOCKED_STATEMENTS list
  // verbatim (query_api/main.py:23-32), plus Spark-specific command
  // keywords the DuckDB-era list could not know about
  private val forbiddenKeywords = (Seq(
    "insert", "update", "delete", "drop", "alter", "create", "replace",
    "truncate", "merge", "grant", "revoke", "commit", "rollback",
    "savepoint", "attach", "detach", "install", "load", "export", "import",
    "copy", "call", "set", "reset", "pragma", "checkpoint", "vacuum") ++
    Seq("refresh", "cache", "uncache", "analyze", "msck"))
    .map(k => s"""(?is)(^|[^a-z0-9_])$k([^a-z0-9_]|$$)""".r)

  // file/network-access function blocklist — the reference's
  // _BLOCKED_FUNCTIONS (query_api/main.py:35-43) plus Spark equivalents
  private val forbiddenFunctions = (Seq(
    "read_csv_auto", "read_csv", "read_parquet", "read_json",
    "read_json_auto", "read_blob", "read_text", "write_csv",
    "write_parquet", "http_get", "http_post", "glob", "ls", "copy") ++
    Seq("read_ndjson", "parquet_scan", "delta_scan", "iceberg_scan",
      "input_file_name", "reflect", "java_method"))
    .map(k => s"""(?is)(^|[^a-z0-9_])$k\\s*\\(""".r)

  final case class Verdict(ok: Boolean, reason: String)

  /** String-level validation (no parse) — faithful to the reference,
    * including the trailing-semicolon strip before the prefix check. */
  def validateText(sql: String): Verdict = {
    val q = sql.trim.replaceAll(";+\\s*$", "").trim
    if (q.isEmpty) Verdict(ok = false, "empty query")
    else if (q.length > MaxQueryLength)
      Verdict(ok = false, s"query exceeds $MaxQueryLength characters")
    else if (!q.toLowerCase.startsWith("select") && !q.toLowerCase.startsWith("with"))
      Verdict(ok = false, "only SELECT queries are allowed")
    else forbiddenKeywords.find(_.findFirstIn(q).isDefined) match {
      case Some(_) => Verdict(ok = false, "forbidden keyword in query")
      case None => forbiddenFunctions.find(_.findFirstIn(q).isDefined) match {
        case Some(_) => Verdict(ok = false, "forbidden function in query")
        case None    => Verdict(ok = true, "ok")
      }
    }
  }

  /** Plan-level validation: the parsed statement must not be a Command.
    * Catches anything the regexes miss (idiomatic Spark guard). */
  def validatePlan(spark: SparkSession, sql: String): Verdict =
    try {
      spark.sessionState.sqlParser.parsePlan(sql) match {
        case _: Command => Verdict(ok = false, "statement is not a query")
        case _          => Verdict(ok = true, "ok")
      }
    } catch {
      case e: Exception =>
        Verdict(ok = false, s"parse error: ${Option(e.getMessage).getOrElse("")}")
    }

  def validate(spark: SparkSession, sql: String): Verdict = {
    val text = validateText(sql)
    if (!text.ok) text else validatePlan(spark, sql)
  }
}
