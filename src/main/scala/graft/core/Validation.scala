package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Per-record payload validation with type coercion — the engine equivalent
  * of the reference's dynamic-model validation (models.py:187-250) and the
  * soft/strict ingestion behavior (serverless_ingestion/main.py:204-219).
  *
  * Coercion map (models.py:207-221): string/varchar → text, integer/bigint
  * → int, float/double/decimal → float, boolean → bool, timestamp/date →
  * ISO STRING at bronze (cast happens at silver), json → object, array →
  * list.
  *
  * Soft mode forwards the original payload on error; strict mode rejects
  * with per-field errors. `single_column` mode skips validation entirely
  * (models.py:199-201).
  */
object Validation {

  final case class FieldError(field: String, message: String)
  final case class Result(record: JsonNode, errors: Seq[FieldError]) {
    def isValid: Boolean = errors.isEmpty
  }

  private val f = JsonNodeFactory.instance

  def validate(schema: EndpointSchema, payload: JsonNode): Result = {
    if (schema.mode == SchemaMode.SingleColumn) return Result(payload, Nil)

    val out = f.objectNode()
    val errors = Seq.newBuilder[FieldError]
    schema.schema.columns.foreach { col =>
      val v = payload.get(col.name)
      val missing = v == null || v.isNull
      if (missing) {
        // absent optional fields are EXCLUDED from the validated payload
        // (model_dump(exclude_none=True), models.py:239)
        if (col.required) errors += FieldError(col.name, "required field missing")
      } else coerce(col, v) match {
        case Right(node) => out.set[ObjectNode](col.name, node)
        case Left(msg)   => errors += FieldError(col.name, msg)
      }
    }
    // pass through extra fields not in the schema (bronze keeps raw shape;
    // silver's schema application drops them)
    payload.properties().asScala.foreach { e =>
      if (!schema.schema.columns.exists(_.name == e.getKey) && !out.has(e.getKey))
        out.set[ObjectNode](e.getKey, e.getValue)
    }
    val errs = errors.result()
    Result(if (errs.isEmpty) out else payload, errs)
  }

  // pydantic-v2 lax-mode boolean literals
  private val boolTrue = Set("true", "t", "yes", "y", "on", "1")
  private val boolFalse = Set("false", "f", "no", "n", "off", "0")

  /** Coercion mirrors pydantic v2 LAX mode, which the reference's dynamic
    * model uses (models.py:207-250): numeric strings coerce to numbers,
    * integral floats to ints, lax literals to bool — but numbers do NOT
    * coerce to strings (v2 dropped v1's int→str), so string/timestamp/
    * date fields require textual JSON values. */
  private def coerce(col: ColumnDefinition, v: JsonNode): Either[String, JsonNode] =
    col.refType match {
      case RefType.StringT | RefType.VarcharT =>
        if (v.isTextual) Right(v)
        else Left("input should be a valid string")
      case RefType.IntegerT | RefType.BigintT =>
        if (v.isIntegralNumber) Right(v)
        else if (v.isFloatingPointNumber && v.asDouble() == v.asDouble().floor &&
            !v.asDouble().isInfinite)
          Right(f.numberNode(v.asDouble().toLong)) // 5.0 -> 5 (lax)
        else if (v.isTextual && Try(v.asText().trim.toLong).isSuccess)
          Right(f.numberNode(v.asText().trim.toLong))
        else Left(s"cannot coerce '${v.asText()}' to integer")
      case RefType.FloatT | RefType.DoubleT | RefType.DecimalT =>
        if (v.isNumber) Right(v)
        else if (v.isTextual && Try(v.asText().trim.toDouble).isSuccess)
          Right(f.numberNode(v.asText().trim.toDouble))
        else Left(s"cannot coerce '${v.asText()}' to float")
      case RefType.BooleanT =>
        if (v.isBoolean) Right(v)
        else if (v.isIntegralNumber && (v.asLong() == 0L || v.asLong() == 1L))
          Right(f.booleanNode(v.asLong() == 1L))
        else if (v.isTextual && boolTrue(v.asText().toLowerCase))
          Right(f.booleanNode(true))
        else if (v.isTextual && boolFalse(v.asText().toLowerCase))
          Right(f.booleanNode(false))
        else Left(s"cannot coerce '${v.asText()}' to boolean")
      case RefType.TimestampT | RefType.DateT =>
        // kept as ISO STRING at bronze (models.py:218); v2 str accepts
        // only textual input
        if (v.isTextual) Right(v)
        else Left("timestamp/date must be a string at ingest")
      case RefType.JsonT =>
        if (v.isObject) Right(v) else Left("json field must be an object")
      case RefType.ArrayT =>
        if (v.isArray) Right(v) else Left("array field must be a list")
    }
}
