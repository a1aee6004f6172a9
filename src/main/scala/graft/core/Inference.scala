package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeType
import scala.jdk.CollectionConverters._

/** Schema inference from a sample JSON payload — the engine equivalent of
  * `POST /endpoints/infer` (lambdas/endpoints/main.py:332-374).
  *
  * Rules (endpoints/main.py:38-103):
  *  - value-type dispatch, with regex detection of ISO timestamps and dates
  *    inside strings;
  *  - camelCase → snake_case key normalization;
  *  - `required` = value non-null;
  *  - primary-key guess when the normalized name is `id`/`uuid`/`key`;
  *  - objects → `json`, arrays → `array`; null → string, not required.
  */
object Inference {
  // ISO-8601 detection (endpoints/main.py:60-70)
  private val isoTimestamp =
    """^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$""".r
  private val isoDate = """^\d{4}-\d{2}-\d{2}$""".r

  private val pkNames = Set("id", "uuid", "key")

  def inferValueType(v: JsonNode): RefType.Value =
    if (v == null || v.isNull) RefType.StringT
    else v.getNodeType match {
      case JsonNodeType.BOOLEAN => RefType.BooleanT
      case JsonNodeType.NUMBER =>
        if (v.isIntegralNumber) RefType.IntegerT else RefType.FloatT
      case JsonNodeType.STRING =>
        val s = v.asText()
        if (isoTimestamp.matches(s)) RefType.TimestampT
        else if (isoDate.matches(s)) RefType.DateT
        else RefType.StringT
      case JsonNodeType.ARRAY  => RefType.ArrayT
      case JsonNodeType.OBJECT => RefType.JsonT
      case _                   => RefType.StringT
    }

  /** Infer a full column list from one payload object, preserving field
    * order of the payload. */
  def inferColumns(payload: JsonNode): Seq[ColumnDefinition] =
    payload.properties().asScala.toSeq.map { e =>
      val snake = Naming.toSnakeCase(e.getKey)
      val v = e.getValue
      ColumnDefinition(
        name = snake,
        refType = inferValueType(v),
        required = !(v == null || v.isNull),
        primaryKey = pkNames.contains(snake))
    }

  def inferSchema(name: String, domain: String, payload: JsonNode): EndpointSchema =
    EndpointSchema(name, domain, version = 1, mode = SchemaMode.AutoInference,
      schema = SchemaDefinition(inferColumns(payload)))
}
