package graft.core

import org.apache.spark.sql.types._

/** Core schema model — the engine's unit of table identity.
  *
  * Re-expresses the reference's `EndpointSchema`/`SchemaDefinition`/
  * `ColumnDefinition` (layers/shared/python/shared/models.py:39-121) as
  * Scala case classes with a direct `StructType` mapping. Primary keys and
  * defaults — which Spark has no native notion of — ride in field metadata.
  */

/** Declared column types (models.py:16-29). */
object RefType extends Enumeration {
  val StringT, VarcharT, IntegerT, BigintT, FloatT, DoubleT, BooleanT,
      TimestampT, DateT, JsonT, ArrayT, DecimalT = Value

  private val names: Map[String, Value] = Map(
    "string" -> StringT, "varchar" -> VarcharT, "integer" -> IntegerT,
    "bigint" -> BigintT, "float" -> FloatT, "double" -> DoubleT,
    "boolean" -> BooleanT, "timestamp" -> TimestampT, "date" -> DateT,
    "json" -> JsonT, "array" -> ArrayT, "decimal" -> DecimalT)

  def parse(s: String): Option[Value] = names.get(s.toLowerCase)
  def name(v: Value): String = names.collectFirst { case (n, `v`) => n }.get

  /** Bronze keeps timestamps/dates as ISO strings and json/array opaque
    * (models.py:207-221); this is the SILVER (real) Spark type. */
  def sparkType(v: Value): DataType = v match {
    case StringT | VarcharT => StringType
    case IntegerT           => IntegerType
    case BigintT            => LongType
    case FloatT             => FloatType
    case DoubleT            => DoubleType
    case BooleanT           => BooleanType
    case TimestampT         => TimestampType
    case DateT              => DateType
    case JsonT              => StringType // opaque JSON text; from_json at query time
    case ArrayT             => ArrayType(StringType)
    case DecimalT           => DecimalType(38, 9)
  }
}

final case class ColumnDefinition(
    name: String,
    refType: RefType.Value,
    required: Boolean = false,
    primaryKey: Boolean = false,
    description: Option[String] = None,
    default: Option[String] = None) {

  def toStructField: StructField = {
    val mb = new MetadataBuilder()
      .putBoolean("primary_key", primaryKey)
      .putString("ref_type", RefType.name(refType))
    description.foreach(mb.putString("description", _))
    default.foreach(mb.putString("default", _))
    StructField(name, RefType.sparkType(refType), nullable = !required, mb.build())
  }
}

final case class SchemaDefinition(columns: Seq[ColumnDefinition]) {
  def primaryKeys: Seq[String] = columns.filter(_.primaryKey).map(_.name)
  def requiredColumns: Seq[String] = columns.filter(_.required).map(_.name)
  def toStructType: StructType = StructType(columns.map(_.toStructField))
}

/** Schema modes (models.py:32-37). */
object SchemaMode extends Enumeration {
  val Manual, AutoInference, SingleColumn = Value
  def parse(s: String): Value = s match {
    case "manual"         => Manual
    case "auto_inference" => AutoInference
    case "single_column"  => SingleColumn
  }
  def name(v: Value): String = v match {
    case Manual        => "manual"
    case AutoInference => "auto_inference"
    case SingleColumn  => "single_column"
  }
}

final case class EndpointSchema(
    name: String,
    domain: String,
    version: Int,
    mode: SchemaMode.Value,
    schema: SchemaDefinition) {

  require(Naming.isSnakeCase(name), s"endpoint name must be snake_case: $name")
  require(Naming.isSnakeCase(domain), s"domain must be snake_case: $domain")
}

/** snake_case enforcement (models.py:44-56) and camelCase conversion
  * (lambdas/endpoints/main.py:32-35, tests test_endpoints.py:310-338). */
object Naming {
  private val snake = "^[a-z][a-z0-9_]*$".r

  def isSnakeCase(s: String): Boolean = snake.matches(s)

  /** camelCase / PascalCase / acronyms → snake_case:
    * userID → user_id, HTTPResponse → http_response. */
  def toSnakeCase(s: String): String = {
    // split an acronym run from a following capitalized word: HTTPResponse -> HTTP_Response
    val s1 = s.replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
    // split lower/digit -> upper boundaries: userId -> user_Id
    val s2 = s1.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
    s2.toLowerCase.replaceAll("[^a-z0-9_]", "_").replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
  }
}
