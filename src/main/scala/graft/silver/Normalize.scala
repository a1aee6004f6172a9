package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.core.Naming

/** Nested-payload normalization for ingestion: the dlt-style "child
  * table" split the reference inherits from its ingestion library —
  * an array-of-structs column becomes its own table keyed back to the
  * parent, so silver tables stay flat and columnar.
  *
  * Key discipline: the child key is (parent primary key, element index)
  * — fully deterministic, stable across partitionings and re-runs,
  * unlike `monotonically_increasing_id` (partition-dependent) or random
  * surrogates (run-dependent). Struct fields are flattened to
  * snake_case column names via the same [[graft.core.Naming]] rules the
  * registry enforces.
  *
  * Scale: both outputs are stateless per-row projections of the parent
  * scan — no shuffle, no driver participation; the child explode is the
  * only row multiplier and Catalyst pushes parent-column pruning through
  * it. */
object Normalize {

  /** Split one array column out of `df` into (parent-without-array,
    * child rows). The child carries `_parent_<pk>` + `_idx` (0-based
    * element position) + the element's fields (snake_cased; scalar
    * elements become a single `value` column). */
  def childTable(df: DataFrame, arrayCol: String,
      parentKey: String): (DataFrame, DataFrame) = {
    val field = df.schema(arrayCol)
    require(field.dataType.isInstanceOf[ArrayType],
      s"$arrayCol is not an array column: ${field.dataType.catalogString}")
    val parent = df.drop(arrayCol)
    val exploded = df
      .select(col(parentKey).as(s"_parent_$parentKey"),
        posexplode(col(arrayCol)).as(Seq("_idx", "_elem")))
    val child = field.dataType.asInstanceOf[ArrayType].elementType match {
      case st: StructType =>
        // getField treats the name literally (API payload keys may
        // contain dots/spaces a parsed column path would misread), and
        // snake_cased names are deduped with a numeric suffix — distinct
        // source keys like itemSku/item_sku must not collide into one
        // ambiguous child column
        val seen = scala.collection.mutable.Map.empty[String, Int]
        val cols = st.fields.toSeq.map { f =>
          val base = Naming.toSnakeCase(f.name)
          val n = seen.getOrElse(base, 0)
          seen(base) = n + 1
          val name = if (n == 0) base else s"${base}_${n + 1}"
          col("_elem").getField(f.name).as(name)
        }
        exploded.select(
          col(s"_parent_$parentKey") +: col("_idx") +: cols: _*)
      case _ =>
        exploded.withColumnRenamed("_elem", "value")
    }
    (parent, child)
  }
}
