package graft.query

import java.nio.file.{Files, Paths}
import scala.util.matching.Regex

import graft.Lake

/** Three-part name resolution `domain.layer.table` → physical relations —
  * the engine equivalent of the reference's regex rewrite
  * (lambdas/query_api/main.py:162-183; dbt variant entrypoint.py:72-83).
  *
  *  - `d.silver.t` / `d.gold.t`  →  session-catalog table `d_silver.t` /
  *    `d_gold.t` (registered by SilverProcessor / GoldRunner);
  *  - `d.bronze.t` → an on-the-fly temp view over the bronze JSONL
  *    directory, read with Spark's schema-merging JSON reader — the
  *    `read_json_auto(..., union_by_name=true)` equivalent (S1).
  *
  * Kept as a pre-parse string rewrite for fidelity with the reference's
  * observable behavior; the regex requires word boundaries so quoted
  * strings with dots in user data are untouched in practice (same
  * limitation as the reference).
  */
object NameRewriter {
  private val threePart: Regex =
    """(?<![a-zA-Z0-9_.'"])([a-z][a-z0-9_]*)\.(bronze|silver|gold)\.([a-z][a-z0-9_]*)""".r

  def rewrite(lake: Lake, sql: String): String =
    threePart.replaceAllIn(sql, m => {
      val (domain, layer, table) = (m.group(1), m.group(2), m.group(3))
      layer match {
        case "bronze" =>
          val view = s"${domain}_bronze_$table"
          val dir = lake.bronzePath(domain, table)
          if (Files.exists(Paths.get(dir))) {
            lake.spark.read
              .option("recursiveFileLookup", "true")
              .json(s"$dir/*.jsonl")
              .createOrReplaceTempView(view)
          }
          view
        case _ => s"${domain}_${layer}.$table"
      }
    })

  /** Pure rewrite (no side effects) for tests/oracles: bronze names map to
    * their view name, silver/gold to catalog names. */
  def rewritePure(sql: String): String =
    threePart.replaceAllIn(sql, m => m.group(2) match {
      case "bronze" => s"${m.group(1)}_bronze_${m.group(3)}"
      case layer    => s"${m.group(1)}_${layer}.${m.group(3)}"
    })
}
