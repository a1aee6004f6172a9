package graft.query

import graft.Lake

/** Table/column listing — the engine equivalent of the reference's catalog
  * API (lambdas/query_api/main.py:240-293): silver tables from the
  * registry + live column metadata from the session catalog; gold tables
  * from the job configs.
  */
final class CatalogService(lake: Lake) {

  final case class TableInfo(domain: String, layer: String, table: String,
      columns: Seq[(String, String)])

  def listTables(domain: String): Seq[TableInfo] = {
    val silver = lake.registry.listSilver(domain).map { t =>
      TableInfo(domain, "silver", t, columnsOf(s"${domain}_silver.$t"))
    }
    val gold = lake.registry.listGoldJobs(domain).map { j =>
      TableInfo(domain, "gold", j.jobName,
        columnsOf(s"${domain}_gold.${j.jobName}"))
    }
    silver ++ gold
  }

  /** Sample rows for table preview / LLM context (L4,
    * transformation_agent/.../main.py:152-192). */
  def sampleRows(domain: String, layer: String, table: String,
      n: Int = 5): Seq[Map[String, Any]] = {
    val df = lake.query.dataFrame(s"SELECT * FROM $domain.$layer.$table")
    val cols = df.columns
    df.limit(n).collect().toSeq
      .map(r => cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
  }

  private def columnsOf(qualified: String): Seq[(String, String)] =
    if (lake.spark.catalog.tableExists(qualified))
      lake.spark.table(qualified).schema.fields.toSeq
        .map(f => f.name -> f.dataType.simpleString)
    else Nil
}
